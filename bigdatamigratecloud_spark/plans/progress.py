"""X3: progress reporting (SURVEY §2.11).

The reference drives a ConfigProgressBar — init/update/close per table,
with a finer-grained bar when a table exceeds 1,000 records (Codeunit
60000:341-358, 739-743, 790-796).  A Spark driver reports the same
milestones through a callback object: per-table start/finish events with
row counts, plus a pipeline-level summary.  The default sink is the
logging module (cluster-friendly: driver logs aggregate to the history
server); tests and UIs supply their own reporter.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field

log = logging.getLogger("bigdatamigratecloud_spark.progress")

# the reference switches to 1% step granularity above this row count
# (Codeunit 60000:739-741); kept as the threshold for marking a table
# "large" in progress events
FINE_GRAIN_THRESHOLD = 1_000


@dataclass
class TableProgress:
    table_name: str
    rank: int
    started_at: float
    finished_at: float | None = None
    rows_applied: int | None = None
    large: bool | None = None  # >= FINE_GRAIN_THRESHOLD rows


@dataclass
class ProgressReporter:
    """Collects per-table progress and mirrors it to a logger.  Pass an
    instance to run_import(...; reporter=...) to observe the pipeline the
    way the reference's progress bar does."""

    package_code: str = ""
    tables: dict[str, TableProgress] = field(default_factory=dict)

    def on_package_start(self, package_code: str, n_tables: int) -> None:
        self.package_code = package_code
        log.info("package %s: importing %d tables", package_code, n_tables)

    def on_table_start(self, table_name: str, rank: int) -> None:
        self.tables[table_name] = TableProgress(table_name, rank, time.monotonic())
        log.info("package %s: table %s (rank %d) started", self.package_code, table_name, rank)

    def on_table_finish(self, table_name: str, rows_applied: int) -> None:
        tp = self.tables.get(table_name)
        if tp is None:  # finish without start: still record it
            tp = TableProgress(table_name, -1, time.monotonic())
            self.tables[table_name] = tp
        tp.finished_at = time.monotonic()
        tp.rows_applied = rows_applied
        tp.large = rows_applied >= FINE_GRAIN_THRESHOLD
        log.info(
            "package %s: table %s applied %d rows in %.2fs%s",
            self.package_code,
            table_name,
            rows_applied,
            tp.finished_at - tp.started_at,
            " (large)" if tp.large else "",
        )

    def on_package_finish(self) -> None:
        done = [t for t in self.tables.values() if t.finished_at is not None]
        total = sum(t.rows_applied or 0 for t in done)
        log.info(
            "package %s: finished %d/%d tables, %d rows total",
            self.package_code,
            len(done),
            len(self.tables),
            total,
        )
