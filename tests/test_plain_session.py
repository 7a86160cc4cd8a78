"""Regression for the round-1 driver failure: the correctness driver runs
queries on its OWN plain SparkSession (no builder configs from
session.py).  events.parquet carries TIMESTAMP(NANOS), which a default
session refuses to read unless catalog.load_table sets the legacy flag at
runtime.  This test spawns a subprocess with a completely config-free
session — exactly what the driver does — and runs representative queries
that (a) read events directly, (b) register all views via shared SQL, and
(c) run a plain lineitem aggregate.
"""

from __future__ import annotations

import os
import subprocess
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[4]").getOrCreate()

import __spark_entry__ as entry

qs = entry.queries()
for name in ["events_json_extract", "u1_set_ops", "q1_pricing_summary",
             "s7_s8_media_roundtrip", "stream_dedup_events"]:
    n = qs[name](spark, {sf!r}).count()
    assert n > 0, f"{{name}} returned 0 rows"
    print(f"OK {{name}} {{n}}")
spark.stop()
"""


def test_queries_run_on_config_free_session():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = SCRIPT.format(repo=repo, sf=SF_DIR)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "PYTHONPATH": repo},
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    for name in (
        "events_json_extract",
        "u1_set_ops",
        "q1_pricing_summary",
        "s7_s8_media_roundtrip",
        "stream_dedup_events",
    ):
        assert f"OK {name}" in proc.stdout
