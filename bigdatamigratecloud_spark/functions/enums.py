"""Option (enum) type duality (SURVEY §1.2): NAV Options are stored as
integer indexes; the XML package renders the INDEX (FormatFieldValue
format 2, Codeunit 60000:837-838) while Excel mode renders the display
TEXT (XML:848-849).  Both renderings must be importable.

An EnumMapping is the explicit enum table threaded through both
serializers (SURVEY §7 'option-type duality').  All renders/parses are
Catalyst map lookups — no UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class EnumMapping:
    """Ordered option labels; index = position (NAV option semantics)."""

    name: str
    labels: tuple[str, ...]

    def _label_array(self) -> Column:
        return F.array(*[F.lit(s) for s in self.labels])

    def to_index(self, label_col: Column | str) -> Column:
        """Label text -> 0-based index (NULL for unknown labels)."""
        if isinstance(label_col, str):
            label_col = F.col(label_col)
        # array_position is 1-based, 0 = not found
        pos = F.array_position(self._label_array(), label_col)
        return F.when(pos == 0, F.lit(None).cast("int")).otherwise((pos - 1).cast("int"))

    def to_label(self, index_col: Column | str) -> Column:
        """0-based index -> label text (NULL out of range)."""
        if isinstance(index_col, str):
            index_col = F.col(index_col)
        ok = (index_col >= 0) & (index_col < len(self.labels))
        return F.when(ok, F.element_at(self._label_array(), index_col.cast("int") + 1)).otherwise(
            F.lit(None).cast("string")
        )

    def render(self, col: Column | str, mode: str) -> Column:
        """Serialize an index column for a package: XML mode -> index text
        (XML:837-838); Excel mode -> label text (XML:848-849)."""
        if isinstance(col, str):
            col = F.col(col)
        if mode == "xml":
            return col.cast("string")
        if mode == "excel":
            return self.to_label(col)
        raise ValueError(f"unknown mode {mode!r}")

    def parse(self, col: Column | str, mode: str) -> Column:
        """Inverse of render: XML mode parses the index text; Excel mode
        resolves the label (EvaluateValue option handling)."""
        if isinstance(col, str):
            col = F.col(col)
        if mode == "xml":
            return col.cast("int")
        if mode == "excel":
            return self.to_index(col)
        raise ValueError(f"unknown mode {mode!r}")


# the testdata's natural option columns
ORDER_PRIORITY = EnumMapping(
    "o_orderpriority",
    ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
)
ORDER_STATUS = EnumMapping("o_orderstatus", ("F", "O", "P"))
