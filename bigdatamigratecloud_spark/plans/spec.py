"""Migration package specification — the reference's Config. Package data
model (tables 8623/8613/8616/8626, SURVEY §1.1) as plain Python data.

A spec fully describes a migration job: which tables, in what dependency
order, which columns, which filters, which per-column validation flags.
The engine consumes a spec and produces Spark plans; nothing here touches
Spark, so specs serialize to/from JSON for job submission.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field


@dataclass
class FieldSpec:
    """≈ Config. Package Field, table 8616 (Codeunit 60000:106-117)."""

    field_name: str
    include: bool = True  # Include Field
    primary_key: bool = False
    validate: bool = True  # Validate Field (Codeunit 60000:110-111)
    create_missing_codes: bool = False  # Codeunit 60000:112-113
    processing_order: int = 0
    is_dimension: bool = False


@dataclass
class TableSpec:
    """≈ Config. Package Table, table 8613 (Codeunit 60000:48-104)."""

    table_name: str
    processing_order: int = 0
    parent_table: str | None = None  # Parent Table ID -> dependency edge
    skip_validation: bool = False  # ≈ Skip Table Triggers (XML:83-87)
    delete_before_processing: bool = False  # overwrite mode (XML:93-97)
    dimensions_as_columns: bool = False
    fields: list[FieldSpec] = field(default_factory=list)
    filters: dict[str, str] = field(default_factory=dict)  # field -> NAV filter expr (table 8626)

    def included_fields(self) -> list[str]:
        fs = [f for f in self.fields if f.include and not f.is_dimension]
        fs.sort(key=lambda f: (f.processing_order, f.field_name))
        return [f.field_name for f in fs]

    def pk_fields(self) -> list[str]:
        return [f.field_name for f in self.fields if f.primary_key]


@dataclass
class PackageSpec:
    """≈ Config. Package, table 8623 (Codeunit 60000:419-476)."""

    package_code: str
    package_name: str = ""
    language_id: int = 0
    product_version: str = ""
    processing_order: int = 0
    exclude_config_tables: bool = True
    tables: list[TableSpec] = field(default_factory=list)

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "PackageSpec":
        d = json.loads(s)
        tables = [
            TableSpec(
                **{
                    **t,
                    "fields": [FieldSpec(**f) for f in t.get("fields", [])],
                }
            )
            for t in d.pop("tables", [])
        ]
        return cls(**{**d, "tables": tables})

    def table(self, name: str) -> TableSpec:
        for t in self.tables:
            if t.table_name == name:
                return t
        raise KeyError(name)
