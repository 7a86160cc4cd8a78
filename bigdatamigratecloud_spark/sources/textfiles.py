"""Corpus text-file formats: JSONL, CSV, ORC (S-family extension).

The reference's exchange formats are XML packages and Excel (Codeunit
60000/60001); a training-data engine additionally speaks the corpus
lingua franca — JSON-Lines above all (one document object per line, the
interchange format of every public LLM corpus), plus CSV for tabular
interop and ORC as the second columnar format Spark ships natively.

Scale design: all three are Spark-native DataFrame sources — distributed
read/write, predicate/projection handling by the format reader, no
driver-side parsing.  Readers take an EXPLICIT schema: schema inference
is a full extra pass over 100 TB and can drift between runs; a corpus
contract should be declared, not guessed.  Malformed JSONL lines are
quarantined into a `_corrupt_record` column (PERMISSIVE mode) — the
analogue of the reference's per-cell error capture (XML:774-785) at the
record level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """One JSON object per line, gzip by default (the standard shipped
    form of public corpora — splittable alternatives like zstd-in-parquet
    are the archival format; JSONL is the interchange)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType, quarantine: bool = True
) -> DataFrame:
    """Schema-enforced JSONL read.  With `quarantine`, malformed lines
    land in `_corrupt_record` instead of failing the job (PERMISSIVE),
    mirroring the reference's record-level error capture."""
    if quarantine:
        schema = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
        )
    r = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    return r.json(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """CSV with full quoting so embedded separators/newlines round-trip."""
    (
        df.write.mode("overwrite")
        .option("header", header)
        .option("quoteAll", True)
        .option("escape", '"')
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: T.StructType, header: bool = True) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)  # quoted newlines inside text fields
        .csv(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)
