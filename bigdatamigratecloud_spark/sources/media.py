"""Media file sink/source (S7/S8): the reference exports MediaSet members
as GUID-named files under a `Media/` folder beside the package plus a
manifest table (ExportMediaSet/ExportMedia, Codeunit 60000:1144-1202,
983-1027; import: 1221-1270).  Spark-first:

- sink: write each row's binary payload to its own file via
  foreachPartition (executor-side, parallel, no driver bottleneck) and
  return the manifest as a DataFrame (guid, path, size) — the Config.
  Media Buffer analogue (table 8630);
- source: `spark.read.format("binaryFile")` over the media folder —
  Spark's built-in distributed (path, modificationTime, length, content)
  scan.

GUIDs are deterministic (sha256 of content, truncated to UUID shape)
rather than random, so re-exports are idempotent — a deliberate
improvement over CREATEGUID while keeping the GUID-named-file contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def content_guid(col: F.Column) -> F.Column:
    """Deterministic GUID-shaped id from content bytes — sha256 of the RAW
    bytes (not a base64 rendering, whose line-chunking differs between
    codecs), so any engine can recompute it: DuckDB's
    ``sha256(encode(text))`` yields the identical hex."""
    h = F.sha2(col, 256)
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def export_media(
    df: DataFrame,
    media_dir: str,
    content_col: str = "content",
    id_col: str | None = None,
    ext: str = "bin",
) -> DataFrame:
    """Write one file per row under media_dir; returns the manifest
    DataFrame (id, guid, path, size).  Files are written executor-side."""
    os.makedirs(media_dir, exist_ok=True)
    keyed = df.withColumn("__guid", content_guid(F.col(content_col)))

    def write_partition(rows):
        for row in rows:
            payload = row[content_col]
            if payload is None:
                continue
            with open(os.path.join(media_dir, f"{row['__guid']}.{ext}"), "wb") as fh:
                fh.write(bytes(payload))

    cols = ["__guid", content_col] + ([id_col] if id_col else [])
    keyed.select(*cols).foreachPartition(write_partition)
    manifest = keyed.select(
        *([F.col(id_col).alias("id")] if id_col else []),
        F.col("__guid").alias("guid"),
        F.concat(F.lit(media_dir + os.sep), F.col("__guid"), F.lit("." + ext)).alias("path"),
        F.length(F.col(content_col)).alias("size"),
    )
    return manifest


def export_media_set(
    df: DataFrame,
    media_dir: str,
    members_col: str = "contents",
    id_col: str = "id",
    ext: str = "bin",
) -> DataFrame:
    """MediaSet sink: N binary members per record (the reference iterates
    the record's whole media SET — ExportMediaSet, Codeunit 60000:1144-1169
    — writing one GUID file per member plus manifest rows).  Spark-first:
    posexplode the member array (keeps member order as member_idx), write
    each member executor-side, return the manifest
    (id, member_idx, guid, path, size).  Content-identical members dedup
    onto one file, matching media-object sharing semantics."""
    os.makedirs(media_dir, exist_ok=True)
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(members_col)).alias("member_idx", "__content"),
    )
    keyed = exploded.withColumn("__guid", content_guid(F.col("__content")))

    def write_partition(rows):
        for row in rows:
            payload = row["__content"]
            if payload is None:
                continue
            with open(os.path.join(media_dir, f"{row['__guid']}.{ext}"), "wb") as fh:
                fh.write(bytes(payload))

    keyed.select("__guid", "__content").foreachPartition(write_partition)
    return keyed.select(
        "id",
        "member_idx",
        F.col("__guid").alias("guid"),
        F.concat(F.lit(media_dir + os.sep), F.col("__guid"), F.lit("." + ext)).alias("path"),
        F.length(F.col("__content")).alias("size"),
    )


def import_media(spark: SparkSession, media_dir: str, pattern: str = "*") -> DataFrame:
    """Media folder -> (path, guid, size, content) via the binaryFile
    source (distributed scan; S8, XML:1221-1239)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(media_dir)
    )
    guid = F.regexp_extract(F.col("path"), r"([0-9a-f\-]+)\.[A-Za-z0-9]+$", 1)
    return df.select(
        "path", guid.alias("guid"), F.col("length").alias("size"), "content"
    )
