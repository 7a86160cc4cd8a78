"""Corpus text-file source tests: the bzip2 splittability contract that
makes `s15_bz2_jsonl_roundtrip` the scale path for monolithic compressed
text dumps, plus the quarantine contract through the bz2 codec."""

from __future__ import annotations

import glob

from pyspark.sql import types as T

from bigdatamigratecloud_spark.sources.textfiles import read_jsonl, write_jsonl


def _incompressible(spark, n=60000):
    # md5-derived text so bzip2 cannot collapse the file below the
    # split granularity the test relies on
    return spark.range(n).selectExpr(
        "id", "repeat(md5(cast(id AS string)), 6) AS text"
    )


def test_bz2_single_file_splits_gzip_does_not(spark, tmp_path):
    """THE reason bz2 is the corpus codec: one big .bz2 file is read by
    many tasks (Hadoop SplittableCompressionCodec), while one big .gz
    file is pinned to a single task no matter its size."""
    df = _incompressible(spark)
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("text", T.StringType())]
    )
    nparts = {}
    for codec in ("bzip2", "gzip"):
        p = str(tmp_path / codec)
        df.coalesce(1).write.option("compression", codec).json(p)
        datafiles = [
            f
            for f in glob.glob(p + "/*")
            if not f.endswith("_SUCCESS") and ".crc" not in f
        ]
        assert len(datafiles) == 1, datafiles
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        try:
            back = spark.read.schema(schema).json(p)
            nparts[codec] = back.rdd.getNumPartitions()
            assert back.count() == 60000
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert nparts["bzip2"] >= 2, nparts
    assert nparts["gzip"] == 1, nparts


def test_bz2_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    p = str(tmp_path / "rt")
    df = spark.createDataFrame(
        [(1, "alpha"), (2, 'quoted "text" with, commas')],
        "doc_id long, text string",
    )
    write_jsonl(df, p, compression="bzip2")
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    back = read_jsonl(spark, p, schema)
    rows = {r["doc_id"]: r for r in back.collect()}
    assert rows[1]["text"] == "alpha" and rows[2]["text"] == 'quoted "text" with, commas'
    assert all(r["_corrupt_record"] is None for r in rows.values())

    # corrupt line through the bz2 decode path must quarantine, not throw
    import bz2 as _bz2

    bad = str(tmp_path / "bad")
    import os

    os.makedirs(bad)
    with open(bad + "/part-0.json.bz2", "wb") as f:
        f.write(_bz2.compress(b'{"doc_id": 1, "text": "ok"}\nnot json at all\n'))
    got = read_jsonl(spark, bad, schema).collect()
    quarantined = [r for r in got if r["_corrupt_record"] is not None]
    assert len(quarantined) == 1 and quarantined[0]["_corrupt_record"] == "not json at all"
