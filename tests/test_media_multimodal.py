"""Media sink/source (S7/S8) and multimodal kernels (N3): file roundtrip
through binaryFile, deterministic-fake decode plumbing, fan-out shapes."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from bigdatamigratecloud_spark.operators import multimodal
from bigdatamigratecloud_spark.sources.media import export_media, import_media


@pytest.fixture()
def blob_df(spark):
    rows = [(i, bytes([i % 251] * (100 + i * 13)) + f"payload{i}".encode()) for i in range(20)]
    return spark.createDataFrame(rows, "id long, content binary")


def test_media_export_import_roundtrip(spark, blob_df, tmp_path):
    media_dir = str(tmp_path / "Media")
    manifest = export_media(blob_df, media_dir, id_col="id")
    m = manifest.collect()
    assert len(m) == 20
    assert all(os.path.exists(r.path) for r in m)
    assert all(r.size == os.path.getsize(r.path) for r in m)

    back = import_media(spark, media_dir)
    assert back.count() == 20
    # content survives byte-for-byte: join manifest on guid, compare
    src = blob_df.withColumn("guid", F.col("id").cast("string"))
    joined = (
        manifest.alias("m")
        .join(back.alias("b"), F.col("m.guid") == F.col("b.guid"))
        .join(blob_df.alias("s"), F.col("m.id") == F.col("s.id"))
        .select((F.col("b.content") == F.col("s.content")).alias("same"))
    )
    assert all(r.same for r in joined.collect())


def test_media_export_idempotent_guids(spark, blob_df, tmp_path):
    d1, d2 = str(tmp_path / "m1"), str(tmp_path / "m2")
    g1 = sorted(r.guid for r in export_media(blob_df, d1).collect())
    g2 = sorted(r.guid for r in export_media(blob_df, d2).collect())
    assert g1 == g2  # content-derived GUIDs, not random


def test_image_features_shapes(spark, blob_df):
    out = multimodal.image_features(blob_df, decode_strict=False)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.width == 8 and r.height == 8 and r.channels == 3 for r in rows)
    assert all(0.0 <= r.mean_pixel <= 255.0 for r in rows)
    # deterministic: run twice, same result
    again = {r.id: r.mean_pixel for r in multimodal.image_features(blob_df).collect()}
    assert {r.id: r.mean_pixel for r in rows} == again


def test_image_decode_strict_raises_cleanly(spark, blob_df):
    try:
        import PIL  # type: ignore  # noqa: F401

        pytest.skip("PIL installed; strict path would decode for real")
    except ImportError:
        pass
    with pytest.raises(Exception, match="requires PIL"):
        multimodal.image_features(blob_df, decode_strict=True).collect()


def test_thumbnail_binary_out(spark, blob_df):
    out = multimodal.image_thumbnail(blob_df, size=(4, 4)).collect()
    assert all(len(r.thumb_bytes) == 4 * 4 * 3 for r in out)


def test_audio_features(spark, blob_df):
    rows = multimodal.audio_features(blob_df).collect()
    assert len(rows) == 20
    assert all(r.sample_rate == 16000 and r.n_samples >= 16 for r in rows)
    assert all(0.0 <= r.rms <= 1.01 for r in rows)


def test_video_frame_fanout(spark, blob_df):
    frames = multimodal.video_frame_sample(blob_df, every_n_bytes=64, frame_size=16)
    per_doc = {r.id: r.n for r in frames.groupBy("id").agg(F.count("*").alias("n")).collect()}
    sizes = {r[0]: len(r[1]) for r in blob_df.collect()}
    for i, n in per_doc.items():
        assert n == (sizes[i] + 63) // 64  # ceil fan-out matches payload size
