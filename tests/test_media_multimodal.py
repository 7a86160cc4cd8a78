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


# --- MediaSet multi-member + real dependency-free decode paths -----------

def _make_bmp(width, height, rgb_rows):
    """Minimal uncompressed 24-bit BMP encoder (test-side)."""
    import struct

    row_size = (width * 3 + 3) & ~3
    pad = row_size - width * 3
    pixel_data = b""
    for row in reversed(rgb_rows):  # BMP stores bottom-up
        for (r, g, b) in row:
            pixel_data += bytes([b, g, r])
        pixel_data += b"\x00" * pad
    data_off = 14 + 40
    file_size = data_off + len(pixel_data)
    header = b"BM" + struct.pack("<IHHI", file_size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    return header + info + pixel_data


def _make_wav(samples_i16, rate=8000):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(struct.pack(f"<{len(samples_i16)}h", *samples_i16))
    return buf.getvalue()


def test_media_set_multi_member_roundtrip(spark, tmp_path):
    from bigdatamigratecloud_spark.sources.media import export_media_set

    df = spark.createDataFrame(
        [(1, [b"alpha", b"beta"]), (2, [b"gamma"]), (3, [b"alpha", b"delta", b"epsilon"])],
        "id long, contents array<binary>",
    )
    media_dir = str(tmp_path / "mediaset")
    manifest = export_media_set(df, media_dir, members_col="contents", id_col="id")
    rows = manifest.orderBy("id", "member_idx").collect()
    # one manifest row per member, order preserved
    assert [(r.id, r.member_idx) for r in rows] == [
        (1, 0), (1, 1), (2, 0), (3, 0), (3, 1), (3, 2)
    ]
    # content-identical members share one GUID/file (media-object sharing)
    guids = {(r.id, r.member_idx): r.guid for r in rows}
    assert guids[(1, 0)] == guids[(3, 0)]
    back = import_media(spark, media_dir)
    contents = {r.guid: bytes(r.content) for r in back.collect()}
    assert len(contents) == 5  # alpha beta gamma delta epsilon
    assert contents[guids[(1, 0)]] == b"alpha"
    assert contents[guids[(3, 2)]] == b"epsilon"
    # every manifest size matches the real file
    for r in rows:
        assert os.path.getsize(r.path) == r.size


def test_real_bmp_decode_in_image_features(spark):
    """PIL is absent in this container, but 24-bit BMP decodes for REAL
    (pure struct+numpy) — width/height/mean come from actual pixels."""
    rows = [[(255, 0, 0)] * 6, [(0, 255, 0)] * 6, [(0, 0, 255)] * 6, [(10, 20, 30)] * 6]
    bmp = _make_bmp(6, 4, rows)
    df = spark.createDataFrame([(1, bmp)], "id long, content binary")
    out = multimodal.image_features(df, decode_strict=True).collect()[0]
    assert (out.width, out.height, out.channels) == (6, 4, 3)
    expected_mean = (255 + 255 + 255 + 10 + 20 + 30) / 12.0
    assert abs(out.mean_pixel - expected_mean) < 1e-9
    assert out.payload_size == len(bmp)


def test_real_wav_decode_in_audio_features(spark):
    samples = [0, 16384, -16384, 32767, -32768, 0, 8192, -8192]
    wav = _make_wav(samples, rate=8000)
    df = spark.createDataFrame([(1, wav)], "id long, content binary")
    out = multimodal.audio_features(df, decode_strict=True).collect()[0]
    assert out.n_samples == len(samples)
    assert out.sample_rate == 8000
    import numpy as np

    x = np.array(samples, dtype="float64") / 32768.0
    assert abs(out.rms - float(np.sqrt((x ** 2).mean()))) < 1e-12


def _filter_rows(flat, bpp, row_filters):
    """Apply chosen PNG filters to (h, stride) byte rows -> filtered
    stream bytes (tag + line per row)."""
    import numpy as np

    raw = b""
    prev = np.zeros(flat.shape[1], dtype=np.int32)
    for y in range(flat.shape[0]):
        line, f = flat[y], row_filters[y % len(row_filters)]
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), line[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
        if f == 0:
            filt = line
        elif f == 1:
            filt = line - left
        elif f == 2:
            filt = line - prev
        elif f == 3:
            filt = line - ((left + prev) >> 1)
        elif f == 4:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            filt = line - pred
        raw += bytes([f]) + (filt % 256).astype(np.uint8).tobytes()
        prev = line
    return raw


_ADAM7_TEST = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _make_png(arr, color_type, row_filters=None, palette=None, depth=8, interlace=0):
    """Minimal PNG encoder (test-side): 8- or 16-bit depth, optionally
    Adam7-interlaced, with a CHOSEN filter applied per scanline
    (exercises the decoder's unfilter paths, which a filter-0-only
    encoder would leave dead).  Filtering is byte-wise per the spec, so
    the 16-bit path just serializes big-endian sample bytes first."""
    import struct
    import zlib

    import numpy as np

    h, w = np.asarray(arr).shape[:2]
    c = 1 if np.asarray(arr).ndim == 2 else np.asarray(arr).shape[2]
    if depth < 8:
        grid = np.asarray(arr, dtype=np.uint8).reshape(h, w)
    elif depth == 8:
        grid = np.asarray(arr, dtype=np.uint8).reshape(h, w, c)
    else:
        grid = np.frombuffer(
            np.ascontiguousarray(np.asarray(arr, dtype=np.uint16)).astype(">u2").tobytes(),
            dtype=np.uint8,
        ).reshape(h, w, c * 2)
    def pack_rows(g):
        """(hh, ww, c|samples) grid -> (hh, stride) int32 byte rows."""
        hh, ww = g.shape[:2]
        if depth >= 8:
            bpp_ = c * (depth // 8)
            return np.ascontiguousarray(g).reshape(hh, ww * bpp_).astype(np.int32), bpp_
        # sub-byte: MSB-first bit packing, filter unit is one byte
        vals = np.ascontiguousarray(g).reshape(hh, ww).astype(np.uint8)
        bits = ((vals[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1).reshape(hh, ww * depth)
        pad = (-bits.shape[1]) % 8
        if pad:
            bits = np.concatenate([bits, np.zeros((hh, pad), dtype=bits.dtype)], axis=1)
        return np.packbits(bits.astype(np.uint8), axis=1).astype(np.int32), 1

    row_filters = row_filters or [0]
    if interlace == 0:
        flat, bpp = pack_rows(grid)
        raw = _filter_rows(flat, bpp, row_filters)
    else:
        raw = b""
        for x0, y0, dx, dy in _ADAM7_TEST:
            sub = grid[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            flat, bpp = pack_rows(sub)
            raw += _filter_rows(flat, bpp, row_filters)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(v for rgb in palette for v in rgb))
    out += chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    return out


def test_png_decode_all_filters_rgb():
    """Every scanline filter (None/Sub/Up/Average/Paeth) must reconstruct
    the identical RGB pixels."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.multimodal import _decode_png

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    for f in range(5):
        png = _make_png(arr, color_type=2, row_filters=[f] * 5)
        got = _decode_png(png)
        assert got is not None and got.shape == (5, 9, 3), f"filter {f}"
        assert (got == arr).all(), f"filter {f} mismatch"
    # mixed filters across rows
    png = _make_png(arr, color_type=2, row_filters=[0, 1, 2, 3, 4])
    assert (_decode_png(png) == arr).all()


def test_png_decode_gray_rgba_palette():
    import numpy as np

    from bigdatamigratecloud_spark.operators.multimodal import _decode_png

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(4, 7), dtype=np.uint8)
    got = _decode_png(_make_png(gray, color_type=0, row_filters=[0, 1, 2, 4]))
    assert got.shape == (4, 7, 1) and (got[:, :, 0] == gray).all()

    rgba = rng.integers(0, 256, size=(3, 4, 4), dtype=np.uint8)
    got = _decode_png(_make_png(rgba, color_type=6, row_filters=[4, 3, 1]))
    assert got.shape == (3, 4, 4) and (got == rgba).all()

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    got = _decode_png(_make_png(idx, color_type=3, palette=palette))
    want = np.array(palette, dtype=np.uint8)[idx]
    assert got.shape == (2, 4, 3) and (got == want).all()


def test_png_decode_rejects_unsupported():
    """Interlaced PNGs, depth-corrupted streams, and non-PNG bytes fall
    through to the PIL/strict gate as None, never a wrong array.  (The
    depth-flip case: claiming 16-bit over 8-bit-sized scanlines is a
    stride mismatch, caught by the length check.)"""
    import struct
    import zlib

    import numpy as np

    from bigdatamigratecloud_spark.operators.multimodal import _decode_png

    assert _decode_png(b"not a png at all") is None
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    ok = _make_png(arr, color_type=2)
    # corrupt the IHDR depth byte (8 -> 16): offset = 8 sig + 8 hdr + 8 w/h
    bad_depth = ok[:24] + b"\x10" + ok[25:]
    assert _decode_png(bad_depth) is None
    # interlace byte flipped on over a NON-interlaced stream: Adam7 is
    # supported now, but the pass geometry then disagrees with the
    # actual scanline bytes — caught as truncation, never a wrong array
    bad_inter = ok[:28] + b"\x01" + ok[29:]
    assert _decode_png(bad_inter) is None
    # truncated IDAT: valid zlib but too few scanline bytes
    import struct as _s
    short = zlib.compress(b"\x00\x01\x02")
    png = ok[:33] + _s.pack(">I", len(short)) + b"IDAT" + short + _s.pack(
        ">I", zlib.crc32(b"IDAT" + short) & 0xFFFFFFFF
    ) + ok[len(ok) - 12 :]
    assert _decode_png(png) is None


def test_png_decode_16bit_all_filters():
    """REAL 16-bit PNG decode: byte-wise unfiltering at bpp = 2×channels
    for every filter type, high-byte down-conversion to uint8 — gray and
    RGB.  A 16-bit palette image is invalid per spec and must be
    rejected."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.multimodal import _decode_png

    rng = np.random.default_rng(23)
    g16 = rng.integers(0, 65536, size=(5, 9), dtype=np.uint16)
    for f in range(5):
        got = _decode_png(_make_png(g16, color_type=0, row_filters=[f] * 5, depth=16))
        assert got is not None and got.shape == (5, 9, 1), f"filter {f}"
        assert (got[:, :, 0] == (g16 >> 8).astype(np.uint8)).all(), f"filter {f}"

    rgb16 = rng.integers(0, 65536, size=(4, 6, 3), dtype=np.uint16)
    got = _decode_png(_make_png(rgb16, color_type=2, row_filters=[0, 1, 2, 4], depth=16))
    assert got.shape == (4, 6, 3) and (got == (rgb16 >> 8).astype(np.uint8)).all()

    # 16-bit palette: invalid per spec -> None
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint16)
    bad = _make_png(idx, color_type=3, palette=[(1, 2, 3), (4, 5, 6)], depth=16)
    assert _decode_png(bad) is None


def test_png_decode_adam7_interlaced():
    """REAL Adam7 decode: seven independently-filtered sub-images
    scattered back on the pass grid — gray, RGB, RGBA, 16-bit, and
    dimensions small enough that several passes are EMPTY (the
    edge the pass-geometry math must get right)."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.multimodal import _decode_png

    rng = np.random.default_rng(31)
    cases = [
        (rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8), 2, 8),
        (rng.integers(0, 256, size=(13, 21), dtype=np.uint8), 0, 8),      # odd dims
        (rng.integers(0, 256, size=(9, 5, 4), dtype=np.uint8), 6, 8),     # RGBA
        (rng.integers(0, 256, size=(3, 2), dtype=np.uint8), 0, 8),        # most passes empty
        (rng.integers(0, 256, size=(1, 1), dtype=np.uint8), 0, 8),        # single pixel (pass 1 only)
    ]
    for arr, ctype, depth in cases:
        for filters in ([0], [0, 1, 2, 3, 4]):
            png = _make_png(arr, color_type=ctype, row_filters=filters, interlace=1)
            got = _decode_png(png)
            assert got is not None, f"{arr.shape} filters={filters}"
            want = arr if arr.ndim == 3 else arr[:, :, None]
            assert (got == want).all(), f"{arr.shape} filters={filters}"

    # 16-bit interlaced: high-byte down-conversion after scatter
    g16 = rng.integers(0, 65536, size=(11, 7), dtype=np.uint16)
    got = _decode_png(_make_png(g16, color_type=0, depth=16, interlace=1, row_filters=[2, 4]))
    assert got is not None and (got[:, :, 0] == (g16 >> 8).astype(np.uint8)).all()


def _make_wav_raw(data: bytes, fmt_tag: int, channels: int, rate: int, bits: int) -> bytes:
    import struct

    block = channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", fmt_tag, channels, rate, rate * block, block, bits)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def test_g711_wav_decode_matches_audioop():
    """REAL A-law/µ-law WAV decode (format tags 6/7, which the stdlib
    ``wave`` module rejects): every one of the 256 code bytes must
    expand to the same linear value the stdlib G.711 reference
    (audioop) produces."""
    import numpy as np
    import pytest as _pytest

    audioop = _pytest.importorskip("audioop")  # stdlib in 3.11, gone in 3.13

    from bigdatamigratecloud_spark.operators.multimodal import (
        _decode_wav_companded,
    )

    codes = bytes(range(256))
    for tag, expand in ((7, audioop.ulaw2lin), (6, audioop.alaw2lin)):
        wav = _make_wav_raw(codes, fmt_tag=tag, channels=1, rate=8000, bits=8)
        got = _decode_wav_companded(wav)
        assert got is not None
        x, rate = got
        assert rate == 8000 and len(x) == 256
        want = np.frombuffer(expand(codes, 2), dtype="<i2").astype("float64") / 32768.0
        assert np.array_equal(x, want), "G.711 table mismatch vs stdlib reference"

    # stereo µ-law mixes to mono like the PCM path
    stereo = _make_wav_raw(bytes([0x00, 0xFF] * 10), fmt_tag=7, channels=2, rate=16000, bits=8)
    x2, r2 = _decode_wav_companded(stereo)
    assert r2 == 16000 and len(x2) == 10
    # PCM tag through this path -> None (handled by _decode_wav instead)
    assert _decode_wav_companded(_make_wav_raw(codes, 1, 1, 8000, 8)) is None


def test_g711_wav_through_audio_features(spark):
    """The strict audio gate accepts µ-law WAV end-to-end through the
    mapInPandas kernel."""
    import math

    import numpy as np
    import pytest as _pytest

    audioop = _pytest.importorskip("audioop")

    from bigdatamigratecloud_spark.operators import multimodal

    # a 440 Hz-ish tone PCM16 -> µ-law bytes via the stdlib reference
    t = np.arange(800) / 8000.0
    pcm = (np.sin(2 * math.pi * 440 * t) * 20000).astype("<i2").tobytes()
    ulaw = audioop.lin2ulaw(pcm, 2)
    wav = _make_wav_raw(ulaw, fmt_tag=7, channels=1, rate=8000, bits=8)
    df = spark.createDataFrame([(1, wav)], "id long, content binary")
    out = multimodal.audio_features(df, decode_strict=True).collect()[0]
    assert out.sample_rate == 8000
    assert out.n_samples == 800


def test_real_png_decode_in_image_features(spark):
    """PIL is absent, but 8-bit PNG decodes for REAL (stdlib zlib+numpy)
    through the strict mapInPandas path — dims and mean come from actual
    pixels."""
    import numpy as np

    arr = np.zeros((4, 6, 3), dtype=np.uint8)
    arr[0, :, 0] = 255
    arr[1, :, 1] = 255
    arr[2, :, 2] = 255
    arr[3, :] = (10, 20, 30)
    png = _make_png(arr, color_type=2, row_filters=[0, 1, 2, 4])
    df = spark.createDataFrame([(1, png)], "id long, content binary")
    out = multimodal.image_features(df, decode_strict=True).collect()[0]
    assert (out.width, out.height, out.channels) == (6, 4, 3)
    assert abs(out.mean_pixel - float(arr.mean())) < 1e-9
    assert out.payload_size == len(png)


def test_png_palette_index_overflow_returns_none():
    """A corrupt palette PNG whose pixel indices exceed the PLTE size must
    fall through to the gate as None — never an IndexError that kills the
    whole Spark task on one bad blob."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.multimodal import _decode_png

    idx = np.array([[0, 5], [1, 0]], dtype=np.uint8)  # index 5, 2-entry PLTE
    bad = _make_png(idx, color_type=3, palette=[(1, 2, 3), (4, 5, 6)])
    assert _decode_png(bad) is None


# ------------------------------------------------------------------ JPEG


def _gradient_rgb(h, w):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(yy * 4) % 256, (xx * 3) % 256, ((yy + xx) * 2) % 256], axis=-1)
    return (img.astype(float) * 0.3 + 100).astype(np.uint8)


def test_jpeg_roundtrip_444_and_420():
    """Baseline JPEG encode→decode round-trips within quantization error
    for 4:4:4 and 4:2:0 chroma subsampling, including non-multiple-of-8
    (and for 4:2:0, non-multiple-of-16) dimensions."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = _gradient_rgb(37, 51)
    for sub in ("444", "420"):
        dec = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
        assert dec is not None and dec.shape == (37, 51, 3)
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= 4, f"{sub}: max err {err.max()}"
        assert err.mean() < 1.0


def test_jpeg_restart_intervals_and_gray():
    import numpy as np

    from bigdatamigratecloud_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = _gradient_rgb(40, 56)
    blob = encode_jpeg(img, quality=90, restart_interval=2, subsampling="420")
    assert b"\xff\xdd" in blob and b"\xff\xd0" in blob  # DRI + RST0 present
    dec = decode_jpeg(blob)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4

    gray = ((np.add.outer(np.arange(24) * 3, np.arange(40) * 2)) % 250).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(gray, quality=95))
    assert dec.shape == (24, 40, 1)
    assert np.abs(dec[:, :, 0].astype(int) - gray.astype(int)).max() <= 2


def test_jpeg_uniform_lossless_and_rejects():
    import numpy as np

    from bigdatamigratecloud_spark.operators.jpeg import decode_jpeg, encode_jpeg

    u = np.full((24, 24, 3), 130, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(u, quality=85))
    assert np.abs(dec.astype(int) - 130).max() == 0
    # non-JPEG, truncated stream, arithmetic-coded marker → None (gate)
    assert decode_jpeg(b"not a jpeg") is None
    assert decode_jpeg(encode_jpeg(u)[:40]) is None
    arith = bytearray(encode_jpeg(u))
    sof = arith.find(b"\xff\xc0")
    arith[sof + 1] = 0xC9  # SOF9: arithmetic coding — genuinely unsupported
    assert decode_jpeg(bytes(arith)) is None


def test_progressive_jpeg_decodes_bit_identical_to_baseline():
    """REAL progressive JPEG (SOF2) decode: the progressive encoder's
    scan script (DC first + refine, AC spectral bands, two AC
    successive-approximation refinements with EOB runs and correction
    bits) fully refines every coefficient, so decoding the progressive
    stream must match decoding the BASELINE stream of the same image
    bit-for-bit — gray and color, odd dimensions, two qualities."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    cases = [
        rng.integers(0, 256, size=(24, 24)).astype(np.uint8),      # gray noise
        rng.integers(0, 256, size=(19, 27, 3)).astype(np.uint8),   # color noise, odd dims
        _gradient_rgb(37, 51),                                     # smooth color
        np.full((16, 16), 130, dtype=np.uint8),                    # uniform (EOB-run heavy)
    ]
    for img in cases:
        for q in (85, 50):
            prog = encode_jpeg_progressive(img, quality=q)
            assert b"\xff\xc2" in prog  # really SOF2
            dp = decode_jpeg(prog)
            db = decode_jpeg(encode_jpeg(img, quality=q))
            assert dp is not None and db is not None
            assert np.array_equal(dp, db), (
                f"progressive != baseline for shape {img.shape} q={q}"
            )


def test_progressive_jpeg_through_strict_image_features(spark):
    """The strict multimodal gate no longer rejects progressive JPEG:
    a SOF2 blob decodes for real inside the mapInPandas kernel."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.jpeg import encode_jpeg_progressive

    img = _gradient_rgb(32, 48)
    blob = encode_jpeg_progressive(img, quality=95)
    df = spark.createDataFrame([(1, blob)], "id long, content binary")
    out = multimodal.image_features(df, decode_strict=True).collect()[0]
    assert (out.width, out.height, out.channels) == (48, 32, 3)
    assert abs(out.mean_pixel - float(img.mean())) < 2.0


def test_real_jpeg_decode_in_image_features(spark):
    """PIL is absent, but baseline JPEG decodes for REAL through the
    strict mapInPandas path — dims come from the SOF0 header, mean from
    actual IDCT output pixels."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.jpeg import encode_jpeg

    img = _gradient_rgb(32, 48)
    blob = encode_jpeg(img, quality=95, subsampling="420")
    df = spark.createDataFrame([(1, blob)], "id long, content binary")
    out = multimodal.image_features(df, decode_strict=True).collect()[0]
    assert (out.width, out.height, out.channels) == (48, 32, 3)
    assert abs(out.mean_pixel - float(img.mean())) < 2.0  # lossy, but real
    assert out.payload_size == len(blob)


def test_ima_adpcm_wav_decode_matches_audioop():
    """REAL IMA ADPCM WAV decode (format tag 17): block headers carry the
    (predictor, index) state per channel, nibble bodies expand through
    the IMA step tables — sample-exact against the stdlib DVI/IMA
    reference (audioop) replayed block by block, mono and stereo
    (per-channel 4-byte nibble-group interleave)."""
    import random
    import struct

    import numpy as np
    import pytest as _pytest

    audioop = _pytest.importorskip("audioop")

    from bigdatamigratecloud_spark.operators.multimodal import (
        _decode_wav_ima_adpcm,
    )

    rng = random.Random(17)

    def build(ch, n_blocks, groups_per_block):
        """Hand-assemble an IMA WAV + the audioop-decoded reference."""
        block_align = 4 * ch + 4 * ch * groups_per_block
        data = b""
        ref_ch = [[] for _ in range(ch)]
        for _b in range(n_blocks):
            states = []
            for c in range(ch):
                pred = rng.randrange(-30000, 30000)
                idx = rng.randrange(0, 89)
                data += struct.pack("<hB", pred, idx) + b"\x00"
                states.append((pred, idx))
                ref_ch[c].append(pred)
            for _g in range(groups_per_block):
                for c in range(ch):
                    nibs = [rng.randrange(16) for _ in range(8)]
                    # WAV packs LOW nibble first; audioop expects HIGH first
                    data += bytes(
                        (nibs[i] | (nibs[i + 1] << 4)) for i in range(0, 8, 2)
                    )
                    packed_hi = bytes(
                        (nibs[i] << 4) | nibs[i + 1] for i in range(0, 8, 2)
                    )
                    dec, states[c] = audioop.adpcm2lin(packed_hi, 2, states[c])
                    ref_ch[c].extend(np.frombuffer(dec, dtype="<i2").tolist())
        fmt = struct.pack("<HHIIHHH", 17, ch, 8000, 8000, block_align, 4, 2)
        wav = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        wav += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        wav += b"data" + struct.pack("<I", len(data)) + data
        ref = np.array(ref_ch, dtype="float64") / 32768.0
        return wav, ref.mean(axis=0)

    for ch, blocks, groups in ((1, 3, 5), (2, 2, 4)):
        wav, want = build(ch, blocks, groups)
        got = _decode_wav_ima_adpcm(wav)
        assert got is not None, f"ch={ch}"
        x, rate = got
        assert rate == 8000 and len(x) == len(want), f"ch={ch}"
        assert np.array_equal(x, want), f"ch={ch}: sample mismatch"

    # PCM tag through this path -> None
    from tests.test_media_multimodal import _make_wav_raw  # self-import ok under pytest
    assert _decode_wav_ima_adpcm(_make_wav_raw(b"\x00" * 64, 1, 1, 8000, 8)) is None


def test_png_decode_subbyte_depths():
    """REAL 1/2/4-bit PNG decode (icons/fax): MSB-first bit unpacking
    after byte-unit unfiltering, gray scaled to the full range
    (255 / 85 / 17 steps), 4-bit palette indexing, every filter, odd
    widths that leave padding bits in the last byte, and Adam7."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.multimodal import _decode_png

    rng = np.random.default_rng(41)
    for depth in (1, 2, 4):
        mx = (1 << depth) - 1
        scale = 255 // mx
        arr = rng.integers(0, mx + 1, size=(7, 13), dtype=np.uint8)  # 13: pad bits
        for filters in ([0], [0, 1, 2, 3, 4]):
            got = _decode_png(_make_png(arr, color_type=0, row_filters=filters, depth=depth))
            assert got is not None, f"depth {depth} filters {filters}"
            assert got.shape == (7, 13, 1)
            assert (got[:, :, 0] == arr * scale).all(), f"depth {depth} filters {filters}"
        # Adam7 sub-byte
        goti = _decode_png(_make_png(arr, color_type=0, depth=depth, interlace=1))
        assert goti is not None and (goti[:, :, 0] == arr * scale).all(), f"adam7 d{depth}"

    # 4-bit palette
    palette = [(i * 16, 255 - i * 16, i) for i in range(16)]
    idx = rng.integers(0, 16, size=(5, 9), dtype=np.uint8)
    got = _decode_png(_make_png(idx, color_type=3, palette=palette, depth=4, row_filters=[0, 2]))
    want = np.array(palette, dtype=np.uint8)[idx]
    assert got is not None and (got == want).all()
    # out-of-palette index (2-bit image, 2-entry palette, index 3) -> None
    bad_idx = np.full((2, 4), 3, dtype=np.uint8)
    assert _decode_png(_make_png(bad_idx, color_type=3, palette=[(0, 0, 0), (1, 1, 1)], depth=2)) is None


def test_ima_adpcm_block_geometry_edge_cases():
    """Review-fix pins: non-group-aligned mono bodies decode byte-exactly
    (block_align=10 -> 13 samples per block, not 9), wSamplesPerBlock
    truncates encoder padding, a SHORT final mono block still decodes,
    and a stereo body breaking the 4-byte-per-channel interleave is
    rejected rather than silently mis-deinterleaved."""
    import random
    import struct

    import numpy as np
    import pytest as _pytest

    audioop = _pytest.importorskip("audioop")

    from bigdatamigratecloud_spark.operators.multimodal import (
        _decode_wav_ima_adpcm,
    )

    rng = random.Random(23)

    def wav(data, block_align, ch=1, spb=None):
        if spb is None:
            fmt = struct.pack("<HHIIHH", 17, ch, 8000, 8000, block_align, 4)
        else:
            fmt = struct.pack("<HHIIHHHH", 17, ch, 8000, 8000, block_align, 4, 2, spb)
        out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        out += b"data" + struct.pack("<I", len(data)) + data
        return out

    def ref_block(body, pred, idx):
        nibs = []
        for byte in body:
            nibs += [byte & 0xF, byte >> 4]
        packed_hi = bytes((nibs[i] << 4) | nibs[i + 1] for i in range(0, len(nibs), 2))
        dec, _ = audioop.adpcm2lin(packed_hi, 2, (pred, idx))
        return [pred] + np.frombuffer(dec, dtype="<i2").tolist()

    # mono block_align=10: 4-byte header + 6 body bytes = 13 samples/block
    blocks, want = b"", []
    for _ in range(3):
        pred, idx = rng.randrange(-20000, 20000), rng.randrange(0, 89)
        body = bytes(rng.randrange(256) for _ in range(6))
        blocks += struct.pack("<hB", pred, idx) + b"\x00" + body
        want += ref_block(body, pred, idx)
    got = _decode_wav_ima_adpcm(wav(blocks, 10))
    assert got is not None
    x, _ = got
    assert len(x) == 39  # 3 blocks x 13 samples — nothing dropped
    assert np.array_equal(x, np.array(want, dtype="float64") / 32768.0)

    # wSamplesPerBlock=12 declares one sample of padding: truncated
    got12 = _decode_wav_ima_adpcm(wav(blocks, 10, spb=12))
    assert len(got12[0]) == 36
    assert np.array_equal(got12[0][:12], np.array(want[:12], dtype="float64") / 32768.0)
    # a declared count the block cannot carry -> rejected
    assert _decode_wav_ima_adpcm(wav(blocks, 10, spb=14)) is None

    # SHORT final mono block (header + 2 body bytes): decoded, not dropped
    pred, idx = 123, 7
    tail_body = b"\x5a\xa5"
    partial = blocks + struct.pack("<hB", pred, idx) + b"\x00" + tail_body
    gp = _decode_wav_ima_adpcm(wav(partial, 10))
    assert gp is not None and len(gp[0]) == 39 + 5
    assert np.array_equal(
        gp[0][-5:], np.array(ref_block(tail_body, pred, idx), dtype="float64") / 32768.0
    )

    # stereo body not a multiple of 8 bytes: ambiguous interleave -> None
    st = (struct.pack("<hB", 0, 0) + b"\x00") * 2 + b"\x11" * 6
    assert _decode_wav_ima_adpcm(wav(st, len(st), ch=2)) is None


def test_png_bogus_huge_dims_rejected_cheaply():
    """An IHDR claiming astronomical dimensions over a tiny payload must
    return None via the pass-geometry length check — never attempt the
    allocation (interlaced, both sub-byte and 8-bit)."""
    import struct
    import zlib

    import numpy as np

    from bigdatamigratecloud_spark.operators.multimodal import _decode_png

    def png(w, h, depth, color, interlace):
        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 64)) + chunk(b"IEND", b"")
        )

    for depth, color in ((1, 0), (8, 0), (8, 2), (16, 2)):
        for interlace in (0, 1):
            assert _decode_png(png(0xFFFFFF, 0xFFFFFF, depth, color, interlace)) is None


# --- GIF (from-scratch LZW) ------------------------------------------------


def _gif_pack_codes(codes, m):
    """Pack LZW codes LSB-first, growing the code width exactly as the
    decoder's table-size rule does (so arbitrary code streams stay in
    sync)."""
    clear, eoi = 1 << m, (1 << m) + 1
    width, table_len, prev_seen = m + 1, eoi + 1, False
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if c == clear:
            width, table_len, prev_seen = m + 1, eoi + 1, False
        elif c != eoi:
            if prev_seen:
                table_len += 1
                if table_len == (1 << width) and width < 12:
                    width += 1
            prev_seen = True
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_literal_codes(indices, m):
    """Literal-only LZW coding with periodic clears (the classic
    'uncompressed GIF' technique): valid per spec, trivially correct."""
    clear, eoi = 1 << m, (1 << m) + 1
    codes, run = [clear], 0
    for ix in indices:
        codes.append(ix)
        run += 1
        if run >= (1 << m) - 2:
            codes.append(clear)
            run = 0
    codes.append(eoi)
    return codes


def _make_gif(w, h, indices, palette, m=2, interlace=False, codes=None,
              n89=False, extra_frame=False):
    import struct

    # global color table sized 2^(p+1) >= len(palette)
    p = 1
    while (2 << p) < len(palette):
        p += 1
    gct = bytearray()
    for i in range(2 << p):
        if i < len(palette):
            gct += bytes(palette[i])
        else:
            gct += b"\x00\x00\x00"
    out = bytearray(b"GIF89a" if n89 else b"GIF87a")
    out += struct.pack("<HH", w, h) + bytes((0x80 | p, 0, 0)) + gct
    if n89:  # graphic control extension the decoder must skip
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes(((0x40 if interlace else 0x00),))
    out += bytes((m,))
    data = _gif_pack_codes(codes or _gif_literal_codes(indices, m), m)
    i = 0
    while i < len(data):
        chunk = data[i : i + 255]
        out += bytes((len(chunk),)) + chunk
        i += 255
    out += b"\x00"
    if extra_frame:  # second frame: first-frame-only decode must ignore it
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00" + bytes((m,))
        d2 = _gif_pack_codes(_gif_literal_codes([0] * (w * h), m), m)
        i = 0
        while i < len(d2):
            chunk = d2[i : i + 255]
            out += bytes((len(chunk),)) + chunk
            i += 255
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_decode_literal_and_dictionary_paths():
    import numpy as np

    from bigdatamigratecloud_spark.operators.multimodal import _decode_gif

    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    idx = [0, 1, 2, 3, 3, 2, 1, 0, 1, 1, 2, 2, 0, 3, 0, 2]
    gif = _make_gif(4, 4, idx, palette)
    arr = _decode_gif(gif)
    assert arr is not None and arr.shape == (4, 4, 3)
    want = np.array([palette[i] for i in idx], dtype=np.uint8).reshape(4, 4, 3)
    assert (arr == want).all()
    # hand-derived stream exercising BOTH dictionary branches at m=2:
    # [clear, 1, 6, 6, eoi] — the first 6 is code==next (entry built
    # from prev), the second is a plain dict hit — decodes to five 1s
    gif2 = _make_gif(5, 1, None, palette, codes=[4, 1, 6, 6, 5])
    arr2 = _decode_gif(gif2)
    assert arr2 is not None and arr2.shape == (1, 5, 3)
    assert (arr2 == np.array([palette[1]] * 5, dtype=np.uint8)).all()


def test_gif_decode_interlaced_and_multiframe():
    import numpy as np

    from bigdatamigratecloud_spark.operators.multimodal import _decode_gif

    palette = [(i * 16, 0, 255 - i * 16) for i in range(8)]
    w, h = 3, 8
    grid = [[(y % 8) for _x in range(w)] for y in range(h)]
    # rows arrive in interlace pass order 0,8..;4..;2,6..;1,3,5,7
    order = [0] + [4] + [2, 6] + [1, 3, 5, 7]
    shuffled = [grid[y] for y in order]
    idx = [i for row in shuffled for i in row]
    gif = _make_gif(w, h, idx, palette, m=3, interlace=True, n89=True,
                    extra_frame=True)
    arr = _decode_gif(gif)
    assert arr is not None and arr.shape == (h, w, 3)
    want = np.array(
        [[palette[v] for v in row] for row in grid], dtype=np.uint8
    )
    assert (arr == want).all()  # de-interlaced AND first frame only


def test_gif_decode_rejects_garbage_and_flows_into_image_features(spark):
    from bigdatamigratecloud_spark.operators.multimodal import (
        _decode_gif,
        image_features,
    )

    assert _decode_gif(b"GIF89a\x00") is None
    assert _decode_gif(b"NOTGIF" + b"\x00" * 40) is None
    palette = [(10, 20, 30), (200, 100, 50)]
    gif = _make_gif(2, 2, [0, 1, 1, 0], palette, m=2)
    df = spark.createDataFrame([(1, bytearray(gif))], "id long, content binary")
    row = image_features(df, decode_strict=True).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (2, 2, 3)
    exp = (10 + 20 + 30 + 200 + 100 + 50) * 2 / 12.0
    assert abs(row["mean_pixel"] - exp) < 1e-9


def test_gif_encoder_roundtrips_through_decoder():
    """encode_gif (real LZW, variable width, 4096-cap clears) must
    roundtrip bit-exactly through _decode_gif: a high-entropy 128x128
    image over 251 colors forces several width growths and at least one
    dictionary-cap clear; interlaced and sequential layouts agree."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.multimodal import (
        _decode_gif,
        encode_gif,
    )

    h = w = 128
    grid = np.fromfunction(
        lambda y, x: (y * 7 + x * 13 + (y * x) % 17) % 251, (h, w), dtype=np.int64
    ).astype(np.uint8)
    palette = [(i, (i * 3) % 256, 255 - i) for i in range(251)]
    want = np.array(palette, dtype=np.uint8)[grid]
    for interlace in (False, True):
        payload = encode_gif(grid, palette, interlace=interlace)
        arr = _decode_gif(payload)
        assert arr is not None and arr.shape == (h, w, 3)
        assert (arr == want).all(), f"interlace={interlace}"
    # compression is real: far smaller than the literal-coded form
    # (16384 pixels x ~1 byte/code at width 9-12 packed < raw 49KB RGB)
    assert len(encode_gif(grid, palette)) < h * w * 2
    # tiny palette exercises the min-code-size floor (m >= 2)
    small = encode_gif(np.array([[0, 1], [1, 0]], dtype=np.uint8), [(0, 0, 0), (255, 255, 255)])
    arr2 = _decode_gif(small)
    assert arr2 is not None and arr2.shape == (2, 2, 3)
    assert (arr2[0, 0] == (0, 0, 0)).all() and (arr2[0, 1] == (255, 255, 255)).all()


# ------------------------------ WebP lossless (VP8L) -----------------------


def test_webp_distance_table_matches_spec_prefix():
    """The 120-entry close-neighborhood table is generated by rule; its
    first 40 entries are pinned verbatim against the table printed in
    the WebP Lossless Bitstream Specification."""
    from bigdatamigratecloud_spark.operators.webp import _DIST_TABLE

    spec40 = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
        (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    ]
    assert _DIST_TABLE[:40] == spec40
    assert len(_DIST_TABLE) == 120


def test_webp_header_bit_layout_hand_computed():
    """Pin the exact bit layout of the stream head for a 17x5 image:
    0x2f signature, then LSB-first 14-bit width-1 = 16, 14-bit
    height-1 = 4, alpha bit, 3 version zeros — byte0 = 0b00010000,
    byte1 = (width>>8)=0 | (height-1)<<6 → 0x00, byte2 = 4>>2 = 1."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.webp import encode_webp_lossless

    img = np.full((5, 17, 3), 9, dtype=np.uint8)
    buf = encode_webp_lossless(img)
    assert buf[:4] == b"RIFF" and buf[8:16] == b"WEBPVP8L"
    payload = buf[20:]
    assert payload[0] == 0x2F
    # width-1 = 16 → bits 0..13 LSB-first: byte1 = 16, byte2 low 6 bits 0
    assert payload[1] == 16
    # height-1 = 4: its low 2 bits land in byte2's top bits (4&3 = 0),
    # remaining bits 2..13 of height-1 (= 1) start byte3
    assert payload[2] == 0
    assert payload[3] & 0b1 == 1


def test_webp_roundtrip_full_matrix():
    """Every decoder path against independently-encoded streams: plain
    literals, LZ77 runs, color cache, SUBTRACT_GREEN, all 14 predictor
    modes, bundled (<=16 color) and wide palettes, combined
    transforms, 1x1."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (13, 17, 4), dtype=np.uint8)
    assert (decode_webp(encode_webp_lossless(img, use_lz77_runs=False)) == img).all()
    runs = np.repeat(rng.randint(0, 256, (5, 4, 4), dtype=np.uint8), 5, axis=1)
    assert (decode_webp(encode_webp_lossless(runs)) == runs).all()
    few = rng.randint(0, 3, (9, 9, 4), dtype=np.uint8) * 80
    assert (decode_webp(encode_webp_lossless(few, cache_bits=4)) == few).all()
    assert (
        decode_webp(encode_webp_lossless(img, subtract_green=True, use_lz77_runs=False))
        == img
    ).all()
    for mode in range(14):
        assert (
            decode_webp(
                encode_webp_lossless(img, predictor_mode=mode, use_lz77_runs=False)
            )
            == img
        ).all(), f"predictor {mode}"
    pal = rng.randint(0, 3, (10, 21, 3), dtype=np.uint8) * 100
    got = decode_webp(encode_webp_lossless(pal, palette=True))
    assert (got[:, :, :3] == pal).all() and (got[:, :, 3] == 255).all()
    vals = rng.randint(0, 256, (30, 3), dtype=np.uint8)
    wide = vals[rng.randint(0, 30, (8, 9))]
    assert (decode_webp(encode_webp_lossless(wide, palette=True))[:, :, :3] == wide).all()
    assert (
        decode_webp(encode_webp_lossless(img, subtract_green=True, predictor_mode=7))
        == img
    ).all()
    one = np.array([[[200, 10, 30, 255]]], dtype=np.uint8)
    assert (decode_webp(encode_webp_lossless(one)) == one).all()


def test_webp_rejects_lossy_and_garbage():
    import struct

    import pytest as _pytest

    from bigdatamigratecloud_spark.operators.webp import _libwebp, decode_webp

    assert decode_webp(b"not a webp at all, nope") is None
    # a WebP container whose VP8 bitstream is garbage: with the system
    # libwebp PRESENT this is CORRUPT DATA (None — undecodable), never
    # misreported as a missing library; only when libwebp is absent is
    # NotImplementedError (no lossy decoder) the right diagnosis
    corrupt_lossy = b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8 " + b"\x00" * 12
    if _libwebp() is not None:
        assert decode_webp(corrupt_lossy) is None
    else:
        with _pytest.raises(NotImplementedError):
            decode_webp(corrupt_lossy)


def test_tiff_corrupt_payload_returns_none_not_task_fatal():
    """ADVICE r7: valid TIFF magic + malformed body must return None
    (codec contract: one corrupt file cannot kill a whole Spark task),
    while out-of-scope features still raise NotImplementedError."""
    import numpy as np
    import pytest as _pytest

    from bigdatamigratecloud_spark.operators.tiff import decode_tiff, encode_tiff

    # the advisor's exact reproducer: magic + garbage IFD offset
    assert decode_tiff(b"II*\x00\xff\xff\xff\xff") is None
    # truncated real file: IFD parses partially / strips run past the end
    real = encode_tiff(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    assert decode_tiff(real) is not None
    for cut in (9, len(real) // 2, len(real) - 3):
        got = decode_tiff(real[:cut])
        assert got is None or got.shape == (4, 4, 3)
    # missing required tags (width/height absent): KeyError path -> None
    bare = b"II*\x00" + b"\x08\x00\x00\x00" + b"\x00\x00" + b"\x00\x00\x00\x00"
    assert decode_tiff(bare) is None
    # out-of-scope features keep raising for the strict gate: patch a
    # real file's BitsPerSample to 32 (16 became SUPPORTED in round 9)
    import struct as _s

    patched = bytearray(encode_tiff(np.zeros((2, 2), np.uint8)))
    ifd_off = _s.unpack("<I", patched[4:8])[0]
    n = _s.unpack("<H", patched[ifd_off : ifd_off + 2])[0]
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if _s.unpack("<H", patched[e : e + 2])[0] == 258:
            patched[e + 8 : e + 10] = _s.pack("<H", 32)
    with _pytest.raises(NotImplementedError):
        decode_tiff(bytes(patched))


def test_corrupt_tiff_in_image_features_nonstrict(spark):
    """End-to-end: a corrupt TIFF payload inside the mapInPandas decode
    kernel yields the deterministic fake in non-strict mode instead of
    killing the task (the multimodal.py contract the advisor cited)."""
    df = spark.createDataFrame(
        [(1, b"II*\x00\xff\xff\xff\xff")], "id long, content binary"
    )
    out = multimodal.image_features(df, decode_strict=False).collect()[0]
    assert (out.width, out.height, out.channels) == (8, 8, 3)


def test_real_webp_decode_in_image_features(spark):
    """Lossless WebP decodes for REAL through the strict mapInPandas
    path — the round-5 'web corpora hit WebP often' gap closed."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.webp import encode_webp_lossless

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (6, 8, 3), dtype=np.uint8)
    wbp = encode_webp_lossless(arr, subtract_green=True)
    df = spark.createDataFrame([(1, wbp)], "id long, content binary")
    out = multimodal.image_features(df, decode_strict=True).collect()[0]
    assert (out.width, out.height, out.channels) == (8, 6, 4)
    rgba = np.dstack([arr, np.full((6, 8), 255, np.uint8)])
    assert abs(out.mean_pixel - float(rgba.mean())) < 1e-9
    assert out.payload_size == len(wbp)


def test_webp_color_transform_and_meta_prefix_roundtrip():
    """The two decoder paths the basic matrix misses: the COLOR
    transform (ColorTransformDelta with int8 multipliers, including
    wrap-around negative coefficients) and a real meta-prefix-code
    header (subresolution entropy image), alone and combined with the
    other transforms."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (11, 15, 4), dtype=np.uint8)
    for cte in [(16, 8, 4), (255, 128, 200), (0, 0, 0), (37, 211, 99)]:
        got = decode_webp(
            encode_webp_lossless(img, color_transform=cte, use_lz77_runs=False)
        )
        assert (got == img).all(), cte
    got = decode_webp(
        encode_webp_lossless(
            img, color_transform=(16, 8, 4), subtract_green=True, predictor_mode=7
        )
    )
    assert (got == img).all()
    assert (decode_webp(encode_webp_lossless(img, meta_bits=3)) == img).all()
    assert (
        decode_webp(
            encode_webp_lossless(img, meta_bits=2, subtract_green=True, cache_bits=3)
        )
        == img
    ).all()


def test_lossy_webp_falls_back_to_fake_when_non_strict(spark):
    """Default (non-strict) image ops over a corpus containing lossy
    VP8 WebP — the majority of real-world .webp — must yield the
    documented deterministic fake, not fail the Spark task.  Strict
    mode still raises.  (Regression: decode_webp's NotImplementedError
    used to escape BEFORE the strict gate.)"""
    import struct

    import pytest as _pytest

    lossy = b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8 " + b"\x00" * 12
    df = spark.createDataFrame([(1, lossy)], "id long, content binary")
    out = multimodal.image_features(df, decode_strict=False).collect()
    assert len(out) == 1 and out[0]["height"] == 8 and out[0]["width"] == 8
    with _pytest.raises(Exception):
        multimodal.image_features(df, decode_strict=True).collect()


def _stdlib_python_webp():
    """CPython's own test fixture python.webp — a REAL-WORLD lossy
    VP8X (VP8 + ALPH) file shipped with the stdlib test suite."""
    import sysconfig

    p = os.path.join(
        sysconfig.get_paths()["stdlib"], "test", "test_email", "data", "python.webp"
    )
    return open(p, "rb").read() if os.path.exists(p) else None


def test_lossy_webp_decodes_for_real_via_system_libwebp():
    """Lossy VP8 ground truth: encode a known RGB image through the
    system libwebp (ctypes), decode it back through decode_webp — the
    pixels must match the source within lossy-quantization tolerance,
    and the real-world stdlib python.webp (VP8X + ALPH + VP8) must
    decode to its documented 16x16 RGBA.  The from-scratch VP8 decoder
    is documented out of reach in-sandbox (RFC 6386's constant
    probability tables); the ctypes binding is the honest scale path."""
    import numpy as np
    import pytest as _pytest

    from bigdatamigratecloud_spark.operators.webp import (
        decode_webp,
        encode_webp_lossy_system,
    )

    rng = np.random.RandomState(5)
    # smooth gradient + mild noise: lossy-friendly content
    y, x = np.mgrid[0:32, 0:48]
    img = np.stack(
        [(y * 5) % 256, (x * 3) % 256, ((x + y) * 2) % 256], axis=2
    ).astype(np.uint8)
    img = np.clip(img.astype(int) + rng.randint(-4, 5, img.shape), 0, 255).astype(
        np.uint8
    )
    wbp = encode_webp_lossy_system(img, quality=90.0)
    if wbp is None:
        _pytest.skip("system libwebp unavailable")
    assert wbp[:4] == b"RIFF" and wbp[12:16] in (b"VP8 ", b"VP8X")
    got = decode_webp(wbp)
    assert got.shape == (32, 48, 4)
    assert (got[:, :, 3] == 255).all()
    err = np.abs(got[:, :, :3].astype(int) - img.astype(int))
    assert err.mean() < 8.0 and err.max() < 64  # lossy, but the image

    real = _stdlib_python_webp()
    if real is not None:
        arr = decode_webp(real)
        assert arr.shape == (16, 16, 4)
        assert arr[:, :, 3].min() < 255  # the ALPH chunk really applied


def test_lossy_webp_through_image_features_strict(spark):
    """The Spark path end-to-end: image_features in STRICT mode over
    real lossy-WebP bytes must REALLY decode (no fake, no error) now
    that the system-libwebp path exists."""
    import numpy as np
    import pytest as _pytest

    from bigdatamigratecloud_spark.operators.webp import encode_webp_lossy_system

    img = np.full((12, 20, 3), 128, dtype=np.uint8)
    img[:, :10, 0] = 250
    wbp = encode_webp_lossy_system(img, quality=85.0)
    if wbp is None:
        _pytest.skip("system libwebp unavailable")
    df = spark.createDataFrame([(1, wbp)], "id long, content binary")
    out = multimodal.image_features(df, decode_strict=True).collect()[0]
    assert out["height"] == 12 and out["width"] == 20
    # decode yields RGBA: expected mean includes the opaque alpha plane
    rgba_mean = (float(np.asarray(img).mean()) * 3 + 255.0) / 4
    assert abs(out["mean_pixel"] - rgba_mean) < 8.0


def test_tiff_roundtrip_all_compressions_and_orders():
    """Baseline TIFF codec ground truth: arrays roundtrip bit-exact
    through encode_tiff/decode_tiff for every (compression, byte order,
    channels) combination, with LZW data long enough to cross the
    9->10-bit early-change boundary."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.tiff import decode_tiff, encode_tiff

    rng = np.random.RandomState(9)
    gray = rng.randint(0, 256, (40, 50), dtype=np.uint8)
    rgb = rng.randint(0, 256, (25, 30, 3), dtype=np.uint8)
    rgba = rng.randint(0, 256, (10, 12, 4), dtype=np.uint8)
    flat = np.tile(np.arange(64, dtype=np.uint8), 300).reshape(60, -1)  # runs
    for arr in (gray, rgb, rgba, flat):
        want = arr if arr.ndim == 3 else arr[:, :, None]
        for comp in (1, 5, 32773):
            for bo in ("<", ">"):
                got = decode_tiff(encode_tiff(arr, compression=comp, byte_order=bo))
                assert got.shape == want.shape, (comp, bo, arr.shape)
                assert (got == want).all(), (comp, bo, arr.shape)


def test_tiff_hand_computed_fixtures():
    """Hand-built TIFF bytes (not our encoder): 2x2 gray uncompressed
    little-endian, a PackBits strip with literal+repeat runs, and
    WhiteIsZero inversion."""
    import struct

    import numpy as np

    from bigdatamigratecloud_spark.operators.tiff import (
        _packbits_decode,
        _packbits_encode,
        decode_tiff,
    )

    # PackBits: 0x02 'abc' = literal(3); 0xFE 'z' = repeat z x3
    assert _packbits_decode(b"\x02abc\xfez", 6) == b"abczzz"
    assert _packbits_decode(_packbits_encode(b"aaaabcdddd"), 10) == b"aaaabcdddd"

    def build(photo, px):
        bo = "<"
        out = bytearray(b"II*\x00")
        out += struct.pack("<I", 8 + len(px))
        out += px
        entries = [
            (256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
            (262, 3, 1, photo), (273, 4, 1, 8), (277, 3, 1, 1),
            (278, 3, 1, 2), (279, 4, 1, 4),
        ]
        out += struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            out += struct.pack("<HHI", tag, typ, cnt)
            out += struct.pack("<H", val) + b"\x00\x00" if typ == 3 else struct.pack("<I", val)
        out += struct.pack("<I", 0)
        return bytes(out)

    got = decode_tiff(build(1, bytes([10, 20, 30, 40])))
    assert (got[:, :, 0] == np.array([[10, 20], [30, 40]])).all()
    inv = decode_tiff(build(0, bytes([10, 20, 30, 40])))
    assert (inv[:, :, 0] == np.array([[245, 235], [225, 215]])).all()


def test_tiff_through_image_features_and_strict_gates(spark):
    """TIFF decodes end-to-end through strict image_features; an
    out-of-scope TIFF (16-bit) hits the strict gate but yields the
    deterministic fake when non-strict."""
    import numpy as np
    import pytest as _pytest

    from bigdatamigratecloud_spark.operators.tiff import encode_tiff

    arr = np.full((9, 11, 3), 77, dtype=np.uint8)
    t = encode_tiff(arr, compression=32773)
    df = spark.createDataFrame([(1, t)], "id long, content binary")
    out = multimodal.image_features(df, decode_strict=True).collect()[0]
    assert out["height"] == 9 and out["width"] == 11
    assert abs(out["mean_pixel"] - 77.0) < 1e-9

    bad = bytearray(encode_tiff(arr[:, :, 0]))
    # corrupt BitsPerSample to 32 by patching the IFD entry value
    # (16-bit became a SUPPORTED depth in round 9)
    i = bad.find(bytes.fromhex("0201030001000000080000"))
    assert i > 0
    bad[i + 8] = 32
    bdf = spark.createDataFrame([(1, bytes(bad))], "id long, content binary")
    fake = multimodal.image_features(bdf, decode_strict=False).collect()[0]
    assert fake["height"] == 8 and fake["width"] == 8
    with _pytest.raises(Exception):
        multimodal.image_features(bdf, decode_strict=True).collect()


def test_tiff_cross_validated_against_system_libtiff():
    """External ground truth: my TIFF encoder's output (all three
    compressions) decodes EXACTLY under the system libtiff, and a
    libtiff-written LZW + horizontal-predictor file decodes EXACTLY
    under my decoder — pinning the LZW early-change width switch and
    predictor semantics to the reference implementation, not to
    self-consistency."""
    import ctypes
    import ctypes.util
    import os as _os
    import tempfile

    import numpy as np
    import pytest as _pytest

    from bigdatamigratecloud_spark.operators.tiff import decode_tiff, encode_tiff

    try:
        lt = ctypes.CDLL(ctypes.util.find_library("tiff") or "libtiff.so.6")
    except OSError:
        _pytest.skip("system libtiff unavailable")
    lt.TIFFOpen.restype = ctypes.c_void_p
    lt.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lt.TIFFReadEncodedStrip.restype = ctypes.c_ssize_t
    lt.TIFFReadEncodedStrip.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_ssize_t]
    lt.TIFFWriteEncodedStrip.restype = ctypes.c_ssize_t
    lt.TIFFWriteEncodedStrip.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_ssize_t]
    lt.TIFFNumberOfStrips.restype = ctypes.c_uint32
    lt.TIFFNumberOfStrips.argtypes = [ctypes.c_void_p]
    lt.TIFFClose.argtypes = [ctypes.c_void_p]

    rng = np.random.RandomState(3)
    arr = np.concatenate([
        rng.randint(0, 256, (40, 60, 3)).astype(np.uint8),
        np.tile(np.arange(60, dtype=np.uint8)[None, :, None], (40, 1, 3)),
    ], axis=0)

    for comp in (1, 5, 32773):
        p = tempfile.mktemp(suffix=".tif")
        open(p, "wb").write(encode_tiff(arr, compression=comp))
        t = lt.TIFFOpen(p.encode(), b"r")
        assert t, f"libtiff cannot open comp={comp}"
        out = bytearray()
        # loop strips: libtiff strip-chops large uncompressed strips
        for s in range(lt.TIFFNumberOfStrips(t)):
            buf = ctypes.create_string_buffer(arr.size)
            n = lt.TIFFReadEncodedStrip(t, s, buf, arr.size)
            assert n > 0
            out += buf.raw[:n]
        lt.TIFFClose(t)
        _os.unlink(p)
        got = np.frombuffer(bytes(out[: arr.size]), dtype=np.uint8).reshape(arr.shape)
        assert (got == arr).all(), f"comp={comp} mismatch under libtiff"

    p = tempfile.mktemp(suffix=".tif")
    t = lt.TIFFOpen(p.encode(), b"w")
    h, w = arr.shape[:2]
    for tag, val in ((256, ctypes.c_uint32(w)), (257, ctypes.c_uint32(h)),
                     (258, ctypes.c_uint16(8)), (277, ctypes.c_uint16(3)),
                     (259, ctypes.c_uint16(5)), (262, ctypes.c_uint16(2)),
                     (284, ctypes.c_uint16(1)), (278, ctypes.c_uint32(h)),
                     (317, ctypes.c_uint16(2))):
        lt.TIFFSetField(ctypes.c_void_p(t), ctypes.c_uint32(tag), val)
    body = arr.tobytes()
    assert lt.TIFFWriteEncodedStrip(t, 0, body, len(body)) == len(body)
    lt.TIFFClose(t)
    mine = decode_tiff(open(p, "rb").read())
    _os.unlink(p)
    assert (mine == arr).all(), "my decoder mismatch vs libtiff LZW+predictor"


def test_tiff_multi_strip_from_libtiff():
    """Multi-strip decode (RowsPerStrip < height, incl. a short last
    strip): a libtiff-written 50x30 PackBits file with rps=16 must
    decode exactly — my encoder always writes one strip, so this is
    the only coverage of the per-strip expected-length logic against
    an external writer."""
    import ctypes
    import ctypes.util
    import os as _os
    import tempfile

    import numpy as np
    import pytest as _pytest

    from bigdatamigratecloud_spark.operators.tiff import decode_tiff

    try:
        lt = ctypes.CDLL(ctypes.util.find_library("tiff") or "libtiff.so.6")
    except OSError:
        _pytest.skip("system libtiff unavailable")
    lt.TIFFOpen.restype = ctypes.c_void_p
    lt.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lt.TIFFWriteEncodedStrip.restype = ctypes.c_ssize_t
    lt.TIFFWriteEncodedStrip.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_ssize_t]
    lt.TIFFClose.argtypes = [ctypes.c_void_p]

    rng = np.random.RandomState(11)
    arr = rng.randint(0, 256, (50, 30, 3)).astype(np.uint8)
    rps = 16
    p = tempfile.mktemp(suffix=".tif")
    t = lt.TIFFOpen(p.encode(), b"w")
    h, w = arr.shape[:2]
    for tag, val in ((256, ctypes.c_uint32(w)), (257, ctypes.c_uint32(h)),
                     (258, ctypes.c_uint16(8)), (277, ctypes.c_uint16(3)),
                     (259, ctypes.c_uint16(32773)), (262, ctypes.c_uint16(2)),
                     (284, ctypes.c_uint16(1)), (278, ctypes.c_uint32(rps))):
        lt.TIFFSetField(ctypes.c_void_p(t), ctypes.c_uint32(tag), val)
    for s in range((h + rps - 1) // rps):
        body = arr[s * rps : min((s + 1) * rps, h)].tobytes()
        assert lt.TIFFWriteEncodedStrip(t, s, body, len(body)) == len(body)
    lt.TIFFClose(t)
    mine = decode_tiff(open(p, "rb").read())
    _os.unlink(p)
    assert (mine == arr).all()


def test_dhash_identical_and_perturbed_images(spark):
    """dhash64/dhash_neardup (round 8): identical images collide at
    hamming 0; a one-sampled-pixel perturbation lands within the
    near-dup radius; a structurally different image does not pair;
    NULL payloads hash to NULL, unknown codecs hash the stable fake; bad radius
    raises."""
    import numpy as np
    import pytest as _p

    from bigdatamigratecloud_spark.operators.multimodal import (
        dhash64,
        dhash_neardup,
        encode_gif,
    )

    palette = [(g, g, g) for g in range(256)]
    g1 = np.array([[(5 * x + 3 * y) % 256 for y in range(16)] for x in range(16)],
                  dtype=np.uint8)
    g2 = g1.copy(); g2[0][0] = (int(g2[0][0]) + 80) % 256
    g3 = np.array([[(251 * x * y + 17 * x) % 256 for y in range(16)]
                   for x in range(16)], dtype=np.uint8)
    rows = [
        (1, bytearray(encode_gif(g1, palette))),
        (2, bytearray(encode_gif(g1, palette))),   # identical
        (3, bytearray(encode_gif(g2, palette))),   # near-dup of 1
        (4, bytearray(encode_gif(g3, palette))),   # different
        (5, bytearray(b"not an image")),  # unknown codec -> deterministic fake
        (6, None),                         # NULL payload -> NULL hash
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    hashes = dhash64(df, "payload", "media_id")
    hx = {r["media_id"]: r["dhash_hex"] for r in hashes.collect()}
    assert hx[1] == hx[2] and len(hx[1]) == 16
    assert hx[5] is not None and len(hx[5]) == 16  # stable fake, hashable
    assert hx[6] is None
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_neardup(hashes, max_hamming=4).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and 1 <= pairs[(1, 3)] <= 4
    assert not any(4 in p or 5 in p or 6 in p for p in pairs)
    with _p.raises(ValueError):
        dhash_neardup(hashes, max_hamming=8)


def test_audio_fingerprint_envelope_semantics(spark):
    """audio_fingerprint (round 8): identical clips collide; a small
    single-frame perturbation stays within the near-dup radius; a
    different envelope does not pair; short/NULL payloads -> NULL."""
    import io
    import struct
    import wave

    from bigdatamigratecloud_spark.operators.multimodal import (
        audio_fingerprint,
        dhash_neardup,
    )

    def wav(samples):
        bio = io.BytesIO()
        with wave.open(bio, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        return bytearray(bio.getvalue())

    s1 = [((i * 31 + (i * i) % 900) % 3000) - 1500 for i in range(2080)]
    s2 = list(s1); s2[5] += 400                      # one frame nudged
    s3 = [((i * 997) % 3000) - 1500 for i in range(2080)]
    rows = [
        (1, wav(s1)), (2, wav(s1)), (3, wav(s2)), (4, wav(s3)),
        (5, wav([100] * 10)),  # < 65 samples -> NULL
        (6, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    h = audio_fingerprint(df, "payload", "media_id")
    hx = {r["media_id"]: r["afp_hex"] for r in h.collect()}
    assert hx[1] == hx[2] and len(hx[1]) == 16
    assert hx[5] is None and hx[6] is None
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_neardup(h, hash_col="afp_hex", max_hamming=4).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 4
    assert not any(4 in p or 5 in p or 6 in p for p in pairs)


def test_animated_gif_full_composition(spark):
    """Round 9: encode_gif_animation -> gif_frames composes offsets,
    GCE transparency, and disposal methods 1/2/3 exactly; the
    single-frame encoder is unchanged by the LZW refactor; the Spark
    fan-out emits one row per composed frame and fails closed."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.multimodal import (
        _decode_gif,
        encode_gif,
        encode_gif_animation,
        gif_frame_fanout,
        gif_frames,
    )

    pal = [(0, 0, 0), (10, 20, 30), (100, 110, 120), (200, 210, 220)]
    P = np.array(pal, dtype=np.uint8)
    f0 = [[(r + c) % 4 for c in range(8)] for r in range(8)]
    f1 = [[(r * c) % 4 for c in range(4)] for r in range(4)]
    f2 = [[(2 * r + c) % 4 for c in range(8)] for r in range(8)]
    g = encode_gif_animation(
        [f0, f1, f2], pal, offsets=[(0, 0), (2, 2), (0, 0)],
        disposals=[1, 2, 1], transparent_idx=0, background_idx=3,
    )
    fr = gif_frames(g)
    assert len(fr) == 3 and fr[0].shape == (8, 8, 3)
    exp0 = np.broadcast_to(P[3], (8, 8, 3)).copy()  # bg idx 3
    m0 = np.array(f0) != 0
    exp0[m0] = P[np.array(f0)[m0]]
    assert (fr[0] == exp0).all()
    exp1 = exp0.copy()
    sub = np.array(f1)
    exp1[2:6, 2:6][sub != 0] = P[sub[sub != 0]]
    assert (fr[1] == exp1).all()
    exp2 = exp1.copy()
    exp2[2:6, 2:6] = P[3]  # disposal 2 restored region to bg
    m2 = np.array(f2) != 0
    exp2[m2] = P[np.array(f2)[m2]]
    assert (fr[2] == exp2).all()

    # disposal 3: the frame AFTER a restore-to-previous composes on the
    # PRE-overlay canvas (use a small final patch so the restore shows)
    patch = [[3, 3], [3, 3]]
    g3 = encode_gif_animation(
        [f0, f1, patch], pal, offsets=[(0, 0), (2, 2), (0, 0)], disposals=[1, 3, 1]
    )
    fr3 = gif_frames(g3)
    base = P[np.array(f0)].copy()  # frame0, no transparency this time
    mid = base.copy()
    mid[2:6, 2:6] = P[sub]
    assert (fr3[1] == mid).all()
    exp_last = base.copy()  # frame1's overlay restored away
    exp_last[0:2, 0:2] = P[3]
    assert (fr3[2] == exp_last).all()

    # single-frame encoder unchanged by the LZW refactor
    idx = np.array(f0, dtype=np.uint8)
    assert (_decode_gif(encode_gif(idx.tolist(), pal)) == P[idx]).all()
    assert (
        _decode_gif(encode_gif(idx.tolist(), pal, interlace=True)) == P[idx]
    ).all()

    # Spark fan-out: 3 rows for the animation, 0 for garbage, NULL skipped
    df = spark.createDataFrame(
        [(1, g), (2, b"not a gif"), (3, None)], "media_id long, content binary"
    )
    rows = gif_frame_fanout(df, id_col="media_id").collect()
    assert sorted((r.id, r.frame_index) for r in rows) == [(1, 0), (1, 1), (1, 2)]
    got0 = next(r for r in rows if r.frame_index == 0)
    assert got0.width == 8 and got0.height == 8
    assert np.frombuffer(bytes(got0.frame_rgb), dtype=np.uint8).reshape(8, 8, 3).tolist() == exp0.tolist()


def test_gif_frames_fails_closed_on_corrupt():
    import numpy as np

    from bigdatamigratecloud_spark.operators.multimodal import (
        encode_gif_animation,
        gif_frames,
    )

    pal = [(0, 0, 0), (10, 20, 30)]
    g = encode_gif_animation(
        [[[0, 1], [1, 0]], [[1, 1], [0, 0]]], pal, delays_cs=[5, 5]
    )
    rng = np.random.default_rng(2)
    for _ in range(400):
        mode = rng.choice(["truncate", "flip"])
        if mode == "truncate":
            c = g[: max(2, int(rng.integers(0, len(g))))]
        else:
            b = bytearray(g)
            b[int(rng.integers(0, len(g)))] ^= max(1, int(rng.integers(0, 256)))
            c = bytes(b)
        out = gif_frames(c)
        assert out is None or isinstance(out, list)


def test_tiff_16bit_and_tiled_roundtrip_matrix():
    """Round 9: 16-bit samples and tiled organization roundtrip through
    encode_tiff/decode_tiff for every (compression, byte order), with
    edge-padded tiles cropped correctly."""
    import numpy as np

    from bigdatamigratecloud_spark.operators.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(4)
    for bo in ("<", ">"):
        for comp in (1, 5, 32773):
            a16 = rng.integers(0, 65536, size=(9, 11, 3)).astype(np.uint16)
            got = decode_tiff(encode_tiff(a16, compression=comp, byte_order=bo))
            assert got.dtype == np.uint16 and (got == a16).all(), (bo, comp)
            big = rng.integers(0, 65536, size=(20, 35)).astype(np.uint16)
            gt = decode_tiff(
                encode_tiff(big, compression=comp, byte_order=bo, tile=(16, 16))
            )
            assert (gt == big[:, :, None]).all(), ("tile16", bo, comp)
            b8 = rng.integers(0, 256, size=(18, 33, 3)).astype(np.uint8)
            g8 = decode_tiff(
                encode_tiff(b8, compression=comp, byte_order=bo, tile=(16, 16))
            )
            assert (g8 == b8).all(), ("tile8", bo, comp)
    # non-multiple-of-16 tile dims are a spec violation: loud
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(np.zeros((4, 4), np.uint8), tile=(10, 16))


def test_tiff_16bit_tiled_under_system_libtiff():
    """External ground truth for the round-9 extensions: a 16-bit TILED
    LZW file written by my encoder decodes EXACTLY under the system
    libtiff (TIFFReadEncodedTile)."""
    import ctypes
    import ctypes.util
    import os as _os
    import tempfile

    import numpy as np
    import pytest as _pytest

    from bigdatamigratecloud_spark.operators.tiff import encode_tiff

    try:
        lt = ctypes.CDLL(ctypes.util.find_library("tiff") or "libtiff.so.6")
    except OSError:
        _pytest.skip("system libtiff unavailable")
    lt.TIFFOpen.restype = ctypes.c_void_p
    lt.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lt.TIFFReadEncodedTile.restype = ctypes.c_ssize_t
    lt.TIFFReadEncodedTile.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_ssize_t]
    lt.TIFFNumberOfTiles.restype = ctypes.c_uint32
    lt.TIFFNumberOfTiles.argtypes = [ctypes.c_void_p]
    lt.TIFFTileSize.restype = ctypes.c_ssize_t
    lt.TIFFTileSize.argtypes = [ctypes.c_void_p]
    lt.TIFFClose.argtypes = [ctypes.c_void_p]

    rng = np.random.default_rng(8)
    arr = rng.integers(0, 65536, size=(20, 35)).astype(np.uint16)
    payload = encode_tiff(arr, compression=5, tile=(16, 16))
    with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as fh:
        fh.write(payload)
        path = fh.name
    try:
        t = lt.TIFFOpen(path.encode(), b"r")
        assert t, "libtiff cannot open my 16-bit tiled LZW file"
        n = lt.TIFFNumberOfTiles(t)
        assert n == 6  # ceil(35/16) x ceil(20/16)
        tsz = lt.TIFFTileSize(t)
        assert tsz == 16 * 16 * 2
        tiles = []
        for i in range(n):
            buf = ctypes.create_string_buffer(tsz)
            got = lt.TIFFReadEncodedTile(t, i, buf, tsz)
            assert got == tsz, f"tile {i} short read"
            tiles.append(np.frombuffer(buf.raw, dtype="<u2").reshape(16, 16))
        lt.TIFFClose(t)
        full = np.zeros((32, 48), dtype=np.uint16)
        for ty in range(2):
            for tx in range(3):
                full[ty * 16 : (ty + 1) * 16, tx * 16 : (tx + 1) * 16] = tiles[
                    ty * 3 + tx
                ]
        assert (full[:20, :35] == arr).all(), "libtiff readback mismatch"
    finally:
        _os.unlink(path)


# ---------------------------------------------------------------- resize

def _gray_gif_df(spark, grids):
    import numpy as np

    from bigdatamigratecloud_spark.operators.multimodal import encode_gif

    palette = [(g, g, g) for g in range(256)]
    rows = [
        (i, bytearray(encode_gif(np.array(g, dtype=np.uint8), palette)))
        for i, g in enumerate(grids)
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_image_resize_box_uneven_blocks_floor_mean(spark):
    from bigdatamigratecloud_spark.operators.multimodal import image_resize_pixels

    # 5x5 image -> 2x2 box: row blocks [0,2) and [2,5), same for cols;
    # values v(r,c) = 10*r + c make every block mean hand-checkable
    grid = [[10 * r + c for c in range(5)] for r in range(5)]
    df = _gray_gif_df(spark, [grid])
    got = {
        (r["y"], r["x"]): r["v"]
        for r in image_resize_pixels(df, 2, 2, "box").collect()
    }

    def mean(r0, r1, c0, c1):
        vals = [10 * r + c for r in range(r0, r1) for c in range(c0, c1)]
        return sum(vals) // len(vals)

    assert got == {
        (0, 0): mean(0, 2, 0, 2),
        (0, 1): mean(0, 2, 2, 5),
        (1, 0): mean(2, 5, 0, 2),
        (1, 1): mean(2, 5, 2, 5),
    }


def test_image_resize_nearest_picks_floor_index(spark):
    from bigdatamigratecloud_spark.operators.multimodal import image_resize_pixels

    grid = [[10 * r + c for c in range(4)] for r in range(4)]
    df = _gray_gif_df(spark, [grid])
    got = {
        (r["y"], r["x"]): r["v"]
        for r in image_resize_pixels(df, 2, 2, "nearest").collect()
    }
    # (y*4)//2 = 0, 2 -> picks rows/cols 0 and 2
    assert got == {(0, 0): 0, (0, 1): 2, (1, 0): 20, (1, 1): 22}


def test_image_resize_null_skipped_and_guards(spark):
    from bigdatamigratecloud_spark.operators.multimodal import image_resize_pixels

    df = spark.createDataFrame([(1, None)], "media_id long, payload binary")
    assert image_resize_pixels(df, 2, 2, "box").count() == 0
    with pytest.raises(ValueError):
        image_resize_pixels(df, 2, 2, "cubic")
    with pytest.raises(ValueError):
        image_resize_pixels(df, 0, 2, "box")
    # upscale must fail loudly inside the task
    grid = [[0, 1], [2, 3]]
    up = _gray_gif_df(spark, [grid])
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception):
        image_resize_pixels(up, 4, 4, "box").collect()


# ---------------------------------------------------------------- resample

def _wav_df(spark, clips):
    import io
    import struct
    import wave

    rows = []
    for i, s in enumerate(clips):
        bio = io.BytesIO()
        with wave.open(bio, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(struct.pack(f"<{len(s)}h", *s))
        rows.append((i, bytearray(bio.getvalue())))
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_audio_resample_mean_and_decimate(spark):
    from bigdatamigratecloud_spark.operators.multimodal import audio_resample_samples

    df = _wav_df(spark, [list(range(10))])
    mean = {
        r["i"]: r["v"] for r in audio_resample_samples(df, 3, "mean").collect()
    }
    assert mean == {0: 1, 1: 4, 2: 7}  # tail sample 9 dropped
    dec = {
        r["i"]: r["v"] for r in audio_resample_samples(df, 3, "decimate").collect()
    }
    assert dec == {0: 0, 1: 3, 2: 6}


def test_audio_resample_truncates_negative_means_like_sql(spark):
    from bigdatamigratecloud_spark.operators.multimodal import audio_resample_samples

    # sum -3 over factor 2: SQL div truncates to -1 (Python floor gives -2)
    df = _wav_df(spark, [[-1, -2]])
    got = audio_resample_samples(df, 2, "mean").collect()
    assert len(got) == 1 and got[0]["v"] == -1


def test_audio_resample_guards_and_null(spark):
    from bigdatamigratecloud_spark.operators.multimodal import audio_resample_samples

    df = spark.createDataFrame([(1, None)], "media_id long, payload binary")
    assert audio_resample_samples(df, 4, "mean").count() == 0
    with pytest.raises(ValueError):
        audio_resample_samples(df, 0, "mean")
    with pytest.raises(ValueError):
        audio_resample_samples(df, 4, "linear")
