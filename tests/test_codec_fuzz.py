"""Corrupt-input fuzz pass over the codec matrix (round-9 item #6,
generalizing the round-8 corrupt-TIFF fix): every decoder, fed a
TRUNCATED or BIT-FLIPPED payload that still carries a valid magic,
must return None (not mine / unreadable), a decoded result, or raise
NotImplementedError (recognized-but-unsupported feature) — never
struct.error / IndexError / KeyError / zlib.error / UnicodeDecodeError,
which would kill a whole Spark task over one bad file.

The task-level gates are pinned hardest: ``_decode_image(strict=False)``
/ ``_decode_audio(strict=False)`` must NEVER raise (they are what runs
inside image_features/audio_features over a 100 TB crawl), and
strict=True may raise NotImplementedError only."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdatamigratecloud_spark.operators import multimodal as mm
from bigdatamigratecloud_spark.operators.jpeg import decode_jpeg, encode_jpeg
from bigdatamigratecloud_spark.operators.tiff import decode_tiff, encode_tiff
from bigdatamigratecloud_spark.operators.webp import decode_webp, encode_webp_lossless

from test_media_multimodal import _make_bmp, _make_png, _make_wav


def _payloads() -> dict[str, bytes]:
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(8, 9), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(8, 8), dtype=np.uint8)
    pal = [(i * 60 % 256, i * 30 % 256, i * 90 % 256) for i in range(4)]
    samples = (np.sin(np.arange(256) / 7) * 12000).astype(np.int16)
    return {
        "bmp": _make_bmp(4, 3, [[(r * 10, c * 20, 5) for c in range(4)] for r in range(3)]),
        "png": _make_png(img, 2),
        "gif": mm.encode_gif(idx.tolist(), pal),
        "jpeg": encode_jpeg(img),
        "tiff": encode_tiff(gray[:, :, None]),
        "tiff16t": encode_tiff(
            (gray.astype("uint16") * 257), compression=5, tile=(16, 16)
        ),
        "webp": encode_webp_lossless(img),
        "wav": _make_wav(samples.tolist()),
    }


PAYLOADS = _payloads()

_DECODERS = {
    "bmp": mm._decode_bmp,
    "png": mm._decode_png,
    "gif": mm._decode_gif,
    "jpeg": decode_jpeg,
    "tiff": decode_tiff,
    "tiff16t": decode_tiff,
    "webp": decode_webp,
    "wav": mm._decode_wav,
}


def _corrupt(payload: bytes, mode: str, pos: int, val: int) -> bytes:
    if mode == "truncate":
        return payload[: max(2, pos)]
    b = bytearray(payload)
    b[pos % len(b)] ^= max(1, val)  # guaranteed to change the byte
    return bytes(b)


def _assert_contract(name, fn, payload):
    try:
        out = fn(payload)
    except NotImplementedError:
        return
    assert out is None or isinstance(out, (np.ndarray, tuple)), (name, type(out))


@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    name=st.sampled_from(sorted(_DECODERS)),
    mode=st.sampled_from(["truncate", "flip"]),
    pos=st.integers(min_value=0, max_value=4095),
    val=st.integers(min_value=0, max_value=255),
)
def test_codec_decoders_fail_closed(name, mode, pos, val):
    payload = PAYLOADS[name]
    _assert_contract(name, _DECODERS[name], _corrupt(payload, mode, pos % len(payload), val))


@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    name=st.sampled_from(sorted(PAYLOADS)),
    mode=st.sampled_from(["truncate", "flip"]),
    pos=st.integers(min_value=0, max_value=4095),
    val=st.integers(min_value=0, max_value=255),
)
def test_image_audio_task_gate_never_raises(name, mode, pos, val):
    """What actually runs inside a Spark task: non-strict decode must
    ALWAYS produce something; strict may raise NotImplementedError only."""
    payload = _corrupt(PAYLOADS[name], mode, pos % len(PAYLOADS[name]), val)
    img = mm._decode_image(payload, strict=False)
    assert isinstance(img, np.ndarray)
    aud = mm._decode_audio(payload, strict=False)
    assert isinstance(aud, tuple) and isinstance(aud[0], np.ndarray)
    for gate in (mm._decode_image, mm._decode_audio):
        try:
            gate(payload, True)
        except NotImplementedError:
            pass


def test_audio_companded_and_adpcm_fail_closed():
    """The two non-PCM WAV decoders see the same fuzz (their chunk walk
    differs from _decode_wav)."""
    rng = np.random.default_rng(9)
    payload = PAYLOADS["wav"]
    for fn in (mm._decode_wav_companded, mm._decode_wav_ima_adpcm):
        for _ in range(200):
            mode = rng.choice(["truncate", "flip"])
            pos = int(rng.integers(0, len(payload)))
            val = int(rng.integers(0, 256))
            _assert_contract(fn.__name__, fn, _corrupt(payload, mode, pos, val))


def test_decompression_bombs_fail_closed_fast():
    """Round 9: a tiny payload claiming enormous output must cost a
    skipped row, never a giant allocation — pixel caps on every header
    path, bounded inflate for PNG, bounded LZW for GIF."""
    import struct
    import time
    import zlib

    from bigdatamigratecloud_spark.operators.limits import MAX_DECODE_PIXELS

    t0 = time.monotonic()

    # PNG claiming 50000x50000 in a 100-byte file
    def chunk(tag, body):
        c = struct.pack(">I", len(body)) + tag + body
        return c + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", 50000, 50000, 8, 0, 0, 0, 0)
    huge_png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + chunk(b"IEND", b"")
    )
    assert mm._decode_png(huge_png) is None

    # PNG zip bomb: legal tiny dims, IDAT inflating far past the bound
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 10_000_000))
        + chunk(b"IEND", b"")
    )
    assert mm._decode_png(bomb) is None

    # GIF logical screen / frame claiming 60000x60000
    huge_gif = bytearray(PAYLOADS["gif"])
    huge_gif[6:10] = struct.pack("<HH", 60000, 60000)
    assert mm.gif_frames(bytes(huge_gif)) is None
    # LZW output cap: decode stops at max_out instead of amplifying
    idx = np.arange(10000, dtype=np.uint8).reshape(100, 100) % 4
    g = mm.encode_gif(idx.tolist(), [(0, 0, 0), (1, 1, 1), (2, 2, 2), (3, 3, 3)])
    data = bytearray()
    pos = 13 + 3 * 4  # header + gct
    pos += 10 + 1  # image descriptor + min code size
    while g[pos] != 0:
        ln = g[pos]
        data += g[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    out = mm._gif_lzw(bytes(data), 2, max_out=50)
    assert out is not None and 50 <= len(out) < 50 + 4096

    # TIFF IFD claiming 60000x60000
    from bigdatamigratecloud_spark.operators.tiff import decode_tiff, encode_tiff

    t = bytearray(encode_tiff(np.zeros((2, 2), np.uint8)))
    ifd = struct.unpack("<I", t[4:8])[0]
    n = struct.unpack("<H", t[ifd : ifd + 2])[0]
    for i in range(n):
        e = ifd + 2 + 12 * i
        tag = struct.unpack("<H", t[e : e + 2])[0]
        if tag in (256, 257):
            t[e + 8 : e + 10] = struct.pack("<H", 60000)
    assert decode_tiff(bytes(t)) is None

    # JPEG SOF claiming 60000x60000
    j = bytearray(PAYLOADS["jpeg"])
    i = j.find(b"\xff\xc0")
    assert i > 0
    j[i + 5 : i + 9] = struct.pack(">HH", 60000, 60000)
    assert decode_jpeg(bytes(j)) is None

    # VP8L 5-byte header claiming 16384x16384 (268M pixels)
    from bigdatamigratecloud_spark.operators.webp import decode_webp

    bits = 0
    bits |= 16383  # w-1, 14 bits
    bits |= 16383 << 14  # h-1
    payload = bytes([0x2F]) + struct.pack("<I", bits)[:4]
    vp8l = b"RIFF" + struct.pack("<I", 12 + len(payload)) + b"WEBP" + b"VP8L"
    vp8l += struct.pack("<I", len(payload)) + payload
    assert 16384 * 16384 > MAX_DECODE_PIXELS
    assert decode_webp(vp8l) is None

    # the whole battery must be CHEAP - no giant allocation happened
    assert time.monotonic() - t0 < 10.0
