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
