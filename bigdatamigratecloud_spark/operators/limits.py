"""Shared decode resource bounds (round 9): a crawled file is
UNTRUSTED input, and every image format can claim enormous dimensions
in a tiny header (a 100-byte GIF/PNG/TIFF/VP8L can declare 4G pixels
-> a multi-GB allocation before one byte of pixel data is read) — the
decompression-bomb shape of the codec world.  One bad file must cost a
skipped row, never an executor OOM.

``MAX_DECODE_PIXELS`` bounds the per-image allocation every from-
scratch decoder makes (default 64M pixels ≈ 256 MB RGBA — far above
any legitimate crawl image, far below task memory).  Decoders treat a
claim beyond the cap as undecodable data (return None), same as any
other malformed payload; raise the cap for trusted scientific-imagery
pipelines."""

from __future__ import annotations

MAX_DECODE_PIXELS = 64 * 1024 * 1024


def pixels_ok(w: int, h: int) -> bool:
    """True when an image claiming (w, h) may be allocated."""
    return 0 < w and 0 < h and w * h <= MAX_DECODE_PIXELS
