"""Multimodal columns (north-star N3, generalizing the reference's
Media/MediaSet handling, Codeunit 60000:1144-1270): image/audio/video as
opaque `binary` columns with typed metadata, processed through
Arrow-batched mapInPandas kernels.

The Spark-side plumbing — schemas, partition sizing, UDF signatures,
batch shapes — is real and tested.  Decoding is tiered:

- REAL, dependency-free: uncompressed 24-bit BMP (struct+numpy); PNG
  at every legal bit depth 1-16 (stdlib ``zlib`` + numpy, all five
  scanline filters, Adam7 interlace, gray/RGB/palette/alpha);
  baseline AND progressive JPEG (full SOF0/SOF2 Huffman decoder in
  ``operators/jpeg.py`` — any sampling factors, restart intervals,
  stream-supplied tables, spectral selection + successive
  approximation); and WAV audio (PCM-16 via stdlib ``wave``, G.711
  A-law/µ-law, IMA ADPCM — each sample-exact vs a stdlib reference)
  — all decode genuinely, exercised in tests;
- real library if importable (PIL / soundfile, import-try gate) for
  the remaining formats (WebP/FLAC/...), absent in
  this container;
- else a clearly-marked DETERMINISTIC FAKE derives pixel/sample arrays
  from the byte content (so distributed plumbing, shapes, and downstream
  math are exercised honestly), and `decode_strict=True` raises
  NotImplementedError instead, documenting the gap.

Partitioning guidance for 100 TB of media: keep rows ≲ 100 MB (Spark's
2 GB column-value limit is the hard wall), size
`spark.sql.files.maxPartitionBytes` so a partition holds a handful of
blobs, and carry metadata in columns (not inside the blob) so pruning
works without touching bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import DEFAULT_MAX_BUCKET, guarded_band_self_join
from .limits import pixels_ok

IMAGE_SCHEMA = (
    "id long, width int, height int, channels int, mean_pixel double, payload_size long"
)
AUDIO_SCHEMA = "id long, n_samples int, sample_rate int, rms double, payload_size long"
THUMB_SCHEMA = "id long, thumb_w int, thumb_h int, thumb_bytes binary"
FRAME_SCHEMA = "id long, frame_index int, frame_bytes binary"


def _decode_bmp(payload: bytes):
    """REAL decode of uncompressed 24-bit BMP — pure struct+numpy, no
    external codec library.  Returns an (h, w, 3) RGB uint8 array, or
    None if the payload is not a BMP this decoder handles."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    row_size = (w * 3 + 3) & ~3
    n_rows = abs(h)
    if data_off + row_size * n_rows > len(payload):
        return None
    arr = np.frombuffer(payload, dtype=np.uint8, count=row_size * n_rows, offset=data_off)
    arr = arr.reshape(n_rows, row_size)[:, : w * 3].reshape(n_rows, w, 3)
    if h > 0:  # positive height = bottom-up row order
        arr = arr[::-1]
    return arr[:, :, ::-1].copy()  # BGR -> RGB


def _gif_lzw(data: bytes, min_code_size: int, max_out: int | None = None):
    """Decode a GIF LZW stream (codes packed LSB-first, variable width
    up to 12 bits, clear/EOI handling per GIF89a appendix F).  Returns
    the palette-index bytes, or None on a malformed stream.

    ``max_out`` caps the output (callers pass w*h): GIF LZW amplifies
    up to ~3.6 KB per input byte (4096-entry table, ~4 KB max entry),
    so an unbounded decode of a crafted stream is a decompression
    bomb; with the cap the decode stops the moment the frame's pixels
    are satisfied."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    acc = nbits = 0
    prev = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    return None
                out += table[code]
            else:
                if code < len(table):
                    entry = table[code]
                elif code == len(table):
                    entry = table[prev] + table[prev][:1]
                else:
                    return None
                table.append(table[prev] + entry[:1])
                out += entry
                if len(table) == (1 << width) and width < 12:
                    width += 1
            if max_out is not None and len(out) >= max_out:
                return bytes(out)
            prev = code
    return bytes(out)


# GIF interlace passes: (y_start, y_step)
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_lzw_encode(stream: list[int], m: int) -> bytearray:
    """GIF LZW compress an index stream at min code size ``m`` — the
    shared kernel of :func:`encode_gif` and
    :func:`encode_gif_animation`.  Variable width with the 4096-entry
    cap and emitted clears; the width rule mirrors the decoder (a
    code's emission width is the width BEFORE the entry its consumption
    appends)."""
    clear, eoi = 1 << m, (1 << m) + 1
    codes: list[int] = [clear]
    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1
    buf = b""
    for ix in stream:
        nxt = buf + bytes((ix,))
        if nxt in table:
            buf = nxt
            continue
        codes.append(table[buf])
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
        else:
            codes.append(clear)
            table = {bytes((i,)): i for i in range(clear)}
            next_code = eoi + 1
        buf = bytes((ix,))
    if buf:
        codes.append(table[buf])
    codes.append(eoi)

    width, table_len, prev_seen = m + 1, eoi + 1, False
    acc = nbits = 0
    packed = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            packed.append(acc & 0xFF)
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
        packed.append(acc & 0xFF)
    return packed


def encode_gif(indices, palette, interlace: bool = False) -> bytes:
    """Encode an (h, w) palette-index array as a single-frame GIF89a —
    REAL LZW compression (variable width, 4096-entry cap with emitted
    clears), the inverse of :func:`_decode_gif` and the same from-
    scratch-stdlib policy as the PNG/JPEG/WAV codecs.  ``palette`` is a
    sequence of (r, g, b); indices must be < len(palette)."""
    import struct

    import numpy as np

    grid = np.asarray(indices, dtype=np.uint8)
    if grid.ndim != 2:
        raise ValueError("encode_gif expects an (h, w) index array")
    h, w = grid.shape
    if not palette or len(palette) > 256:
        raise ValueError("palette must hold 1..256 colors")
    if int(grid.max(initial=0)) >= len(palette):
        raise ValueError("index outside palette")
    p = 0
    while (2 << p) < len(palette):
        p += 1
    m = max(2, p + 1)  # LZW min code size >= 2 per spec
    if interlace:
        rows = [grid[y] for y0, step in _GIF_INTERLACE for y in range(y0, h, step)]
        stream = np.concatenate(rows).tolist() if rows else []
    else:
        stream = grid.reshape(-1).tolist()

    packed = _gif_lzw_encode(stream, m)

    gct = bytearray()
    for i in range(2 << p):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        gct += bytes((r, g, b))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h) + bytes((0x80 | p, 0, 0)) + gct
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes((0x40 if interlace else 0x00,)) + bytes((m,))
    i = 0
    while i < len(packed):
        chunk = packed[i : i + 255]
        out += bytes((len(chunk),)) + chunk
        i += 255
    out += b"\x00\x3b"
    return bytes(out)


def encode_gif_animation(
    frames,
    palette,
    offsets=None,
    delays_cs=None,
    disposals=None,
    transparent_idx: int | None = None,
    background_idx: int = 0,
    loop: int = 0,
) -> bytes:
    """Encode an ANIMATED GIF89a (round 9 — the animation gap the
    single-frame encoder documented): ``frames`` is a list of (h, w)
    index arrays, each placed at ``offsets[i]`` = (left, top) on the
    logical screen (the bounding box of all frames), with a Graphic
    Control Extension per frame carrying delay (centiseconds),
    disposal method (0-3) and optional transparency index, plus the
    NETSCAPE looping extension.  Shares the real LZW kernel with
    :func:`encode_gif`."""
    import struct

    import numpy as np

    grids = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not grids or any(g.ndim != 2 for g in grids):
        raise ValueError("encode_gif_animation expects a list of (h, w) index arrays")
    if not palette or len(palette) > 256:
        raise ValueError("palette must hold 1..256 colors")
    offsets = offsets or [(0, 0)] * len(grids)
    delays_cs = delays_cs or [10] * len(grids)
    disposals = disposals or [1] * len(grids)
    if not (len(offsets) == len(delays_cs) == len(disposals) == len(grids)):
        raise ValueError("frames/offsets/delays/disposals length mismatch")
    W = max(ox + g.shape[1] for g, (ox, oy) in zip(grids, offsets))
    H = max(oy + g.shape[0] for g, (ox, oy) in zip(grids, offsets))
    hi = max(int(g.max(initial=0)) for g in grids)
    if hi >= len(palette):
        raise ValueError("index outside palette")
    p = 0
    while (2 << p) < len(palette):
        p += 1
    m = max(2, p + 1)
    gct = bytearray()
    for i in range(2 << p):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        gct += bytes((r, g, b))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", W, H) + bytes((0x80 | p, background_idx & 0xFF, 0)) + gct
    # NETSCAPE2.0 looping extension (loop=0 -> forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    for g, (ox, oy), delay, disp in zip(grids, offsets, delays_cs, disposals):
        flags = (int(disp) & 7) << 2
        tidx = 0
        if transparent_idx is not None:
            flags |= 1
            tidx = int(transparent_idx)
        out += b"\x21\xf9\x04" + bytes((flags,)) + struct.pack("<H", int(delay))
        out += bytes((tidx,)) + b"\x00"
        h, w = g.shape
        out += b"\x2c" + struct.pack("<HHHH", ox, oy, w, h)
        out += bytes((0x00,)) + bytes((m,))
        packed = _gif_lzw_encode(g.reshape(-1).tolist(), m)
        i = 0
        while i < len(packed):
            chunk = packed[i : i + 255]
            out += bytes((len(chunk),)) + chunk
            i += 255
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def gif_frames(payload: bytes):
    """REAL decode of EVERY frame of a GIF87a/89a with full composition
    (round 9 — closes the 'first frame only' gap): global/local color
    tables, interlacing, per-frame offsets, GCE transparency, and
    disposal methods 0/1 (leave), 2 (restore to the logical-screen
    background color) and 3 (restore to the previous canvas).  Returns
    a list of composed (H, W, 3) RGB uint8 canvases — one per frame,
    at the LOGICAL SCREEN geometry — or None if the payload is not a
    GIF this decoder handles.  Pixels never yet painted render as the
    background color (the common renderer convention; documented
    rather than an alpha channel, since downstream consumers are RGB
    feature ops)."""
    import struct

    import numpy as np

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    W, H = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    bg_idx = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    if not pixels_ok(W, H):
        return None  # header claims more pixels than the decode cap
    if gct is not None and bg_idx < len(gct) // 3:
        bg_rgb = np.frombuffer(gct[3 * bg_idx : 3 * bg_idx + 3], dtype=np.uint8)
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (H, W, 3)).copy()
    frames: list = []
    # pending GCE state for the NEXT image
    disposal, transparent = 0, None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            if pos >= len(payload):
                return None
            label = payload[pos]
            pos += 1
            subs = []
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                subs.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and subs and len(subs[0]) >= 4:
                flags = subs[0][0]
                disposal = (flags >> 2) & 7
                transparent = subs[0][3] if flags & 1 else None
            continue
        if block != 0x2C:
            return None
        if pos + 9 > len(payload):
            return None
        ox, oy, w, h = struct.unpack_from("<HHHH", payload, pos)
        ipacked = payload[pos + 8]
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = payload[pos : pos + 3 * n]
            pos += 3 * n
        if pal is None or not pixels_ok(w, h) or ox + w > W or oy + h > H:
            return None
        if pos >= len(payload):
            return None
        min_code_size = payload[pos]
        pos += 1
        if not (2 <= min_code_size <= 8):
            return None
        data = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw(bytes(data), min_code_size, max_out=w * h)
        if idx is None or len(idx) < w * h:
            return None
        grid = np.frombuffer(idx[: w * h], dtype=np.uint8).reshape(h, w)
        if ipacked & 0x40:
            out_rows = np.empty_like(grid)
            src = 0
            for y0, step in _GIF_INTERLACE:
                for y in range(y0, h, step):
                    out_rows[y] = grid[src]
                    src += 1
            grid = out_rows
        palette = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
        if int(grid.max()) >= len(palette):
            return None
        before = canvas.copy() if disposal == 3 else None
        region = canvas[oy : oy + h, ox : ox + w]
        if transparent is not None:
            mask = grid != transparent
            region[mask] = palette[grid[mask]]
        else:
            region[:, :] = palette[grid]
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[oy : oy + h, ox : ox + w] = bg_rgb
        elif disposal == 3 and before is not None:
            canvas = before
        disposal, transparent = 0, None
    return frames or None


FRAMES_SCHEMA = "id long, frame_index int, width int, height int, frame_rgb binary"


def gif_frame_fanout(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL video-frame fan-out (the decoded twin of the
    ``video_frame_sample`` plumbing stub): one animated-GIF row fans
    out to one row per COMPOSED frame — (id, frame_index, width,
    height, frame_rgb raw bytes at logical-screen geometry), ready for
    dhash64-style perceptual ops per frame.  Non-GIF / undecodable
    payloads contribute zero rows (fail-closed, like every codec path
    here); NULL payloads are skipped."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _i, row in pdf.iterrows():
                payload = row[content_col]
                if payload is None:
                    continue
                fr = gif_frames(bytes(payload))
                if fr is None:
                    continue
                for fi, f in enumerate(fr):
                    rows.append(
                        (row["id"], fi, f.shape[1], f.shape[0], f.tobytes())
                    )
            yield pd.DataFrame(
                rows, columns=["id", "frame_index", "width", "height", "frame_rgb"]
            )

    return df.select(F.col(id_col).alias("id"), F.col(content_col)).mapInPandas(
        kernel, schema=FRAMES_SCHEMA
    )


def _decode_gif(payload: bytes):
    """REAL decode of GIF87a/89a (FIRST frame) — from-scratch LZW, no
    codec library.  Handles global/local color tables and interlacing;
    extensions (incl. animation control) are skipped, so an animated
    GIF yields its first frame at the frame's own geometry.  Returns an
    (h, w, 3) RGB uint8 array, or None if the payload is not a GIF this
    decoder handles."""
    import struct

    import numpy as np

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            return None
        if block == 0x21:  # extension: label + length-prefixed sub-blocks
            pos += 1
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            return None
        if pos + 9 > len(payload):
            return None
        _, _, w, h = struct.unpack_from("<HHHH", payload, pos)
        ipacked = payload[pos + 8]
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = payload[pos : pos + 3 * n]
            pos += 3 * n
        if pal is None or not pixels_ok(w, h) or pos >= len(payload):
            return None
        min_code_size = payload[pos]
        pos += 1
        if not (2 <= min_code_size <= 8):
            return None
        data = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = _gif_lzw(bytes(data), min_code_size, max_out=w * h)
        if idx is None or len(idx) < w * h:
            return None
        grid = np.frombuffer(idx[: w * h], dtype=np.uint8).reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4-pass order
            out_rows = np.empty_like(grid)
            src = 0
            for y0, step in _GIF_INTERLACE:
                for y in range(y0, h, step):
                    out_rows[y] = grid[src]
                    src += 1
            grid = out_rows
        palette = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
        if int(grid.max()) >= len(palette):
            return None
        return palette[grid]
    return None


# Adam7 interlace grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int):
    """Reconstruct h scanlines of ``stride`` bytes from a PNG-filtered
    byte stream (filter tag + bytes per line).  Returns an (h, stride)
    uint8 array or None on truncation/unknown filter.

    None/Sub/Up vectorize per row (Sub is a per-channel running sum mod
    256); Average and Paeth depend on the already-reconstructed left
    neighbor, so rows using them take a per-pixel sweep."""
    import numpy as np

    if len(raw) < h * (stride + 1):
        return None
    rows = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    filters, data = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f, line = filters[y], data[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub: per-channel running sum, vectorized mod-256
            px = line.reshape(-1, bpp).astype(np.uint64)
            out[y] = (np.cumsum(px, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
        elif f == 2:  # Up
            out[y] = line + prev  # uint8 wraps = mod 256
        elif f == 3:  # Average: avg of left (sequential) and up (known)
            row = out[y]
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            row = out[y]
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(line[x]) + pred) & 0xFF
        else:
            return None
    return out


def _unpack_subbyte(packed, w: int, depth: int):
    """(h, stride_bytes) packed rows -> (h, w) sample values, MSB-first
    bit order per the PNG spec."""
    import numpy as np

    h = packed.shape[0]
    bits = np.unpackbits(packed, axis=1)  # (h, stride*8), MSB first
    per = bits[:, : w * depth].reshape(h, w, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (per * weights).sum(axis=2).astype(np.uint8)


def _subbyte_to_pixels(img, depth: int, color: int, plte):
    """(h, w) sub-byte samples -> (h, w, c) uint8 pixels: gray scales to
    the full range (0..2^d-1 -> 0..255); palette indexes PLTE."""
    import numpy as np

    if color == 0:
        scale = 255 // ((1 << depth) - 1)
        return (img * np.uint16(scale)).astype(np.uint8)[:, :, None]
    if int(img.max(initial=0)) >= len(plte):
        return None  # corrupt palette index: unhandled input, not a crash
    return plte[img]


def _adam7_passes(w: int, h: int, unit_bits: int):
    """Non-empty Adam7 passes as (x0, y0, dx, dy, wp, hp, stride_bytes),
    plus the total filtered-stream bytes they require — computed BEFORE
    any pixel allocation, so oversized IHDR dimensions on a tiny payload
    are rejected by a length check, never by a MemoryError."""
    passes, need = [], 0
    for x0, y0, dx, dy in _ADAM7:
        wp = -(-(w - x0) // dx) if w > x0 else 0
        hp = -(-(h - y0) // dy) if h > y0 else 0
        if wp == 0 or hp == 0:
            continue
        stride = (wp * unit_bits + 7) // 8
        passes.append((x0, y0, dx, dy, wp, hp, stride))
        need += hp * (stride + 1)
    return passes, need


def _subbyte_interlaced(raw: bytes, w, h, depth, color, plte):
    """Adam7 for sub-byte depths: each pass's packed scanlines unfilter
    (filter unit 1 byte) and unpack independently, then samples scatter
    onto the pass grid before the gray/palette expansion."""
    import numpy as np

    passes, need = _adam7_passes(w, h, depth)
    if len(raw) < need:
        return None  # dims claim more scanlines than the stream carries
    out = np.zeros((h, w), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy, wp, hp, stride in passes:
        packed = _png_unfilter(raw[pos:], hp, stride, 1)
        if packed is None:
            return None
        pos += hp * (stride + 1)
        out[y0::dy, x0::dx] = _unpack_subbyte(packed, wp, depth)
    return _subbyte_to_pixels(out, depth, color, plte)


def _decode_png(payload: bytes):
    """REAL decode of 1/2/4/8/16-bit PNG — stdlib ``zlib`` + numpy, no
    external codec library.  Supports color types 0 (gray),
    2 (RGB), 3 (palette, 8-bit), 4 (gray+alpha), 6 (RGBA) and all five
    scanline filters (None/Sub/Up/Average/Paeth; filtering is BYTE-wise
    per the spec, so the same unfilter code serves both depths).
    16-bit samples are down-converted to uint8 by taking the high byte
    (the standard 16→8 rendering).  Adam7 INTERLACED streams decode for
    real too: the seven filtered sub-images unfilter independently and
    scatter back onto the pass grid.  Returns an (h, w, c) uint8 array,
    or None only for malformed streams.  Per-blob work in the
    mapInPandas kernel stays embarrassingly parallel; see
    :func:`_png_unfilter` for the per-filter cost model."""
    import struct
    import zlib

    import numpy as np

    if len(payload) < 45 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, ihdr, idat, plte = 8, None, [], None
    try:
        while pos + 8 <= len(payload):
            (length,) = struct.unpack_from(">I", payload, pos)
            ctype = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"PLTE":
                plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + data + crc
        if ihdr is None or not idat:
            return None
        w, h, depth, color, comp, filt, interlace = ihdr
        if depth not in (1, 2, 4, 8, 16) or comp != 0 or filt != 0 or interlace not in (0, 1):
            return None
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
        if channels is None or (color == 3 and plte is None) or w == 0 or h == 0:
            return None
        if depth < 8 and color not in (0, 3):
            return None  # sub-byte depths are gray/palette only per spec
        if depth == 16 and color == 3:
            return None  # palette indices are 8-bit max per spec
        if not pixels_ok(w, h):
            return None  # IHDR claims more pixels than the decode cap
        # bound the inflate: the legal filtered stream for these
        # dimensions (plain or Adam7) never exceeds this, so a
        # zip-bomb IDAT stops inflating at the bound instead of
        # ballooning executor memory
        bound = h * (w * channels * (2 if depth == 16 else 1) + 1) + 16 * (h + 16)
        dec = zlib.decompressobj()
        raw = dec.decompress(b"".join(idat), bound + 1)
        if len(raw) > bound:
            return None
    except Exception:
        return None
    if depth < 8:
        # sub-byte gray/palette: the filter unit is ONE byte; unfilter
        # the packed scanlines, then unpack MSB-first bit fields and
        # (for gray) scale to the full 0-255 range
        if interlace != 0:
            return _subbyte_interlaced(raw, w, h, depth, color, plte)
        stride = (w * depth + 7) // 8
        packed = _png_unfilter(raw, h, stride, 1)
        if packed is None:
            return None
        img = _unpack_subbyte(packed, w, depth)
        return _subbyte_to_pixels(img, depth, color, plte)
    bpp = channels * (depth // 8)  # bytes per pixel — the filter unit
    if interlace == 0:
        out = _png_unfilter(raw, h, w * bpp, bpp)
        if out is None:
            return None
    else:
        # Adam7: seven independently-filtered sub-images concatenated in
        # the IDAT stream, scattered back on the (x0, y0, dx, dy) grid;
        # geometry and the required stream length come FIRST, so bogus
        # IHDR dimensions are a cheap length-check rejection, never a
        # giant allocation
        passes, need = _adam7_passes(w, h, bpp * 8)
        if len(raw) < need:
            return None
        out = np.zeros((h, w * bpp), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy, wp, hp, stride in passes:
            sub = _png_unfilter(raw[pos:], hp, stride, bpp)
            if sub is None:
                return None
            pos += hp * (stride + 1)
            # scatter pixel-wise: each sub pixel (bpp bytes) to its grid cell
            grid = out.reshape(h, w, bpp)
            grid[y0::dy, x0::dx] = sub.reshape(hp, wp, bpp)
    if depth == 16:
        # big-endian 16-bit samples: high byte == round-toward-zero 8-bit
        out = out.reshape(h, w, channels, 2)[:, :, :, 0]
        return out.copy()
    img = out.reshape(h, w, channels)
    if color == 3:
        # a corrupt palette image can index past PLTE; that is an
        # unhandled input (fall through to the PIL/strict gate), not a
        # task-killing IndexError inside the mapInPandas kernel
        if int(img.max(initial=0)) >= len(plte):
            return None
        img = plte[img[:, :, 0]]
    return img.copy()


def _decode_image(payload: bytes, strict: bool):
    """Real decode via PIL when available; real pure-numpy decode for
    uncompressed BMP, PNG at any legal depth (1-16, incl. Adam7), and
    baseline + progressive JPEG regardless; deterministic fake
    otherwise."""
    try:
        import io

        from PIL import Image  # type: ignore

        img = Image.open(io.BytesIO(payload))
        import numpy as np

        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr
    except ImportError:
        bmp = _decode_bmp(payload)
        if bmp is not None:
            return bmp
        png = _decode_png(payload)
        if png is not None:
            return png
        gif = _decode_gif(payload)
        if gif is not None:
            return gif
        from .jpeg import decode_jpeg

        jpg = decode_jpeg(payload)
        if jpg is not None:
            return jpg
        from .tiff import decode_tiff

        try:
            tif = decode_tiff(payload)
        except NotImplementedError:
            # out-of-scope TIFF feature (tiles/16-bit/planar/fax): an
            # unsupported codec, not corrupt data — strict gate below
            tif = None
        if tif is not None:
            return tif
        from .webp import decode_webp

        try:
            wbp = decode_webp(payload)
        except NotImplementedError:
            # lossy VP8/VP8X container: unsupported codec, NOT a corrupt
            # payload — fall through to the strict gate below so the
            # default non-strict mode yields the documented
            # deterministic fake instead of failing the Spark task
            wbp = None
        if wbp is not None:
            return wbp
        if strict:
            raise NotImplementedError(
                "image decode requires PIL (not installed) for formats "
                "beyond uncompressed BMP, PNG (any depth, incl. Adam7), "
                "GIF87a/89a (first frame), baseline/progressive JPEG, "
                "and lossless WebP (VP8L); pass decode_strict=False for "
                "the deterministic fake"
            ) from None
        import numpy as np

        # DETERMINISTIC FAKE: 8x8x3 "image" whose pixels are the rolling
        # byte content — stable across runs and partitions
        buf = np.frombuffer((payload * (192 // max(1, len(payload)) + 1))[:192], dtype=np.uint8)
        return buf.reshape(8, 8, 3)


def _decode_wav(payload: bytes):
    """REAL decode of PCM-16 WAV via the stdlib ``wave`` module — no
    external codec.  Returns (samples float64 in [-1, 1], rate) or None
    if the payload is not a PCM-16 WAV."""
    import io
    import wave

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(payload)) as wf:
            if wf.getsampwidth() != 2:
                return None
            rate = wf.getframerate()
            ch = wf.getnchannels()
            raw = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError, RuntimeError, ValueError):
        # truncated/bit-flipped RIFF: the stdlib module raises any of
        # these on corrupt chunk walks — undecodable data, never a
        # task-killing error (round-9 fuzz contract)
        return None
    if ch < 1 or rate <= 0:
        return None
    raw = raw[: len(raw) - len(raw) % (2 * ch)]  # drop a torn tail frame
    x = np.frombuffer(raw, dtype="<i2").astype("float64") / 32768.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, rate


def _g711_tables():
    """256-entry decode tables for G.711 µ-law and A-law (public spec
    formulas) -> linear int16."""
    import numpy as np

    ulaw = np.empty(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        sign, exp, mant = u & 0x80, (u >> 4) & 7, u & 0xF
        mag = (((mant << 3) + 0x84) << exp) - 0x84
        ulaw[b] = -mag if sign else mag
    alaw = np.empty(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        sign, exp, mant = a & 0x80, (a >> 4) & 7, a & 0xF
        if exp:
            mag = ((mant << 4) + 0x108) << (exp - 1)
        else:
            mag = (mant << 4) + 8
        # A-law's sign convention is INVERTED vs µ-law: a set sign bit
        # (after the 0x55 toggle) marks a POSITIVE sample
        alaw[b] = mag if sign else -mag
    return ulaw, alaw


def _riff_fmt_data(payload: bytes):
    """RIFF/WAVE chunk walk shared by the non-stdlib WAV decoders:
    returns (fmt_bytes, data_bytes) or None (chunks are word-aligned;
    unknown chunks are skipped)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None or len(fmt) < 16:
        return None
    return fmt, data


def _decode_wav_companded(payload: bytes):
    """REAL decode of G.711 A-law / µ-law WAV (format tags 6 and 7 —
    the telephony formats the stdlib ``wave`` module rejects): RIFF
    chunk walk + numpy table expansion to linear.  Returns
    (samples float64 in [-1, 1], rate) or None."""
    import struct

    import numpy as np

    fd = _riff_fmt_data(payload)
    if fd is None:
        return None
    fmt, data = fd
    tag, ch, rate = struct.unpack_from("<HHI", fmt, 0)
    (bits,) = struct.unpack_from("<H", fmt, 14)
    if tag not in (6, 7) or bits != 8 or ch < 1:
        return None
    ulaw, alaw = _g711_tables()
    table = alaw if tag == 6 else ulaw
    x = table[np.frombuffer(data, dtype=np.uint8)].astype("float64") / 32768.0
    if ch > 1:
        x = x[: len(x) - len(x) % ch].reshape(-1, ch).mean(axis=1)
    return x, rate


_IMA_INDEX_ADJUST = (-1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _ima_decode_nibbles(nibbles, predictor: int, index: int):
    """IMA/DVI ADPCM core (public spec): expand 4-bit codes to int16
    starting from (predictor, index) state.  Returns (samples, state)."""
    out = []
    for code in nibbles:
        step = _IMA_STEPS[index]
        diff = step >> 3
        if code & 1:
            diff += step >> 2
        if code & 2:
            diff += step >> 1
        if code & 4:
            diff += step
        if code & 8:
            predictor -= diff
        else:
            predictor += diff
        predictor = max(-32768, min(32767, predictor))
        index = max(0, min(88, index + _IMA_INDEX_ADJUST[code & 7]))
        out.append(predictor)
    return out, (predictor, index)


def _decode_wav_ima_adpcm(payload: bytes):
    """REAL decode of IMA ADPCM WAV (format tag 17, 4-bit): per-block
    (predictor, index) headers per channel, nibble expansion via the
    public IMA step tables.  Honors the fmt extension's
    ``wSamplesPerBlock`` (an encoder that pads the final nibble group
    declares fewer samples than the body could hold, and the padding
    must NOT decode as extra samples), consumes non-group-aligned mono
    bodies byte-exactly, and decodes a SHORT final block (mono) rather
    than dropping it.  A stereo body that breaks the per-channel
    4-byte-group interleave is ambiguous and rejected.  Returns
    (samples float64 in [-1, 1], rate) or None."""
    import struct

    import numpy as np

    fd = _riff_fmt_data(payload)
    if fd is None:
        return None
    fmt, data = fd
    tag, ch, rate = struct.unpack_from("<HHI", fmt, 0)
    (block_align,) = struct.unpack_from("<H", fmt, 12)
    (bits,) = struct.unpack_from("<H", fmt, 14)
    if tag != 17 or bits != 4 or ch < 1 or block_align < 4 * ch:
        return None
    body_bytes = block_align - 4 * ch
    if ch > 1 and body_bytes % (4 * ch):
        return None  # stereo interleave requires whole per-channel groups
    derived_spb = 1 + (body_bytes * 2) // ch
    spb = derived_spb
    if len(fmt) >= 20:
        (cb,) = struct.unpack_from("<H", fmt, 16)
        if cb >= 2:
            (declared,) = struct.unpack_from("<H", fmt, 18)
            if declared < 1 or declared > derived_spb:
                return None  # a block cannot carry the declared count
            spb = declared

    def _block_channels(block: bytes):
        """One block -> per-channel sample lists (untruncated) or None."""
        states = []
        samps: list[list[int]] = [[] for _ in range(ch)]
        for c in range(ch):
            pred, idx = struct.unpack_from("<hB", block, c * 4)
            if idx > 88:
                return None
            states.append((pred, idx))
            samps[c].append(pred)  # the header predictor IS sample 0
        body = block[4 * ch :]
        if ch == 1:
            nibs = []
            for byte in body:
                nibs += [byte & 0xF, byte >> 4]  # low nibble first
            out, _ = _ima_decode_nibbles(nibs, *states[0])
            samps[0].extend(out)
        else:
            if len(body) % (4 * ch):
                return None
            for g0 in range(0, len(body), 4 * ch):
                for c in range(ch):
                    chunk = body[g0 + 4 * c : g0 + 4 * c + 4]
                    nibs = []
                    for byte in chunk:
                        nibs += [byte & 0xF, byte >> 4]
                    out, states[c] = _ima_decode_nibbles(nibs, *states[c])
                    samps[c].extend(out)
        return samps

    chans: list[list[int]] = [[] for _ in range(ch)]
    n_full = len(data) // block_align
    for b in range(n_full):
        samps = _block_channels(data[b * block_align : (b + 1) * block_align])
        if samps is None:
            return None
        for c in range(ch):
            chans[c].extend(samps[c][:spb])
    rem = data[n_full * block_align :]
    if rem:
        if len(rem) < 4 * ch:
            return None  # header itself truncated
        samps = _block_channels(rem)
        if samps is None:
            return None
        for c in range(ch):
            chans[c].extend(samps[c][:spb])
    if not chans[0]:
        return None
    x = np.array(chans, dtype="float64") / 32768.0
    return x.mean(axis=0), rate


def _decode_audio(payload: bytes, strict: bool):
    try:
        import soundfile  # type: ignore  # noqa: F401

        raise NotImplementedError("real audio path untested in this container")
    except ImportError:
        wav = _decode_wav(payload)
        if wav is not None:
            return wav
        companded = _decode_wav_companded(payload)
        if companded is not None:
            return companded
        adpcm = _decode_wav_ima_adpcm(payload)
        if adpcm is not None:
            return adpcm
        if strict:
            # from-scratch MP3/OGG/AAC is documented OUT OF REACH in
            # this sandbox: their decoders need the specs' constant
            # Huffman/scalefactor/window tables (hundreds of entries,
            # not re-derivable) and no system audio codec library ships
            # in the container (checked: no libsndfile / libmpg123 /
            # libvorbis / libavcodec) — unlike images, where libwebp
            # and libtiff are present and bound via ctypes
            raise NotImplementedError(
                "audio decode requires soundfile/ffmpeg (not installed) "
                "for formats beyond PCM-16, G.711 A-law/u-law, and "
                "IMA ADPCM WAV"
            ) from None
        import numpy as np

        n = max(16, min(len(payload), 4096))
        buf = np.frombuffer((payload * (n // max(1, len(payload)) + 1))[:n], dtype=np.uint8)
        return buf.astype("float64") / 127.5 - 1.0, 16000


def image_features(
    df: DataFrame, id_col: str = "id", content_col: str = "content", decode_strict: bool = False
) -> DataFrame:
    """binary image column -> (width, height, channels, mean_pixel) via
    mapInPandas (one Arrow batch in, one out; executors never hold more
    than a batch of blobs)."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _i, row in pdf.iterrows():
                payload = row[content_col]
                if payload is None:
                    continue
                arr = _decode_image(bytes(payload), decode_strict)
                rows.append(
                    (
                        row[id_col],
                        arr.shape[1],
                        arr.shape[0],
                        arr.shape[2],
                        float(arr.mean()),
                        len(payload),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["id", "width", "height", "channels", "mean_pixel", "payload_size"],
            )

    return df.select(F.col(id_col).alias(id_col), F.col(content_col)).mapInPandas(
        kernel, schema=IMAGE_SCHEMA
    )


def image_thumbnail(
    df: DataFrame,
    size: tuple[int, int] = (4, 4),
    id_col: str = "id",
    content_col: str = "content",
    decode_strict: bool = False,
) -> DataFrame:
    """Resize path: decode -> pool down to `size` -> re-emit bytes.
    With the fake decoder this is mean-pooling over the synthetic pixel
    grid — the batch shape and binary-out plumbing are the real thing."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for _i, row in pdf.iterrows():
                payload = row[content_col]
                if payload is None:
                    continue
                arr = _decode_image(bytes(payload), decode_strict).astype("float64")
                h, w = size
                ah, aw, c = arr.shape
                pooled = arr[: ah - ah % h or ah, : aw - aw % w or aw]
                pooled = pooled.reshape(h, ah // h, w, aw // w, c).mean(axis=(1, 3))
                rows.append((row[id_col], w, h, pooled.astype(np.uint8).tobytes()))
            yield pd.DataFrame(rows, columns=["id", "thumb_w", "thumb_h", "thumb_bytes"])

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(kernel, schema=THUMB_SCHEMA)


def image_resize_pixels(
    df: DataFrame,
    out_h: int = 8,
    out_w: int = 8,
    method: str = "box",
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
) -> DataFrame:
    """INTEGER-EXACT image resize over binary payloads — the 'resize'
    stage of the multimodal mandate in its oracle-checkable form:
    decode (the from-scratch codecs) → integer luma
    ((299R+587G+114B)//1000, dHash's formula) → downsample to
    (out_h, out_w), emitting ONE ROW PER OUTPUT PIXEL (id, y, x, v).

    ``method='box'`` is the anti-aliased path: output pixel (y, x)
    is the FLOOR MEAN (integer sum // count) over the source block
    rows [y·H//out_h, (y+1)·H//out_h) × cols [x·W//out_w,
    (x+1)·W//out_w) — the boundaries every engine derives identically,
    and uneven blocks (H not divisible by out_h) are handled by the
    same floor arithmetic.  ``method='nearest'`` picks
    luma[(y·H)//out_h][(x·W)//out_w], the dHash sampling rule.  Both
    are pure integer chains, so an external engine can replay every
    output value closed-form (the n3_image_resize oracle does).

    Scale shape: one Arrow ``mapInPandas`` — rows independent, zero
    shuffle; output bounded at out_h·out_w rows per image.  NULL or
    (non-strict) undecodable payloads emit no rows; ``strict`` raises
    at the codec gate.  Upscaling past the source size is rejected —
    a box mean over an empty block has no value."""
    if method not in ("box", "nearest"):
        raise ValueError(f"method must be 'box' or 'nearest', got {method!r}")
    if out_h < 1 or out_w < 1:
        raise ValueError(f"output dims must be >= 1, got {out_h}x{out_w}")
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("y", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("v", T.IntegerType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                arr = _decode_image(bytes(payload), strict)
                if arr is None:
                    continue
                a = np.asarray(arr, dtype=np.int64)
                if a.ndim == 2:
                    luma = a
                elif a.shape[2] == 1:
                    luma = a[:, :, 0]
                else:
                    luma = (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000
                h, w = luma.shape
                if out_h > h or out_w > w:
                    raise ValueError(
                        f"cannot resize {h}x{w} up to {out_h}x{out_w}: "
                        "box/nearest downsampling only"
                    )
                if method == "nearest":
                    ys = [(y * h) // out_h for y in range(out_h)]
                    xs = [(x * w) // out_w for x in range(out_w)]
                    s = luma[np.ix_(ys, xs)]
                    for y in range(out_h):
                        for x in range(out_w):
                            rows.append((mid, y, x, int(s[y][x])))
                else:
                    yb = [(y * h) // out_h for y in range(out_h + 1)]
                    xb = [(x * w) // out_w for x in range(out_w + 1)]
                    for y in range(out_h):
                        for x in range(out_w):
                            blk = luma[yb[y] : yb[y + 1], xb[x] : xb[x + 1]]
                            rows.append((mid, y, x, int(blk.sum()) // blk.size))
            yield pd.DataFrame(rows, columns=[id_col, "y", "x", "v"])

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, schema=out_schema)


def audio_features(
    df: DataFrame, id_col: str = "id", content_col: str = "content", decode_strict: bool = False
) -> DataFrame:
    """binary audio column -> (n_samples, sample_rate, rms)."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for _i, row in pdf.iterrows():
                payload = row[content_col]
                if payload is None:
                    continue
                samples, rate = _decode_audio(bytes(payload), decode_strict)
                rows.append(
                    (
                        row[id_col],
                        len(samples),
                        rate,
                        float(np.sqrt((samples**2).mean())),
                        len(payload),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["id", "n_samples", "sample_rate", "rms", "payload_size"]
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(kernel, schema=AUDIO_SCHEMA)


def video_frame_sample(
    df: DataFrame,
    every_n_bytes: int = 64,
    frame_size: int = 16,
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """Frame sampling plumbing: one input row fans out to N frame rows
    (the real operator would call ffmpeg per keyframe; the fake slices the
    byte stream at fixed strides — same fan-out shape, same schema)."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _i, row in pdf.iterrows():
                payload = bytes(row[content_col] or b"")
                for fi, off in enumerate(range(0, len(payload), every_n_bytes)):
                    rows.append((row[id_col], fi, payload[off : off + frame_size]))
            yield pd.DataFrame(rows, columns=["id", "frame_index", "frame_bytes"])

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(kernel, schema=FRAME_SCHEMA)


def dhash64(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
    out_col: str = "dhash_hex",
) -> DataFrame:
    """Perceptual difference-hash over image payloads (round 8, N3+N1
    composed): decode (the from-scratch codecs of this module) →
    integer luma ((299R+587G+114B)//1000) → 8×9 NEAREST-NEIGHBOR
    sample (row r → floor(r·H/8), col c → floor(c·W/9)) → 64
    horizontal-gradient bits (bit r·8+c = sample[r][c+1] > sample[r][c])
    — the standard dHash, with every step integer/deterministic so an
    external engine can replay it closed-form.

    The hash surfaces as a 16-char lowercase hex STRING (nibble j =
    bits 4j..4j+3, emitted high-nibble-first): sign-free, engine-
    portable, and band-sliceable with plain substr.  NULL payloads
    yield NULL; unknown codecs follow the module's ``_decode_image``
    contract — non-strict hashes the DETERMINISTIC FAKE (stable, so
    identical undecodable payloads collide only with themselves),
    strict raises at the codec gate.  One Arrow ``mapInPandas`` over
    the binary column — the N3 plumbing pattern."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField(out_col, T.StringType()),
        ]
    )

    def run(batches):
        import numpy as np

        def one(payload):
            if payload is None:
                return None
            arr = _decode_image(bytes(payload), strict)
            if arr is None:
                return None
            a = np.asarray(arr, dtype=np.int64)
            if a.ndim == 2:
                luma = a
            else:
                if a.shape[2] == 1:
                    luma = a[:, :, 0]
                else:
                    luma = (
                        299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]
                    ) // 1000
            h, w = luma.shape
            rows = [(r * h) // 8 for r in range(8)]
            cols = [(c * w) // 9 for c in range(9)]
            s = luma[np.ix_(rows, cols)]
            bits = 0
            for r in range(8):
                for c in range(8):
                    if s[r][c + 1] > s[r][c]:
                        bits |= 1 << (r * 8 + c)
            return format(bits, "016x")

        for pdf in batches:
            yield pdf[[id_col]].assign(
                **{out_col: [one(p) for p in pdf[payload_col]]}
            )

    return df.mapInPandas(run, schema=out_schema)


def dhash_neardup(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash_hex",
    max_hamming: int = 4,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    hot_policy: str = "star",
) -> DataFrame:
    """Near-duplicate IMAGE pairs by dHash hamming distance — the
    visual twin of ``dedup.simhash_neardup``: 8 bands of 8 bits (2 hex
    chars); two hashes within hamming ≤ 7 agree on ≥ 1 band
    (pigeonhole), so the candidate join is 8 band-keyed equi-joins,
    never all-pairs; candidates verify by exact hamming, computed as a
    16-digit hex fold (instr-based nibble decode + bit_count — the
    same expression replays in any engine).  NULL hashes never pair.

    Hot buckets (all-black frames, template slides) are capped by the
    shared guard (``dedup.guarded_band_self_join``): buckets over
    ``max_bucket`` members emit rep-vs-member (star) or sampled pairs
    instead of O(m²); ``max_bucket=None`` disables the guard."""
    if not 0 <= max_hamming <= 7:
        raise ValueError(
            f"max_hamming={max_hamming}: 8 bands of 8 bits guarantee "
            "recall only for hamming <= 7"
        )
    h = hashes.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("hx")
    )
    bands = h.select(
        "id",
        "hx",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring("hx", 2 * b + 1, 2).alias("key"),
                    )
                    for b in range(8)
                ]
            )
        ).alias("bk"),
    ).select("id", "hx", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    cand = guarded_band_self_join(
        bands,
        carry_cols=("hx",),
        max_bucket=max_bucket,
        hot_policy=hot_policy,
        key_col="key",
    )
    hamming = F.expr(
        "aggregate(transform(sequence(1, 16), i -> "
        "bit_count((instr('0123456789abcdef', substr(hx_a, i, 1)) - 1) "
        "^ (instr('0123456789abcdef', substr(hx_b, i, 1)) - 1))), "
        "0, (acc, x) -> acc + x)"
    )
    return cand.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def audio_fingerprint(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
    out_col: str = "afp_hex",
    n_frames: int = 65,
) -> DataFrame:
    """Energy-envelope audio fingerprint (round 8) — the audio member
    of the perceptual-dedup family next to :func:`dhash64`: decode
    (module codecs), split the mono int16 stream into ``n_frames``
    equal frames (frame length = len // n_frames, adaptive so clips of
    any duration hash), frame energy = Σ s² (exact integer — samples
    are k/32768 doubles, un-normalized losslessly), bit i = energy(i+1)
    > energy(i) — a 64-bit envelope-gradient hash emitted as the same
    portable 16-hex string :func:`dhash_neardup` bands and verifies
    (pass ``hash_col=out_col``).  Simpler than chromaprint on purpose:
    no FFT means every step is integer arithmetic an external engine
    replays closed-form.  NULL/too-short (< n_frames samples) → NULL;
    unknown codecs follow the module's strict/fake contract."""
    from pyspark.sql import types as T

    if n_frames != 65:
        raise ValueError("n_frames must be 65 (64 gradient bits = 16 hex chars)")
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField(out_col, T.StringType()),
        ]
    )

    def run(batches):
        import numpy as np

        def one(payload):
            if payload is None:
                return None
            got = _decode_audio(bytes(payload), strict)
            if got is None:
                return None
            samples, _rate = got
            s = np.rint(np.asarray(samples, dtype=np.float64) * 32768.0).astype(
                np.int64
            )
            flen = len(s) // n_frames
            if flen == 0:
                return None
            e = [
                int((s[i * flen : (i + 1) * flen] ** 2).sum())
                for i in range(n_frames)
            ]
            bits = 0
            for i in range(n_frames - 1):
                if e[i + 1] > e[i]:
                    bits |= 1 << i
            return format(bits, "016x")

        for pdf in batches:
            yield pdf[[id_col]].assign(
                **{out_col: [one(p) for p in pdf[payload_col]]}
            )

    return df.mapInPandas(run, schema=out_schema)


def audio_resample_samples(
    df: DataFrame,
    factor: int,
    method: str = "mean",
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
) -> DataFrame:
    """INTEGER-EXACT audio downsample — the audio twin of
    :func:`image_resize_pixels` (the mandate's resample stage in its
    oracle-checkable form): decode (module codecs) → exact int16
    stream (the :func:`audio_fingerprint` un-normalization) → reduce
    by ``factor``, one row per OUTPUT sample (id, i, v).

    ``method='mean'`` emits the block mean with TRUNCATING integer
    division (matching SQL engines' integer ``div``, which truncates
    toward zero — NOT Python's floor ``//``, which differs on negative
    sums); only full blocks are emitted, a sub-factor tail is dropped.
    ``method='decimate'`` picks every factor-th sample (v = s[i·factor])
    — the aliasing-prone fast path, exact by construction.

    One Arrow ``mapInPandas``, rows independent, zero shuffle; output
    is 1/factor of the decoded sample count.  NULL / undecodable
    (non-strict) payloads emit no rows."""
    if method not in ("mean", "decimate"):
        raise ValueError(f"method must be 'mean' or 'decimate', got {method!r}")
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("i", T.IntegerType()),
            T.StructField("v", T.LongType()),
        ]
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        def trunc_div(total: int, m: int) -> int:
            q = abs(total) // m
            return q if total >= 0 else -q

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                got = _decode_audio(bytes(payload), strict)
                if got is None:
                    continue
                samples, _rate = got
                s = np.rint(np.asarray(samples, dtype=np.float64) * 32768.0).astype(
                    np.int64
                )
                n_out = len(s) // factor
                if method == "decimate":
                    for i in range(n_out):
                        rows.append((mid, i, int(s[i * factor])))
                else:
                    for i in range(n_out):
                        total = int(s[i * factor : (i + 1) * factor].sum())
                        rows.append((mid, i, trunc_div(total, factor)))
            yield pd.DataFrame(rows, columns=[id_col, "i", "v"])

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=out_schema
    )
