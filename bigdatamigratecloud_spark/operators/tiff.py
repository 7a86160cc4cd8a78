"""Baseline TIFF codec, from scratch against the public TIFF 6.0 spec
(north-star N3 family, round 7 — the reference, Codeunit 60001
XML:1144-1202, is format-agnostic bytes, so this is beyond-reference
coverage like the BMP/PNG/GIF/JPEG/VP8L work).

Scope — the baseline profile real scanned/exported corpora actually
contain:

- both byte orders (``II``/``MM``)
- 8-bit AND 16-bit grayscale, RGB and RGBA (round 9), strip-organized
  (any RowsPerStrip) or TILED (TIFF 6.0 §15, edge-padded full tiles)
- Compression 1 (none), 32773 (PackBits) and 5 (TIFF-LZW, MSB-first
  codes with the spec's early-change width switch), plus the
  horizontal-differencing Predictor (tag 317 = 2) LZW files commonly
  pair with
- PhotometricInterpretation 0 (WhiteIsZero, inverted) and 1/2

Everything else (other depths, planar, JPEG-in-TIFF, CCITT fax)
raises ``NotImplementedError`` so callers fall through to their strict
gate / deterministic fake, the same contract as the other codecs.

The encoder exists to ground-truth the decoder without PIL: it writes
spec-compliant single-IFD files in either byte order and all three
compressions, and the tests roundtrip arrays through both directions
plus hand-computed PackBits/LZW byte fixtures.
"""

from __future__ import annotations

import struct


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find a repeat run
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 127:
            j += 1
        if j > i:  # run of j-i+1 identical bytes
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
            continue
        # literal run until the next 3-byte repeat (2 is break-even)
        j = i
        while (
            j + 2 < n
            and not (data[j + 1] == data[j + 2] == data[j])
            and j - i < 127
        ):
            j += 1
        j = min(j, i + 127, n - 1)
        out.append(j - i)
        out += data[i : j + 1]
        i = j + 1
    return bytes(out)


_CLEAR, _EOI = 256, 257


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-LZW: MSB-first bit packing, 9-bit start, EARLY code-width
    change (width bumps when the next table index would need it, i.e.
    at table sizes 511/1023/2047 — one earlier than GIF)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    buf = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                return bytes(out[:expected])
            buf = (buf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (buf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _CLEAR:
            table = table[:258]
            width = 9
            prev = None
            continue
        if code == _EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        out += entry
        prev = entry
        # EARLY change: the encoder widens when the next ADD would not
        # fit, so the decoder must follow one step ahead
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    return bytes(out[:expected])


def _lzw_encode(data: bytes) -> bytes:
    """Greedy longest-match TIFF-LZW encoder (early-change widths)."""
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int, w: int):
        nonlocal buf, nbits
        buf = (buf << w) | code
        nbits += w
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(_CLEAR, width)
    s = b""
    for b in data:
        cand = s + bytes([b])
        if cand in table or len(cand) == 1:
            s = cand
            continue
        emit(table[s], width)
        table[cand] = next_code
        next_code += 1
        # keep the width in lockstep with the decoder's table: the
        # decoder has assigned next_code-1 entries after reading the
        # code we just emitted and widens for the NEXT read when its
        # next free entry would not fit (early change, one ahead)
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # table nearly full: reset
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        s = bytes([b])
    if s:
        emit(table[s], width)
    emit(_EOI, width)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _read_ifd(payload: bytes, bo: str):
    (ifd_off,) = struct.unpack(bo + "I", payload[4:8])
    (n_entries,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        tag, typ = struct.unpack(bo + "HH", payload[e : e + 4])
        (count,) = struct.unpack(bo + "I", payload[e + 4 : e + 8])
        if typ not in type_fmt:
            continue  # rationals/ASCII: not needed for the baseline set
        sz = type_size[typ] * count
        if sz <= 4:
            raw = payload[e + 8 : e + 8 + sz]
        else:
            (off,) = struct.unpack(bo + "I", payload[e + 8 : e + 12])
            raw = payload[off : off + sz]
        tags[tag] = list(struct.unpack(bo + str(count) + type_fmt[typ], raw))
    return tags


def decode_tiff(payload: bytes):
    """Decode a baseline TIFF (see module docstring).  Returns
    (h, w, channels) uint8 numpy array, or None when the payload is not
    a TIFF — INCLUDING a payload with valid TIFF magic but malformed
    structure (truncated IFD, missing required tags, corrupt LZW): one
    corrupt file in a corpus must not kill the whole mapInPandas task,
    the same contract the PNG palette-overflow guard honors.
    Out-of-scope TIFF features (non-8/16-bit depths/planar/fax) still
    raise NotImplementedError so callers hit their strict gate.  8- and
    16-bit, strip or tiled, all three compressions and both byte orders
    decode for real (16-bit returns uint16 in native order)."""
    if len(payload) < 8:
        return None
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        return None
    try:
        return _decode_tiff_checked(payload, bo)
    except (struct.error, KeyError, IndexError, ValueError):
        # valid magic, malformed body: corrupt data, not a decode bug
        return None


def _decode_tiff_checked(payload: bytes, bo: str):
    import numpy as np

    tags = _read_ifd(payload, bo)
    w = tags[256][0]
    h = tags[257][0]
    from .limits import pixels_ok

    if not pixels_ok(w, h):
        return None  # IFD claims more pixels than the decode cap
    bits = tags.get(258, [8])
    spp = tags.get(277, [1])[0]
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    pred = tags.get(317, [1])[0]
    if any(b != bits[0] for b in bits) or bits[0] not in (8, 16):
        raise NotImplementedError(
            "baseline TIFF decoder: uniform 8- or 16-bit samples only"
        )
    nb = bits[0] // 8
    dt = np.uint8 if nb == 1 else np.dtype(bo + "u2")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression {comp} not implemented")
    if photo not in (0, 1, 2):
        raise NotImplementedError(f"TIFF photometric {photo} not implemented")
    if pred not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {pred} not implemented")
    if tags.get(284, [1])[0] != 1:
        raise NotImplementedError("planar TIFF not implemented")
    if tags.get(339, [1])[0] != 1:
        raise NotImplementedError("TIFF SampleFormat beyond unsigned not implemented")

    def segment(o, c, rows, cols):
        """Decompress one strip/tile to (rows, cols, spp) with the
        predictor undone (predictor and compression are per-segment in
        TIFF: each strip/tile compresses independently)."""
        expected = rows * cols * spp * nb
        chunk = payload[o : o + c]
        if comp == 1:
            raw = bytes(chunk[:expected])
        elif comp == 32773:
            raw = _packbits_decode(chunk, expected)
        else:
            raw = _lzw_decode(chunk, expected)
        a = np.frombuffer(raw, dtype=dt, count=rows * cols * spp).reshape(
            rows, cols, spp
        )
        if pred == 2:
            # horizontal differencing mod 2^bits, per row per channel
            wide = np.cumsum(a.astype(np.uint64), axis=1)
            a = (wide & (0xFF if nb == 1 else 0xFFFF)).astype(dt)
        return a

    if 322 in tags or 323 in tags:  # tiled organization (TIFF 6.0 §15)
        tw = tags[322][0]
        th = tags[323][0]
        offs = tags[324]
        counts = tags[325]
        if tw <= 0 or th <= 0:
            raise ValueError("corrupt tile geometry")
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        if len(offs) < across * down or len(counts) < across * down:
            raise ValueError("tile offset/count tables too short")
        arr = np.zeros((h, w, spp), dtype=dt)
        for ty in range(down):
            for tx in range(across):
                i = ty * across + tx
                # tiles are always FULL size, edge tiles padded: decode
                # the whole tile (predictor included), then crop
                tile = segment(offs[i], counts[i], th, tw)
                ys, xs = ty * th, tx * tw
                arr[ys : min(ys + th, h), xs : min(xs + tw, w)] = tile[
                    : min(th, h - ys), : min(tw, w - xs)
                ]
    else:
        offs = tags[273]
        counts = tags[279]
        rps = tags.get(278, [h])[0]
        parts = []
        for si, (o, c) in enumerate(zip(offs, counts)):
            nrows = min(rps, h - si * rps)
            parts.append(segment(o, c, nrows, w))
        arr = np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        if arr.shape[0] < h:
            raise ValueError("strips cover fewer rows than ImageLength")
        arr = arr[:h]
    if photo == 0:
        arr = (255 if nb == 1 else 65535) - arr
    # native byte order out, whatever the file order was
    return np.ascontiguousarray(arr, dtype=np.uint8 if nb == 1 else np.uint16)


def encode_tiff(
    arr, compression: int = 1, byte_order: str = "<", tile: tuple[int, int] | None = None
) -> bytes:
    """Write a single-IFD TIFF (test-fixture ground truth).
    ``compression``: 1 none, 5 LZW, 32773 PackBits.  uint16 input
    writes 16-bit samples (in the file byte order); ``tile=(tw, th)``
    writes TILED organization (TIFF 6.0 §15: full-size edge-padded
    tiles, row-major tile order) instead of one strip."""
    import numpy as np

    src = np.asarray(arr)
    is16 = src.dtype == np.uint16
    bo = byte_order
    a = np.ascontiguousarray(src, dtype=(np.dtype(bo + "u2") if is16 else np.uint8))
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, spp = a.shape
    bits_v = 16 if is16 else 8

    def compress(seg: "np.ndarray") -> bytes:
        body = seg.tobytes()
        rows, cols = seg.shape[0], seg.shape[1]
        if compression == 32773:
            rb = cols * spp * (2 if is16 else 1)
            return b"".join(
                _packbits_encode(body[r * rb : (r + 1) * rb]) for r in range(rows)
            )
        if compression == 5:
            return _lzw_encode(body)
        if compression == 1:
            return body
        raise ValueError(f"unsupported compression {compression}")

    if tile:
        tw, th = tile
        if tw % 16 or th % 16:
            raise ValueError("TIFF tile dimensions must be multiples of 16")
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        segs = []
        for ty in range(down):
            for tx in range(across):
                full = np.zeros((th, tw, spp), dtype=a.dtype)
                ys, xs = ty * th, tx * tw
                piece = a[ys : min(ys + th, h), xs : min(xs + tw, w)]
                full[: piece.shape[0], : piece.shape[1]] = piece
                segs.append(compress(full))
    else:
        segs = [compress(a)]

    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    entries = []  # (tag, type, count, value_or_list)

    def ent(tag, typ, count, value):
        entries.append((tag, typ, count, value))

    photometric = 1 if spp == 1 else 2
    # layout: header(8) + data segments + extra value arrays + IFD
    data_offs = []
    pos = 8
    for s in segs:
        data_offs.append(pos)
        pos += len(s)
    extras: list[tuple[int, bytes]] = []  # (offset, packed bytes)

    def extra(fmt: str, values) -> int:
        nonlocal pos
        packed = struct.pack(bo + str(len(values)) + fmt, *values)
        extras.append((pos, packed))
        off = pos
        pos += len(packed)
        return off

    ent(256, 3, 1, w)
    ent(257, 3, 1, h)
    if spp == 1:
        ent(258, 3, 1, bits_v)
    else:
        ent(258, 3, spp, extra("H", [bits_v] * spp))
    ent(259, 3, 1, compression)
    ent(262, 3, 1, photometric)
    ent(277, 3, 1, spp)
    if tile:
        ent(322, 3, 1, tile[0])
        ent(323, 3, 1, tile[1])
        n = len(segs)
        ent(324, 4, n, data_offs[0] if n == 1 else extra("I", data_offs))
        ent(325, 4, n, len(segs[0]) if n == 1 else extra("I", [len(s) for s in segs]))
    else:
        ent(273, 4, 1, data_offs[0])
        ent(278, 3, 1, h)  # one strip
        ent(279, 4, 1, len(segs[0]))
    entries.sort()
    ifd_off = pos
    out = bytearray()
    out += magic
    out += struct.pack(bo + "I", ifd_off)
    for s in segs:
        out += s
    for _off, packed in extras:
        out += packed
    out += struct.pack(bo + "H", len(entries))
    for tag, typ, count, value in entries:
        out += struct.pack(bo + "HH", tag, typ)
        out += struct.pack(bo + "I", count)
        if typ == 3 and count == 1:
            out += struct.pack(bo + "H", value) + b"\x00\x00"
        else:
            out += struct.pack(bo + "I", value)
    out += struct.pack(bo + "I", 0)  # next IFD
    return bytes(out)
