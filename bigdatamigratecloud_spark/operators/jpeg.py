"""Baseline JPEG codec — pure stdlib + numpy, no external codec library.

North-star N3 (generalizing the reference's Media handling, Codeunit
60000:1144-1270): a real corpus pipeline meets JPEG before anything
else, and this container has no PIL.  This module implements

- **decode**: baseline sequential JFIF (SOF0, 8-bit), arbitrary
  quantization and Huffman tables from the stream, restart intervals,
  1 or 3 components at any sampling factors (4:4:4 / 4:2:2 / 4:2:0
  ...).  Progressive (SOF2), arithmetic coding, and 12-bit precision
  return ``None`` so callers fall through to their strict/fake gate.
- **encode**: baseline sequential, grayscale or 4:4:4 YCbCr, quality-
  scaled Annex-K-style quantization, per-image canonical Huffman
  tables (all codes 8 bits — a valid prefix code any conformant
  decoder accepts; compression is traded for table simplicity).

Everything is per-blob work inside a mapInPandas kernel — no Spark
state; the Huffman bit loop is Python (fine for thumbnails and tests,
and the honest cost model for a no-native-codec container), while the
DCT/IDCT, color transforms, and upsampling are vectorized numpy over
all blocks at once.
"""

from __future__ import annotations

import struct

import numpy as np


def _zigzag_order() -> np.ndarray:
    """Raster index of the k-th coefficient in zigzag sequence."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(s + 1) if i < 8 and s - i < 8]
        if s % 2 == 0:
            diag.reverse()
        order += [r * 8 + c for r, c in diag]
    return np.array(order, dtype=np.int64)


_ZIGZAG = _zigzag_order()

# orthonormal 8-point DCT-II basis: forward C @ X @ C.T, inverse C.T @ Y @ C
_DCT_C = np.array(
    [
        [np.sqrt((1.0 if k == 0 else 2.0) / 8.0) * np.cos((2 * n + 1) * k * np.pi / 16.0) for n in range(8)]
        for k in range(8)
    ]
)


# ----------------------------------------------------------------- decode


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy segments."""

    def __init__(self, segments: list[bytes]):
        self.segments = segments
        self.seg = 0
        self.data = segments[0] if segments else b""
        self.pos = 0
        self.bit = 0

    def next_segment(self) -> None:
        self.seg += 1
        self.data = self.segments[self.seg]
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError("entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, n: int) -> int:
    """JPEG magnitude decode: n-bit value v to signed coefficient."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def decode_jpeg(payload: bytes):
    """Decode a baseline JPEG to an (h, w, channels) uint8 array, or
    None if the payload is not a baseline JPEG this decoder handles."""
    try:
        return _decode_jpeg_inner(payload)
    except Exception:
        return None


def _decode_jpeg_inner(payload: bytes):
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    table = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    table = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                qt[tq] = table
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = seg[i + 17 : i + 17 + n]
                huff[(tc, th)] = _build_huffman(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if precision != 8 or nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cid] = (tt >> 4, tt & 0xF)
            segments, spos = [], pos
            cur = bytearray()
            while spos < len(payload):
                b = payload[spos]
                if b != 0xFF:
                    cur.append(b)
                    spos += 1
                    continue
                nxt = payload[spos + 1] if spos + 1 < len(payload) else 0xD9
                if nxt == 0x00:
                    cur.append(0xFF)
                    spos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn
                    segments.append(bytes(cur))
                    cur = bytearray()
                    spos += 2
                else:
                    break
            segments.append(bytes(cur))
            if frame is None:
                return None
            return _decode_scan(frame, scan_tables, qt, huff, segments, restart_interval)
    return None


def _decode_scan(frame, scan_tables, qt, huff, segments, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    reader = _BitReader(segments)
    pred = {c["id"]: 0 for c in comps}
    # coefficient store per component: (n_blocks_y, n_blocks_x, 64)
    coef = {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32) for c in comps
    }
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.next_segment()
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                dc_t = huff[(0, scan_tables[c["id"]][0])]
                ac_t = huff[(1, scan_tables[c["id"]][1])]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int32)
                        s = _huff_decode(reader, dc_t)
                        diff = _extend(reader.receive(s), s)
                        pred[c["id"]] += diff
                        blk[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            blk[k] = _extend(reader.receive(s), s)
                            k += 1
                        coef[c["id"]][my * c["v"] + v, mx * c["h"] + hh] = blk
            mcu_count += 1
    # dequantize + inverse zigzag + batched IDCT per component
    planes = []
    for c in comps:
        blocks = coef[c["id"]].reshape(-1, 64) * qt[c["tq"]][None, :]
        raster = np.zeros_like(blocks)
        raster[:, _ZIGZAG] = blocks
        sq = raster.reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("ij,njk,kl->nil", _DCT_C.T, sq, _DCT_C) + 128.0
        by, bx = mcuy * c["v"], mcux * c["h"]
        plane = (
            pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    out = np.stack(planes, axis=-1)
    if len(comps) == 3:
        out = _ycbcr_to_rgb(out)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    return np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )


# ----------------------------------------------------------------- encode

_Q_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int32,
)  # Annex K.1 luminance table (public spec constants)
_Q_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int32,
)


def _scale_q(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s per spec


def _mag(v: int) -> tuple[int, int]:
    """(size, value-bits) for a signed coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _ac_symbols(blk: np.ndarray) -> list:
    """[(ac_symbol, (size, value-bits)), ...] for one zigzag block."""
    acs = []
    run = 0
    nz = np.nonzero(blk[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, (0, 0)))  # ZRL
            run -= 16
        size, bits = _mag(v)
        acs.append(((run << 4) | size, (size, bits)))
        run = 0
    if last < 63:
        acs.append((0x00, (0, 0)))  # EOB
    return acs


def _scan_stream(comps: list, mcux: int, mcuy: int, restart_interval: int):
    """Entropy-scan event stream in MCU interleave order: ('RST', n)
    markers and ('BLK', comp_index, dc_size, dc_bits, ac_list) with DC
    predictors reset at each restart, exactly as a decoder expects.
    ``comps[ci]['blocks']`` is a (block_rows, block_cols, 64) zigzag
    array; an MCU takes comps[ci]['v'] × comps[ci]['h'] blocks from it."""
    pred = [0] * len(comps)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                yield ("RST", (mcu // restart_interval - 1) % 8)
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk = c["blocks"][my * c["v"] + v, mx * c["h"] + hh]
                        dc = int(blk[0])
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        dsize, dbits = _mag(diff)
                        yield ("BLK", ci, dsize, dbits, _ac_symbols(blk))
            mcu += 1


def _fixed_len_table(symbols: set[int]) -> tuple[list[int], bytes, dict[int, tuple[int, int]]]:
    """Canonical table giving every used symbol an 8-bit code.  Valid
    prefix code (bits[8]=n, sequential codes); keeps the all-ones code
    unused as long as n <= 255."""
    vals = sorted(symbols) or [0]
    if len(vals) > 255:
        raise ValueError("too many Huffman symbols for fixed-length table")
    bits = [0] * 16
    bits[7] = len(vals)
    enc = {sym: (8, i) for i, sym in enumerate(vals)}
    return bits, bytes(vals), enc


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """Encode an (h, w) or (h, w, 1|3) uint8 array as baseline JPEG:
    grayscale, 4:4:4, or 4:2:0 (``subsampling="420"``, 2x2-mean chroma).
    Per-image fixed-length Huffman tables.  ``restart_interval`` > 0
    emits DRI + RSTn markers every that many MCUs (what a parallel
    encoder does so a reader can resync)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    sub = 2 if (subsampling == "420" and nc == 3) else 1
    if nc == 3:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
        if sub == 2:
            eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
            cb = np.pad(cb, ((0, eh - h), (0, ew - w)), mode="edge")
            cr = np.pad(cr, ((0, eh - h), (0, ew - w)), mode="edge")
            cb = cb.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
        comps = [
            {"plane": y, "h": sub, "v": sub, "tq": 0},
            {"plane": cb, "h": 1, "v": 1, "tq": 1},
            {"plane": cr, "h": 1, "v": 1, "tq": 1},
        ]
    elif nc == 1:
        comps = [{"plane": img[..., 0].astype(np.float64), "h": 1, "v": 1, "tq": 0}]
    else:
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    qts = [_scale_q(_Q_LUMA, quality), _scale_q(_Q_CHROMA, quality)]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    q_raster_idx = _np_inverse_zigzag()
    for c in comps:
        bw, bh = mcux * c["h"] * 8, mcuy * c["v"] * 8
        plane = c["plane"]
        pad = np.pad(
            plane,
            ((0, bh - plane.shape[0]), (0, bw - plane.shape[1])),
            mode="edge",
        ) - 128.0
        blocks = pad.reshape(bh // 8, 8, bw // 8, 8).transpose(0, 2, 1, 3)
        dct = np.einsum("ij,rcjk,kl->rcil", _DCT_C, blocks, _DCT_C.T)
        qz = np.round(
            dct.reshape(bh // 8, bw // 8, 64) / qts[c["tq"]][q_raster_idx]
        ).astype(np.int32)
        c["blocks"] = qz[:, :, _ZIGZAG]

    # gather symbols per class (luma=0 for component 0, chroma=1 otherwise)
    sym_dc: dict[int, set] = {0: set(), 1: set()}
    sym_ac: dict[int, set] = {0: set(), 1: set()}
    for ev in _scan_stream(comps, mcux, mcuy, restart_interval):
        if ev[0] == "BLK":
            _, ci, dsize, _dbits, acs = ev
            cls = 0 if ci == 0 else 1
            sym_dc[cls].add(dsize)
            for s, _ in acs:
                sym_ac[cls].add(s)
    classes = [0] if nc == 1 else [0, 1]
    dc_tabs = {c: _fixed_len_table(sym_dc[c]) for c in classes}
    ac_tabs = {c: _fixed_len_table(sym_ac[c]) for c in classes}

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq in sorted({c["tq"] for c in comps}):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(v) for v in qts[tq][:64]
        )
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci, c in enumerate(comps):
        sof += bytes([ci + 1, (c["h"] << 4) | c["v"], c["tq"]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    for cls in classes:
        for tc, (bits, vals, _enc) in ((0, dc_tabs[cls]), (1, ac_tabs[cls])):
            body = bytes([(tc << 4) | cls]) + bytes(bits) + vals
            out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for ci in range(nc):
        cls = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    writer = _BitWriter()
    for ev in _scan_stream(comps, mcux, mcuy, restart_interval):
        if ev[0] == "RST":
            writer.flush()
            out += writer.out
            out += bytes([0xFF, 0xD0 + ev[1]])
            writer = _BitWriter()
            continue
        _, ci, dsize, dbits, acs = ev
        cls = 0 if ci == 0 else 1
        _, _, dc_enc = dc_tabs[cls]
        _, _, ac_enc = ac_tabs[cls]
        ln, code = dc_enc[dsize]
        writer.write(code, ln)
        if dsize:
            writer.write(dbits, dsize)
        for sym, (size, bits_v) in acs:
            ln, code = ac_enc[sym]
            writer.write(code, ln)
            if size:
                writer.write(bits_v, size)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def _np_inverse_zigzag() -> np.ndarray:
    """Quant table is stored in zigzag order; return it indexed so
    q_raster[i] = q_zigzag[inverse[i]]."""
    inv = np.empty(64, dtype=np.int64)
    inv[_ZIGZAG] = np.arange(64)
    return inv
