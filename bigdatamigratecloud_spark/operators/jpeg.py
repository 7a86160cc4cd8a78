"""Baseline + progressive JPEG codec — pure stdlib + numpy, no external
codec library.

North-star N3 (generalizing the reference's Media handling, Codeunit
60000:1144-1270): a real corpus pipeline meets JPEG before anything
else, and this container has no PIL.  This module implements

- **decode**: baseline sequential JFIF (SOF0, 8-bit) AND progressive
  (SOF2: spectral selection, successive approximation — DC first/
  refine, AC first with EOB runs, AC refine with correction bits, per
  ITU T.81 §G.1.2/G.2), arbitrary quantization and Huffman tables from
  the stream, restart intervals, 1 or 3 components at any sampling
  factors (4:4:4 / 4:2:2 / 4:2:0 ...).  Arithmetic coding, lossless
  modes, and 12-bit precision return ``None`` so callers fall through
  to their strict/fake gate.
- **encode**: baseline sequential (grayscale / 4:4:4 / 4:2:0) and a
  progressive encoder with a libjpeg-style scan script (used to
  produce progressive test vectors without any external codec),
  quality-scaled Annex-K-style quantization, per-image canonical
  Huffman tables (all codes 8 bits — a valid prefix code any
  conformant decoder accepts; compression is traded for table
  simplicity).

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
    coef = None  # progressive: per-component coefficients across scans
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            precision, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if precision != 8 or nc not in (1, 3):
                return None
            from .limits import pixels_ok

            if not pixels_ok(w, h):
                return None  # SOF claims more pixels than the decode cap
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended/lossless/arithmetic frame types
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan_tables = {}
            scan_comp_ids = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cid] = (tt >> 4, tt & 0xF)
                scan_comp_ids.append(cid)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0xF
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
            if not frame["progressive"]:
                return _decode_scan(frame, scan_tables, qt, huff, segments, restart_interval)
            if coef is None:
                coef = _init_coef(frame)
            _decode_progressive_scan(
                frame, coef, scan_comp_ids, scan_tables,
                ss, se, ah, al, huff, segments, restart_interval,
            )
            pos = spos  # resume header parse at the next marker
    if frame is not None and frame.get("progressive") and coef is not None:
        return _reconstruct(frame, coef, qt)
    return None


def _decode_scan(frame, scan_tables, qt, huff, segments, restart_interval):
    comps = frame["comps"]
    _, _, mcux, mcuy = _frame_geometry(frame)
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
    return _reconstruct(frame, coef, qt)


def _frame_geometry(frame):
    """(hmax, vmax, mcux, mcuy) for the frame's sampling grid."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _init_coef(frame):
    """Per-component zigzag coefficient stores sized to the padded MCU
    grid — progressive scans fill these incrementally."""
    _, _, mcux, mcuy = _frame_geometry(frame)
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    }


def _reconstruct(frame, coef, qt):
    """Dequantize + inverse zigzag + batched IDCT per component, then
    upsample/crop and color-convert — shared by the baseline and
    progressive paths."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
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


def _noninterleaved_blocks(frame, c) -> tuple[int, int]:
    """Block rows/cols of component ``c`` in a NON-interleaved scan
    (T.81 A.2.2: ceil over the component's own sample dimensions, not
    the padded MCU grid)."""
    hmax, vmax, _, _ = _frame_geometry(frame)
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_progressive_scan(
    frame, coef, scan_comp_ids, scan_tables, ss, se, ah, al,
    huff, segments, restart_interval,
):
    """One progressive scan per T.81 §G.2: DC first/refine (interleaved
    or single-component), AC first with EOB runs, AC refine with
    correction bits.  Restart markers reset DC predictors and the EOB
    run and jump to the next entropy segment."""
    comps = {c["id"]: c for c in frame["comps"]}
    reader = _BitReader(segments)
    scomps = [comps[cid] for cid in scan_comp_ids]

    if ss == 0:
        # ---- DC scan (se must be 0 per spec)
        pred = {cid: 0 for cid in scan_comp_ids}
        if len(scomps) > 1:
            _, _, mcux, mcuy = _frame_geometry(frame)
            units = []  # (comp, block_row, block_col) in MCU interleave order
            for my in range(mcuy):
                for mx in range(mcux):
                    for c in scomps:
                        for v in range(c["v"]):
                            for hh in range(c["h"]):
                                units.append((c, my * c["v"] + v, mx * c["h"] + hh))
            per_mcu = sum(c["h"] * c["v"] for c in scomps)
        else:
            c = scomps[0]
            bh, bw = _noninterleaved_blocks(frame, c)
            units = [(c, by, bx) for by in range(bh) for bx in range(bw)]
            per_mcu = 1
        mcu = 0
        for i, (c, by, bx) in enumerate(units):
            if (
                restart_interval
                and i % per_mcu == 0
                and mcu
                and mcu % restart_interval == 0
            ):
                reader.next_segment()
                pred = {cid: 0 for cid in scan_comp_ids}
            if i % per_mcu == per_mcu - 1:
                mcu += 1
            blk = coef[c["id"]][by, bx]
            if ah == 0:  # first DC pass
                dc_t = huff[(0, scan_tables[c["id"]][0])]
                s = _huff_decode(reader, dc_t)
                diff = _extend(reader.receive(s), s)
                pred[c["id"]] += diff
                blk[0] = pred[c["id"]] << al
            else:  # DC refinement: one raw bit per block
                if reader.read_bit():
                    blk[0] = int(blk[0]) | (1 << al)
        return

    # ---- AC scan: single component, band [ss, se]
    c = scomps[0]
    ac_t = huff[(1, scan_tables[c["id"]][1])]
    bh, bw = _noninterleaved_blocks(frame, c)
    plane = coef[c["id"]]
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)
    blocks_seen = 0
    for by in range(bh):
        for bx in range(bw):
            if (
                restart_interval
                and blocks_seen
                and blocks_seen % restart_interval == 0
            ):
                reader.next_segment()
                eobrun = 0
            blocks_seen += 1
            blk = plane[by, bx]
            if ah == 0:
                # ---- AC first pass (G.1.2.2): spectral band + EOB runs
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_decode(reader, ac_t)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.receive(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC index overflow in progressive scan")
                    blk[k] = _extend(reader.receive(s), s) << al
                    k += 1
            else:
                # ---- AC refinement (G.1.2.3): corrections + new ±1<<al
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _huff_decode(reader, ac_t)
                        r, s = rs >> 4, rs & 0xF
                        val = 0
                        if s == 0:
                            if r < 15:
                                # note: NO -1 here, unlike the first-pass
                                # EOBn — the symbol is read at the FIRST
                                # run block and the shared post-loop below
                                # decrements for it (T.81 G.1.2.3 /
                                # libjpeg's split of the run bookkeeping)
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.receive(r)
                                break
                            # r == 15: ZRL in refinement — skip 16
                            # zero-history coefficients (with corrections)
                        else:
                            # s must be 1: a newly-significant coefficient
                            val = p1 if reader.read_bit() else m1
                        while k <= se:
                            cur = int(blk[k])
                            if cur != 0:
                                if reader.read_bit() and (cur & p1) == 0:
                                    blk[k] = cur + (p1 if cur >= 0 else m1)
                            else:
                                if r == 0:
                                    if s:
                                        blk[k] = val
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if eobrun > 0:
                    # end-of-band: apply correction bits to the rest
                    while k <= se:
                        cur = int(blk[k])
                        if cur != 0:
                            if reader.read_bit() and (cur & p1) == 0:
                                blk[k] = cur + (p1 if cur >= 0 else m1)
                        k += 1
                    eobrun -= 1


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


def _prepare_components(img: np.ndarray, quality: int, subsampling: str = "444"):
    """Color-convert, subsample, pad, forward-DCT and quantize: returns
    (comps, qts, h, w, nc, mcux, mcuy) with each comp carrying its
    zigzag ``blocks`` array — the shared front half of the baseline and
    progressive encoders."""
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
    return comps, qts, h, w, nc, mcux, mcuy


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
    comps, qts, h, w, nc, mcux, mcuy = _prepare_components(img, quality, subsampling)

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


# ------------------------------------------------------- progressive encode


def _emit_eob_events(events, cls, eobrun, pending):
    """EOBn symbol (+ extension bits) for a pending EOB run, followed by
    any buffered correction bits (T.81 G.1.2.2-3 / the libjpeg
    emit_eobrun shape)."""
    if eobrun > 0:
        nb = eobrun.bit_length() - 1
        events.append(("sym", ("ac", cls), nb << 4))
        if nb:
            events.append(("raw", eobrun - (1 << nb), nb))
        for b in pending:
            events.append(("raw", b, 1))
        pending.clear()
    return 0


def _progressive_scan_events(kind, scomps, band, ah, al):
    """Entropy events for one progressive scan: ('sym', (tc_name, cls),
    symbol) and ('raw', value, nbits).  ``scomps`` is [(comp, cls,
    units)] where units iterates (block_row, block_col) in the scan's
    block order; for interleaved DC scans the caller passes a single
    merged unit list tagged per component."""
    events: list = []
    ss, se = band
    if kind == "dc_first":
        pred = {}
        for comp, cls, by, bx in scomps:
            blk0 = int(comp["blocks"][by, bx][0]) >> al
            diff = blk0 - pred.get(id(comp), 0)
            pred[id(comp)] = blk0
            size, bits = _mag(diff)
            events.append(("sym", ("dc", cls), size))
            if size:
                events.append(("raw", bits, size))
    elif kind == "dc_refine":
        for comp, cls, by, bx in scomps:
            events.append(("raw", (int(comp["blocks"][by, bx][0]) >> al) & 1, 1))
    elif kind == "ac_first":
        comp, cls = scomps[0][0], scomps[0][1]
        eobrun = 0
        for _, _, by, bx in scomps:
            blk = comp["blocks"][by, bx]
            r = 0
            for k in range(ss, se + 1):
                c = int(blk[k])
                mag = abs(c) >> al
                if mag == 0:
                    r += 1
                    continue
                eobrun = _emit_eob_events(events, cls, eobrun, [])
                while r > 15:
                    events.append(("sym", ("ac", cls), 0xF0))
                    r -= 16
                v = mag if c > 0 else -mag
                size, bits = _mag(v)
                events.append(("sym", ("ac", cls), (r << 4) | size))
                events.append(("raw", bits, size))
                r = 0
            if r > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun = _emit_eob_events(events, cls, eobrun, [])
        _emit_eob_events(events, cls, eobrun, [])
    elif kind == "ac_refine":
        comp, cls = scomps[0][0], scomps[0][1]
        eobrun = 0
        pending: list = []  # correction bits owned by the pending EOB run
        for _, _, by, bx in scomps:
            blk = comp["blocks"][by, bx]
            absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            eob = -1  # band offset of the LAST newly-significant coef
            for i, t in enumerate(absv):
                if t == 1:
                    eob = i
            br: list = []
            r = 0
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob:
                    eobrun = _emit_eob_events(events, cls, eobrun, pending)
                    events.append(("sym", ("ac", cls), 0xF0))
                    r -= 16
                    for b in br:
                        events.append(("raw", b, 1))
                    br = []
                if t > 1:
                    br.append(t & 1)
                    continue
                eobrun = _emit_eob_events(events, cls, eobrun, pending)
                events.append(("sym", ("ac", cls), (r << 4) | 1))
                events.append(("raw", 1 if int(blk[ss + i]) > 0 else 0, 1))
                for b in br:
                    events.append(("raw", b, 1))
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                pending.extend(br)
                if eobrun == 0x7FFF:
                    eobrun = _emit_eob_events(events, cls, eobrun, pending)
        _emit_eob_events(events, cls, eobrun, pending)
    else:
        raise ValueError(kind)
    return events


def encode_jpeg_progressive(img: np.ndarray, quality: int = 85) -> bytes:
    """Encode as PROGRESSIVE JPEG (SOF2), grayscale or 4:4:4 color, with
    a libjpeg-style scan script exercising every progressive mode:

    1. DC, all components interleaved, Al=1
    2. per component: AC 1..5  first pass, Al=2
    3. per component: AC 6..63 first pass, Al=2
    4. per component: AC 1..63 refinement Ah=2 -> Al=1
    5. per component: AC 1..63 refinement Ah=1 -> Al=0
    6. DC refinement, all components, Ah=1 -> Al=0

    After scan 6 every coefficient is fully refined, so decoding must
    reproduce the BASELINE encode of the same image bit-for-bit (same
    quantized coefficients) — which is exactly what the round-trip test
    asserts.  Test-vector generator first, reference encoder second;
    no restart intervals."""
    comps, qts, h, w, nc, mcux, mcuy = _prepare_components(img, quality, "444")
    for ci, c in enumerate(comps):
        c["id"] = ci + 1
        c["cls"] = 0 if ci == 0 else 1

    def mcu_units():
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                for c in comps:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            units.append((c, c["cls"], my * c["v"] + v, mx * c["h"] + hh))
        return units

    def comp_units(c):
        # 4:4:4 / grayscale only here: non-interleaved grid == MCU grid
        bh, bw = c["blocks"].shape[:2]
        return [(c, c["cls"], by, bx) for by in range(bh) for bx in range(bw)]

    scans = [("dc_first", mcu_units(), (0, 0), 0, 1, comps)]
    for c in comps:
        scans.append(("ac_first", comp_units(c), (1, 5), 0, 2, [c]))
    for c in comps:
        scans.append(("ac_first", comp_units(c), (6, 63), 0, 2, [c]))
    for c in comps:
        scans.append(("ac_refine", comp_units(c), (1, 63), 2, 1, [c]))
    for c in comps:
        scans.append(("ac_refine", comp_units(c), (1, 63), 1, 0, [c]))
    scans.append(("dc_refine", mcu_units(), (0, 0), 1, 0, comps))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq in sorted({c["tq"] for c in comps}):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(v) for v in qts[tq][:64]
        )
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2

    for kind, units, band, ah, al, scomps in scans:
        events = _progressive_scan_events(kind, units, band, ah, al)
        # per-scan Huffman tables for the symbol classes actually used
        used: dict = {}
        for ev in events:
            if ev[0] == "sym":
                used.setdefault(ev[1], set()).add(ev[2])
        tabs = {key: _fixed_len_table(syms) for key, syms in used.items()}
        for (tc_name, cls), (bits, vals, _enc) in sorted(tabs.items()):
            tc = 0 if tc_name == "dc" else 1
            body = bytes([(tc << 4) | cls]) + bytes(bits) + vals
            out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
        sos = bytes([len(scomps)])
        for c in scomps:
            sos += bytes([c["id"], (c["cls"] << 4) | c["cls"]])
        sos += bytes([band[0], band[1], (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        writer = _BitWriter()
        for ev in events:
            if ev[0] == "sym":
                ln, code = tabs[ev[1]][2][ev[2]]
                writer.write(code, ln)
            else:
                _, value, n = ev
                if n:
                    writer.write(value, n)
        writer.flush()
        out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
