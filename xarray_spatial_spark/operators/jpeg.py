"""JPEG codec — pure stdlib + numpy (no codec libraries).

Decode: baseline (SOF0) and extended sequential (SOF1) including
non-interleaved multi-scan layouts, PLUS progressive (SOF2) with
spectral selection and successive approximation (T.81 Annex G) — the
dominant encoding of crawled web JPEGs; 8-bit, grayscale or YCbCr with
4:4:4 / 4:2:2 / 4:2:0 sampling, restart markers.  All scans accumulate
into per-component coefficient buffers; dequantize + batched IDCT run
once at EOI.  Encode: 4:4:4 / grayscale
with the JPEG Annex K example quantization + Huffman tables, for
round-trip tests and deterministic fixtures (JPEG is lossy: round
trips assert PSNR, not equality; the spec's maths — FDCT/IDCT pair,
zigzag, signed magnitude coding — are additionally property-tested
exactly).

Like the other native codecs this is the correctness path: per-symbol
Huffman work is plain Python over small images; pipeline throughput
comes from the Arrow batching in operators/multimodal.py, and a
production deployment would swap a codec library into the same
``sniff_and_decode`` seam.

Format facts from the public JPEG standard (ITU-T T.81): marker
layout, zigzag order, DC prediction, run/size AC coding, the Annex K
example tables.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i holds the (row*8+col) position of the
# i-th coefficient in scan order
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K example tables (public standard)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# standard Huffman specs: (bits[1..16] counts, symbol values)
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical Huffman per T.81 C.2."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lookup(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the decoder."""
    return {(ln, code): sym for sym, (code, ln) in _huff_codes(bits, values).items()}


# DCT basis: T[u, x] = a(u) cos((2x+1) u pi / 16); spatial = T.T @ F @ T
_T = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _T[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def idct2(F8: np.ndarray) -> np.ndarray:
    return _T.T @ F8 @ _T


def fdct2(f8: np.ndarray) -> np.ndarray:
    return _T @ f8 @ _T.T


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing and RSTn awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        if self.pos + 1 >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: caller resyncs
                return False
            else:  # a real marker terminates entropy data
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                # pad with zeros past the end (spec allows)
                self.acc <<= 8
                self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def resync(self) -> None:
        """Skip to just past the next RSTn marker, byte-aligned."""
        self.acc = 0
        self.nbits = 0
        while not (self.data[self.pos] == 0xFF
                   and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: s-bit magnitude -> signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _block_full(br, zz, dc_tbl, ac_tbl, pred, cid) -> None:
    """Sequential (baseline/extended) block: DC diff + run/size AC."""
    s = _decode_huff(br, dc_tbl)
    diff = _extend(br.read(s), s) if s else 0
    pred[cid] += diff
    zz[0] = pred[cid]
    k = 1
    while k < 64:
        rs = _decode_huff(br, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += r
        zz[k] = _extend(br.read(s), s)
        k += 1


def _block_dc_first(br, zz, dc_tbl, pred, cid, al) -> None:
    s = _decode_huff(br, dc_tbl)
    diff = _extend(br.read(s), s) if s else 0
    pred[cid] += diff
    zz[0] = pred[cid] << al


def _block_dc_refine(br, zz, al) -> None:
    if br.read(1):
        zz[0] |= 1 << al


def _block_ac_first(br, zz, ac_tbl, ss, se, al, eob_run) -> None:
    if eob_run[0]:
        eob_run[0] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huff(br, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eob_run[0] = (1 << r) - 1  # EOBn: this block + run-1 more
            if r:
                eob_run[0] += br.read(r)
            return
        k += r
        zz[k] = _extend(br.read(s), s) << al
        k += 1


def _block_ac_refine(br, zz, ac_tbl, ss, se, al, eob_run) -> None:
    """Successive-approximation AC refinement (T.81 G.1.2.3): new
    coefficients arrive as +-1<<Al; every already-nonzero coefficient
    traversed consumes one correction bit."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eob_run[0] == 0:
        while k <= se:
            rs = _decode_huff(br, ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:  # EOBn — includes THIS block: its remaining
                    # nonzero coefficients still take correction bits
                    eob_run[0] = 1 << r
                    if r:
                        eob_run[0] += br.read(r)
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            else:  # s == 1: a newly significant coefficient
                val = p1 if br.read(1) else m1
            while k <= se:
                if zz[k] != 0:
                    if br.read(1) and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                zz[k] = val
            k += 1
    if eob_run[0]:  # correction bits for the rest of an EOB-covered block
        while k <= se:
            if zz[k] != 0 and br.read(1) and (zz[k] & p1) == 0:
                zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eob_run[0] -= 1


def _decode_scan(buf, pos, scan, hdr, coefs, huff, restart, progressive,
                 ss, se, ah, al) -> int:
    """Decode one entropy-coded scan into the coefficient buffers;
    returns the offset of the next marker.  ``scan`` is
    [(cid, dc_table, ac_table)]; interleaved scans walk MCUs, single-
    component scans walk the component's own block raster (T.81 A.2)."""
    comps_by_id, w, h, hmax, vmax, mcux, mcuy = hdr
    br = _BitReader(buf, pos)
    pred = {cid: 0 for cid, _, _ in scan}
    eob_run = [0]

    def one_block(zz, cid, td, ta):
        if not progressive:
            _block_full(br, zz, huff[(0, td)], huff[(1, ta)], pred, cid)
        elif ss == 0:
            if ah == 0:
                _block_dc_first(br, zz, huff[(0, td)], pred, cid, al)
            else:
                _block_dc_refine(br, zz, al)
        elif ah == 0:
            _block_ac_first(br, zz, huff[(1, ta)], ss, se, al, eob_run)
        else:
            _block_ac_refine(br, zz, huff[(1, ta)], ss, se, al, eob_run)

    n_unit = 0
    if len(scan) == 1:
        cid, td, ta = scan[0]
        hs, vs, _tq = comps_by_id[cid]
        bw = (-(-w * hs // hmax) + 7) // 8
        bh = (-(-h * vs // vmax) + 7) // 8
        for by in range(bh):
            for bx in range(bw):
                if restart and n_unit and n_unit % restart == 0:
                    br.resync()
                    pred[cid] = 0
                    eob_run[0] = 0
                n_unit += 1
                one_block(coefs[cid][by, bx], cid, td, ta)
    else:
        if progressive and ss != 0:
            raise ValueError("progressive AC scans must be single-component")
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and n_unit and n_unit % restart == 0:
                    br.resync()
                    pred = {cid: 0 for cid, _, _ in scan}
                    eob_run[0] = 0
                n_unit += 1
                for cid, td, ta in scan:
                    hs, vs, _tq = comps_by_id[cid]
                    for by in range(vs):
                        for bx in range(hs):
                            one_block(
                                coefs[cid][my * vs + by, mx * hs + bx],
                                cid, td, ta,
                            )
    # skip any trailing bits/stuffing/RSTn up to the next true marker
    p = br.pos
    while p + 1 < len(buf):
        if (buf[p] == 0xFF and buf[p + 1] != 0x00
                and not 0xD0 <= buf[p + 1] <= 0xD7):
            break
        p += 1
    return p


def decode_jpeg(buf: bytes) -> np.ndarray:
    """JPEG -> (h, w) gray or (h, w, 3) RGB uint8.

    Baseline (SOF0) and extended sequential (SOF1) including
    non-interleaved / multi-scan layouts, and PROGRESSIVE (SOF2) with
    spectral selection + successive approximation — the dominant
    encoding of crawled web JPEGs.  All scans accumulate into per-
    component coefficient buffers; dequantization + a batched IDCT run
    once at EOI."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = []  # (id, hs, vs, tq)
    comps_by_id: dict[int, tuple[int, int, int]] = {}
    coefs: dict[int, np.ndarray] = {}
    h = w = 0
    restart = 0
    progressive = False
    hdr = None
    saw_scan = False
    while pos + 1 < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        if buf[pos + 1] == 0xFF:  # fill byte (T.81 B.1.1.2)
            pos += 1
            continue
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # TEM/RSTn/SOI: no body
            continue
        seg_len = struct.unpack(">H", buf[pos: pos + 2])[0]
        seg = buf[pos + 2: pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                tbl = np.zeros(64, dtype=np.int64)
                if pq:  # 16-bit table (T.81 B.2.4.1, Pq=1)
                    tbl[ZIGZAG] = np.frombuffer(
                        seg, ">u2", 64, p + 1).astype(np.int64)
                    p += 129
                else:
                    tbl[ZIGZAG] = np.frombuffer(seg, np.uint8, 64, p + 1)
                    p += 65
                qt[tq] = tbl.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit sample precision")
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            n = seg[5]
            for i in range(n):
                cid, hv, tq = seg[6 + 3 * i: 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
                comps_by_id[cid] = (hv >> 4, hv & 0x0F, tq)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for cid, hs, vs, _tq in comps:
                coefs[cid] = np.zeros((mcuy * vs, mcux * hs, 64), np.int32)
            hdr = (comps_by_id, w, h, hmax, vmax, mcux, mcuy)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG coding process (SOF marker 0x{marker:02X}: "
                "lossless/hierarchical/arithmetic)"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1: p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17: p + 17 + nv])
                huff[(tc, th)] = _huff_lookup(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if hdr is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            ss_, se_ = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = _decode_scan(
                buf, pos + seg_len, scan, hdr, coefs, huff, restart,
                progressive, ss_, se_, ahal >> 4, ahal & 0x0F,
            )
            saw_scan = True
            continue
        pos += seg_len
    if not saw_scan:
        raise ValueError("JPEG without scan data")

    # finish: un-zigzag, dequantize, batched IDCT, assemble planes
    planes = {}
    for cid, hs, vs, tq in comps:
        zzc = coefs[cid]
        bh, bw = zzc.shape[:2]
        nat = np.zeros((bh, bw, 64), np.float64)
        nat[..., ZIGZAG] = zzc
        F8 = nat.reshape(bh, bw, 8, 8) * qt[tq]
        sp = _T.T @ F8 @ _T + 128.0  # matmul broadcasts over (bh, bw)
        planes[cid] = sp.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)

    out_planes = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (4:4:4 / grayscale, Annex K tables) — fixtures + round trips
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int) -> None:
        self.acc = (self.acc << n) | code
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad per spec


def _size_of(v: int) -> int:
    return int(v).bit_length() if v else 0


def _encode_block(
    bw: _BitWriter, blk: np.ndarray, q: np.ndarray, pred: int,
    dc: dict, ac: dict,
) -> int:
    F8 = fdct2(blk.astype(np.float64) - 128.0)
    zz64 = np.round(F8 / q).astype(np.int64).reshape(-1)[ZIGZAG]
    dc_val = int(zz64[0])
    diff = dc_val - pred
    s = _size_of(abs(diff))
    code, ln = dc[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    last_nz = int(np.max(np.nonzero(zz64)[0])) if np.any(zz64) else 0
    k = 1
    while k <= last_nz:
        run = 0
        while zz64[k] == 0:
            run += 1
            k += 1
        while run >= 16:
            code, ln = ac[0xF0]
            bw.write(code, ln)
            run -= 16
        v = int(zz64[k])
        s = _size_of(abs(v))
        code, ln = ac[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        k += 1
    if last_nz < 63:
        code, ln = ac[0x00]
        bw.write(code, ln)
    return dc_val


def encode_jpeg(img: np.ndarray) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB -> baseline JPEG (4:4:4,
    Annex K tables)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    qts = [QUANT_LUMA] if gray else [QUANT_LUMA, QUANT_CHROMA]
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker])
                   + struct.pack(">H", len(body) + 2) + body)

    for tq, q in enumerate(qts):
        zz = q.reshape(-1)[ZIGZAG].astype(np.uint8)
        seg(0xDB, bytes([tq]) + zz.tobytes())
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    seg(0xC0, sof)
    tables = [(0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA)]
    if not gray:
        tables += [(0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA)]
    for tc, th, (bits, vals) in tables:
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    dc_tabs = [_huff_codes(*HUFF_DC_LUMA)] + (
        [] if gray else [_huff_codes(*HUFF_DC_CHROMA)] * 2)
    ac_tabs = [_huff_codes(*HUFF_AC_LUMA)] + (
        [] if gray else [_huff_codes(*HUFF_AC_CHROMA)] * 2)
    q_of = [QUANT_LUMA] + ([] if gray else [QUANT_CHROMA] * 2)
    bw = _BitWriter()
    preds = [0] * nc
    by = (h + 7) // 8
    bx = (w + 7) // 8
    padded = []
    for p in planes:
        pp = np.empty((by * 8, bx * 8))
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1: h, :]  # edge replicate
        pp[:, w:] = pp[:, w - 1: w]
        padded.append(pp)
    for yb in range(by):
        for xb in range(bx):
            for ci in range(nc):
                blk = padded[ci][yb * 8: yb * 8 + 8, xb * 8: xb * 8 + 8]
                preds[ci] = _encode_block(
                    bw, blk, q_of[ci], preds[ci], dc_tabs[ci], ac_tabs[ci],
                )
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
