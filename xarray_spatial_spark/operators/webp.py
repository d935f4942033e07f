"""Pure-numpy WebP *lossless* (VP8L) codec — the multimodal tier's
RIFF boundary, implemented from the public VP8L bitstream spec from
scratch (no codec libraries in this image; reference repo has no
image codecs at all).

Scope (documented, tested):

- decode: full entropy layer (canonical Huffman with simple and
  normal code-length coding, meta-Huffman groups, color cache, LZ77
  backward references with plain distances AND the spec's 120-entry
  short-distance neighborhood map) and ALL FOUR inverse transforms —
  SUBTRACT_GREEN, PREDICTOR, COLOR (cross-color, signed 3.5
  fixed-point per-block multipliers), COLOR_INDEXING (delta-coded
  palette with packed-index width reduction).  Truncated payloads
  raise (the bit reader tracks the true bit length) instead of
  decoding fabricated zero bits.
- encode: plain, subtract-green, or palette (COLOR_INDEXING) streams
  with one Huffman group and normal code-length coding; optional
  greedy LZ77 backward references (plain distances, lengths <= 4096)
  and color cache with an exact simulation of the decoder's insert
  rule — streams decode bit-exact through both this decoder and the
  system libwebp.  Not emitted (decode-only): predictor/cross-color
  transforms, meta-Huffman groups, the short-distance map.

Lossy VP8 chunks are OUTSIDE the from-scratch scope (a DCT codec):
they decode through the SYSTEM libwebp via ctypes when one is
installed (no Python bindings needed), else raise by name — never
corrupt.  The pure-numpy VP8L path above is itself cross-validated
against libwebp-encoded real streams in
tests/test_webp_libwebp_oracle.py.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct

import numpy as np

_LIBWEBP: object = "unset"


def _libwebp():
    """The system libwebp shared library (ctypes) or None; cached.
    Used ONLY for lossy VP8 (and as a test oracle) — VP8L always
    decodes through the pure-numpy path."""
    global _LIBWEBP
    if _LIBWEBP == "unset":
        _LIBWEBP = None
        for name in ("libwebp.so.7", "libwebp.so", "libwebp.dylib",
                     ctypes.util.find_library("webp")):
            if not name:
                continue
            try:
                lw = ctypes.CDLL(name)
                lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
                lw.WebPDecodeRGBA.argtypes = [
                    ctypes.c_char_p, ctypes.c_size_t,
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int)]
                _LIBWEBP = lw
                break
            except OSError:
                continue
    return _LIBWEBP


def _decode_rgba_libwebp(buf: bytes) -> np.ndarray:
    lw = _libwebp()
    w, h = ctypes.c_int(), ctypes.c_int()
    p = lw.WebPDecodeRGBA(buf, len(buf), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise ValueError("libwebp failed to decode WebP payload")
    out = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
    lw.WebPFree(p)
    return out

# code-length-code read order (VP8L spec)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class _BitReader:
    """LSB-first bit reader over bytes.  ``bits`` grabs up to 41 bits
    in one slice+shift (the per-bit loop was the decoder's hot spot);
    ``peek16``/``skip`` serve the table-driven Huffman reader."""

    def __init__(self, buf: bytes):
        self.limit = len(buf) * 8  # true bit length: reads past it raise
        self.buf = buf + b"\x00" * 8  # peek overruns past the end
        self.pos = 0  # bit position

    def bits(self, n: int) -> int:
        byte = self.pos >> 3
        off = self.pos & 7
        chunk = int.from_bytes(self.buf[byte:byte + 6], "little") >> off
        self.pos += n
        if self.pos > self.limit:
            raise ValueError("truncated VP8L payload")
        return chunk & ((1 << n) - 1)

    def peek16(self) -> int:
        byte = self.pos >> 3
        off = self.pos & 7
        return (int.from_bytes(self.buf[byte:byte + 4], "little") >> off) & 0xFFFF

    def skip(self, n: int) -> None:
        self.pos += n
        if self.pos > self.limit:
            raise ValueError("truncated VP8L payload")


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def bits(self, v: int, n: int) -> None:
        for i in range(n):
            self.cur |= ((v >> i) & 1) << self.nbits
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur)
            self.cur = 0
            self.nbits = 0
        return bytes(self.out)


class _Huffman:
    """Canonical prefix code: decode by accumulating bits MSB-first
    (each successive stream bit descends the tree)."""

    def __init__(self, lengths):
        lengths = list(lengths)
        self.single = None
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if len(used) == 1:
            # one-symbol code reads/writes ZERO bits per symbol
            self.single = used[0][1]
            self.codes = {self.single: (0, 0)}
            return
        # canonical assignment: by length, then symbol order
        self.table: dict[tuple[int, int], int] = {}
        code = 0
        max_len = max(l for l, _ in used)
        bl_count = [0] * (max_len + 1)
        for l, _ in used:
            bl_count[l] += 1
        next_code = [0] * (max_len + 2)
        for l in range(1, max_len + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        for s, l in enumerate(lengths):
            if l > 0:
                self.table[(l, next_code[l])] = s
                next_code[l] += 1
        # encoder side: symbol -> (code, len)
        self.codes = {s: None for s in range(len(lengths))}
        for (l, c), s in self.table.items():
            self.codes[s] = (c, l)
        # table-driven decode: a 2^max_len LUT keyed by the RAW peeked
        # bit pattern (stream bits are LSB-first; a canonical code's
        # first-read bit is its MSB, so the key is the bit-reversed
        # code padded with every possible completion).  One peek + one
        # lookup per symbol instead of a per-bit tree walk — measured
        # ~4x on full-image literal streams.
        self.max_len = max_len
        lut = np.zeros(1 << max_len, dtype=np.uint32)  # (sym << 5) | len
        for (l, c), sym in self.table.items():
            rev = 0
            for i in range(l):
                rev |= ((c >> i) & 1) << (l - 1 - i)
            step = 1 << l
            lut[rev::step] = (sym << 5) | l
        self.lut = lut

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        entry = int(self.lut[br.peek16() & ((1 << self.max_len) - 1)])
        length = entry & 31
        if length == 0:
            raise ValueError("corrupt VP8L: bad huffman code")
        br.skip(length)
        return entry >> 5

    def write(self, bw: _BitWriter, sym: int) -> None:
        c, l = self.codes[sym]
        # codes are consumed MSB-first by the reader
        for i in range(l - 1, -1, -1):
            bw.bits((c >> i) & 1, 1)


def _read_code_lengths(br: _BitReader, alphabet_size: int) -> list[int]:
    """The 'normal' code: code-length-code lengths, then RLE-coded
    symbol code lengths (VP8L spec)."""
    n_cl = br.bits(4) + 4
    cl_lengths = [0] * 19
    for i in range(n_cl):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl_tree = _Huffman(cl_lengths)

    if br.bits(1):  # use max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size

    lengths = [0] * alphabet_size
    symbol = 0
    prev = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_tree.read(br)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.bits(2)
            lengths[symbol:symbol + rep] = [prev] * min(rep, alphabet_size - symbol)
            symbol += rep
        elif s == 17:
            symbol += 3 + br.bits(3)
        else:
            symbol += 11 + br.bits(7)
    return lengths


def _read_huffman(br: _BitReader, alphabet_size: int) -> _Huffman:
    if br.bits(1):  # simple code
        n_sym = br.bits(1) + 1
        if br.bits(1):  # first symbol is 8 bits
            s0 = br.bits(8)
        else:
            s0 = br.bits(1)
        lengths = [0] * alphabet_size
        if n_sym == 1:
            lengths[s0] = 1
        else:
            s1 = br.bits(8)
            lengths[s0] = 1
            lengths[s1] = 1
        return _Huffman(lengths)
    return _Huffman(_read_code_lengths(br, alphabet_size))


def _prefix_value(br: _BitReader, sym: int) -> int:
    """LZ77 length / distance prefix decoding (VP8L spec)."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.bits(extra) + 1


def _short_dist_table() -> list[tuple[int, int]]:
    """The VP8L short-distance neighborhood map: distance codes 1..120
    address nearby pixels as (dx, dy) offsets instead of plain
    distances.  The spec's table enumerates the 120 offsets with
    dy in 0..7 and dx in -7..8 (dx >= 1 when dy == 0), ordered by
    increasing squared Euclidean distance, ties broken by |dx|
    ascending then positive dx before negative — generating it from
    that rule reproduces the published table exactly (first rows:
    (0,1),(1,0),(1,1),(-1,1),(0,2),(2,0),(1,2),(-1,2),(2,1),(-2,1)…)
    and is property-tested in test_webp.py."""
    pts = [
        (x, y)
        for y in range(8)
        for x in range(-7, 9)
        if not (y == 0 and x < 1)
    ]
    pts.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1],
                            abs(p[0]), 0 if p[0] > 0 else 1))
    return pts


_SHORT_DIST = _short_dist_table()

_PRED_BLACK = (255, 0, 0, 0)  # (a, r, g, b) opaque black


def _avg2(a, b):
    return (int(a) + int(b)) // 2


def _clamp_add_sub_full(c, a, b):
    return min(255, max(0, int(a) + int(c) - int(b)))


def _clamp_add_sub_half(ave, b):
    # spec / libwebp ClampedAddSubtractHalf: ave is ALREADY
    # Average2(left, top); the correction term divides with C
    # truncation toward zero, not Python floor
    d = int(ave) - int(b)
    half = d // 2 if d >= 0 else -((-d) // 2)
    return min(255, max(0, int(ave) + half))


def _predict(mode: int, px, left, top, topleft, topright):
    """VP8L predictor modes (spec 0..13) on (a, r, g, b) tuples."""
    if mode == 0:
        return _PRED_BLACK
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return tuple(_avg2(_avg2(left[i], topright[i]), top[i]) for i in range(4))
    if mode == 6:
        return tuple(_avg2(left[i], topleft[i]) for i in range(4))
    if mode == 7:
        return tuple(_avg2(left[i], top[i]) for i in range(4))
    if mode == 8:
        return tuple(_avg2(topleft[i], top[i]) for i in range(4))
    if mode == 9:
        return tuple(_avg2(top[i], topright[i]) for i in range(4))
    if mode == 10:
        return tuple(
            _avg2(_avg2(left[i], topleft[i]), _avg2(top[i], topright[i]))
            for i in range(4)
        )
    if mode == 11:  # Select
        p_l = sum(abs(int(top[i]) - int(topleft[i])) for i in range(4))
        p_t = sum(abs(int(left[i]) - int(topleft[i])) for i in range(4))
        return left if p_l < p_t else top
    if mode == 12:
        return tuple(
            _clamp_add_sub_full(top[i], left[i], topleft[i]) for i in range(4)
        )
    if mode == 13:
        return tuple(
            _clamp_add_sub_half(_avg2(left[i], top[i]), topleft[i])
            for i in range(4)
        )
    raise ValueError(f"bad predictor mode {mode}")


def _decode_entropy_image(br: _BitReader, w: int, h: int) -> np.ndarray:
    """Recursive: subimages (predictor image, meta-huffman image) are
    themselves VP8L-entropy-coded images WITHOUT transforms."""
    return _decode_image_data(br, w, h, allow_meta=False)


def _decode_image_data(
    br: _BitReader, w: int, h: int, allow_meta: bool = True
) -> np.ndarray:
    """Entropy-coded ARGB image -> (h, w, 4) uint8 [a, r, g, b]."""
    cache_bits = 0
    cache = None
    if br.bits(1):
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("corrupt VP8L: cache_bits")
        cache = np.zeros(1 << cache_bits, dtype=np.uint32)

    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.bits(1):
        meta_bits = br.bits(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_image(br, mw, mh)
        meta = (meta_img[:, :, 1].astype(np.int64) << 8) | meta_img[:, :, 2]
        n_groups = int(meta.max()) + 1

    cache_size = (1 << cache_bits) if cache_bits else 0
    sizes = [256 + 24 + cache_size, 256, 256, 256, 40]
    groups = []
    for _ in range(n_groups):
        groups.append([_read_huffman(br, s) for s in sizes])

    out = np.zeros((h, w, 4), dtype=np.uint8)
    n_px = w * h
    pos = 0
    flat = out.reshape(-1, 4)

    def emit(pos: int, a: int, r: int, g: int, b: int) -> None:
        flat[pos] = (a, r, g, b)
        if cache is not None:
            argb = (a << 24) | (r << 16) | (g << 8) | b
            idx = (np.uint64(0x1E35A7BD) * np.uint64(argb)) & np.uint64(0xFFFFFFFF)
            cache[int(idx) >> (32 - cache_bits)] = argb

    while pos < n_px:
        if meta is not None:
            y, x = divmod(pos, w)
            gidx = int(meta[y >> meta_bits, x >> meta_bits])
        else:
            gidx = 0
        g_tree, r_tree, b_tree, a_tree, d_tree = groups[gidx]
        s = g_tree.read(br)
        if s < 256:
            g = s
            r = r_tree.read(br)
            b = b_tree.read(br)
            a = a_tree.read(br)
            emit(pos, a, r, g, b)
            pos += 1
        elif s < 256 + 24:
            length = _prefix_value(br, s - 256)
            dist_code = _prefix_value(br, d_tree.read(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _SHORT_DIST[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos:
                raise ValueError("corrupt VP8L: LZ77 before start")
            for i in range(length):
                src = flat[pos - dist]
                emit(pos, int(src[0]), int(src[1]), int(src[2]), int(src[3]))
                pos += 1
                if pos >= n_px:
                    break
        else:
            if cache is None:
                raise ValueError("corrupt VP8L: cache symbol, no cache")
            argb = int(cache[s - 256 - 24])
            emit(pos, (argb >> 24) & 255, (argb >> 16) & 255,
                 (argb >> 8) & 255, argb & 255)
            pos += 1
    return out



def _inverse_predictor(img: np.ndarray, modes: np.ndarray,
                       size_bits: int) -> np.ndarray:
    """Predictor inverse, row-by-row with per-BLOCK-SEGMENT dispatch:
    a row crosses block columns whose modes are constant per segment;
    segments whose mode only reads the PREVIOUS row (0/2/3/4/8/9)
    apply as one vectorized slice op, mode 1 (left) is a mod-256
    cumulative sum, and only the genuinely left-recurrent modes
    (5-7, 10-13) fall back to a scalar walk.  ~30x over the original
    per-pixel loop on common streams."""
    hh, ww = img.shape[:2]
    a = img.astype(np.int64)
    res = np.empty_like(a)
    block = 1 << size_bits

    # row 0: left-chain from opaque black = residual cumsum + black
    row = a[0].copy()
    row[0] = (row[0] + np.asarray(_PRED_BLACK, dtype=np.int64)) & 255
    res[0] = np.cumsum(row, axis=0) & 255

    for y in range(1, hh):
        prev = res[y - 1]
        res[y, 0] = (a[y, 0] + prev[0]) & 255   # col 0 predicts from top
        # topright of the last column: the spec's upper_row[width]
        # aliases the CURRENT row's col-0 pixel (libwebp row layout),
        # which is already decoded by the line above
        tr_row = np.empty_like(prev)
        tr_row[:-1] = prev[1:]
        tr_row[-1] = res[y, 0]
        x = 1
        while x < ww:
            seg_end = min(((x >> size_bits) + 1) * block, ww)
            mode = int(modes[y >> size_bits, x >> size_bits])
            sl = slice(x, seg_end)
            if mode == 0:
                res[y, sl] = (a[y, sl]
                              + np.asarray(_PRED_BLACK, np.int64)) & 255
            elif mode == 2:
                res[y, sl] = (a[y, sl] + prev[sl]) & 255
            elif mode == 3:
                res[y, sl] = (a[y, sl] + tr_row[sl]) & 255
            elif mode == 4:
                res[y, sl] = (a[y, sl] + prev[x - 1:seg_end - 1]) & 255
            elif mode == 8:
                p = (prev[x - 1:seg_end - 1] + prev[sl]) // 2
                res[y, sl] = (a[y, sl] + p) & 255
            elif mode == 9:
                p = (prev[sl] + tr_row[sl]) // 2
                res[y, sl] = (a[y, sl] + p) & 255
            elif mode == 1:
                # res[x] = (r[x] + res[x-1]) mod 256 — cumsum chain
                # seeded by the segment's left neighbor
                seg = a[y, sl].copy()
                seg[0] = (seg[0] + res[y, x - 1]) & 255
                res[y, sl] = np.cumsum(seg, axis=0) & 255
            else:
                # left-recurrent modes: scalar walk within the segment
                for xi in range(x, seg_end):
                    left = tuple(res[y, xi - 1])
                    top = tuple(prev[xi])
                    topleft = tuple(prev[xi - 1])
                    topright = tuple(tr_row[xi])
                    pred = _predict(mode, None, left, top, topleft, topright)
                    res[y, xi] = (a[y, xi]
                                  + np.asarray(pred, dtype=np.int64)) & 255
            x = seg_end
    return res.astype(np.uint8)

def decode_vp8l(data: bytes) -> np.ndarray:
    """VP8L chunk payload -> (h, w, 4) uint8 RGBA."""
    br = _BitReader(data)
    if br.bits(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bits(1)  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("bad VP8L version")

    # transforms are read at the CURRENT effective width: a
    # color-indexing transform with packed indices SHRINKS the width
    # for everything read after it (later transforms' block subimages
    # and the main image); inverses run in reverse read order and
    # restore the width step by step
    transforms = []
    xsize = w
    while br.bits(1):
        ttype = br.bits(2)
        if ttype == 2:  # SUBTRACT_GREEN
            transforms.append(("subtract_green", None))
        elif ttype == 0:  # PREDICTOR
            size_bits = br.bits(3) + 2
            bw_ = (xsize + (1 << size_bits) - 1) >> size_bits
            bh_ = (h + (1 << size_bits) - 1) >> size_bits
            pred_img = _decode_entropy_image(br, bw_, bh_)
            transforms.append(("predictor", (size_bits, pred_img[:, :, 2])))
        elif ttype == 1:  # COLOR (cross-color)
            size_bits = br.bits(3) + 2
            bw_ = (xsize + (1 << size_bits) - 1) >> size_bits
            bh_ = (h + (1 << size_bits) - 1) >> size_bits
            cte = _decode_entropy_image(br, bw_, bh_)
            transforms.append(("color", (size_bits, cte)))
        else:  # COLOR_INDEXING
            n_colors = br.bits(8) + 1
            pal_img = _decode_entropy_image(br, n_colors, 1)[0]  # (n, 4) argb
            # palette entries are component-delta-coded
            pal = pal_img.astype(np.int64)
            for i in range(1, n_colors):
                pal[i] = (pal[i] + pal[i - 1]) & 255
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            full_w = xsize
            xsize = (xsize + (1 << width_bits) - 1) >> width_bits
            transforms.append(
                ("color_indexing", (pal.astype(np.uint8), width_bits, full_w))
            )

    img = _decode_image_data(br, xsize, h)  # (h, xsize, 4) a,r,g,b

    for name, arg in reversed(transforms):
        if name == "subtract_green":
            g = img[:, :, 2].astype(np.int64)
            img[:, :, 1] = (img[:, :, 1] + g) & 255
            img[:, :, 3] = (img[:, :, 3] + g) & 255
        elif name == "color":
            size_bits, cte = arg
            hh, ww = img.shape[:2]
            by = np.arange(hh) >> size_bits
            bx = np.arange(ww) >> size_bits
            # per-block signed 3.5 fixed-point multipliers: stored as
            # blue = green_to_red, green = green_to_blue, red = red_to_blue
            g2r = cte[:, :, 3].astype(np.int8)[np.ix_(by, bx)].astype(np.int64)
            g2b = cte[:, :, 2].astype(np.int8)[np.ix_(by, bx)].astype(np.int64)
            r2b = cte[:, :, 1].astype(np.int8)[np.ix_(by, bx)].astype(np.int64)
            green_s = img[:, :, 2].astype(np.int8).astype(np.int64)
            red = (img[:, :, 1].astype(np.int64)
                   + ((g2r * green_s) >> 5)) & 255
            red_s = red.astype(np.uint8).astype(np.int8).astype(np.int64)
            blue = (img[:, :, 3].astype(np.int64)
                    + ((g2b * green_s) >> 5) + ((r2b * red_s) >> 5)) & 255
            img[:, :, 1] = red.astype(np.uint8)
            img[:, :, 3] = blue.astype(np.uint8)
        elif name == "color_indexing":
            pal, width_bits, full_w = arg
            hh = img.shape[0]
            packed = img[:, :, 2]  # indices ride the green channel
            if width_bits:
                ppu = 1 << width_bits
                bits = 8 >> width_bits
                mask = (1 << bits) - 1
                shifts = (np.arange(ppu) * bits)[None, None, :]
                idx = ((packed[:, :, None].astype(np.int64) >> shifts)
                       & mask).reshape(hh, -1)[:, :full_w]
            else:
                idx = packed
            oob = idx >= len(pal)
            out = pal[np.minimum(idx, len(pal) - 1)]
            if oob.any():
                out[oob] = 0  # spec: out-of-range index -> transparent black
            img = out
        elif name == "predictor":
            size_bits, modes = arg
            img = _inverse_predictor(img, modes, size_bits)

    # (a, r, g, b) -> RGBA
    return img[:, :, [1, 2, 3, 0]]


def decode_webp(buf: bytes) -> np.ndarray:
    """RIFF/WEBP container -> (h, w, 4) uint8 RGBA.

    Lossless VP8L decodes through the from-scratch pure-numpy path
    (including inside VP8X extended containers).  Lossy ``VP8 ``
    frames route the WHOLE file through the system libwebp (so an
    accompanying ALPH chunk is honored) when one is installed, else
    raise the codec boundary by name."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        payload = buf[pos + 8:pos + 8 + size]
        if tag == b"VP8L":
            return decode_vp8l(payload)
        if tag == b"VP8 ":
            if _libwebp() is not None:
                return _decode_rgba_libwebp(buf)
            raise NotImplementedError(
                "lossy VP8 WebP needs a DCT codec (no system libwebp "
                "found); lossless VP8L decodes natively"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8L chunk in WebP container")


# ---------------------------------------------------------------------------
# encoder (1 group, normal codes; optional LZ77 + color cache)
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: list[int], max_len: int = 15) -> list[int]:
    """Code lengths from symbol frequencies: heap Huffman with depth
    accounting.  Raises past ``max_len`` instead of silently emitting
    an invalid (Kraft-violating) code — 8-bit alphabets over image
    planes never get near depth 15 in practice."""
    import heapq

    out = [0] * len(freqs)
    used = [(f, s) for s, f in enumerate(freqs) if f > 0]
    if not used:
        return out
    if len(used) == 1:
        out[used[0][1]] = 1
        return out
    heap = [(f, i, [s]) for i, (f, s) in enumerate(used)]
    heapq.heapify(heap)
    depth = {s: 0 for _, s in used}
    tie = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, tie, s1 + s2))
        tie += 1
    for s, d in depth.items():
        if d > max_len:
            raise ValueError(f"huffman depth {d} exceeds {max_len}")
        out[s] = d
    return out


def _write_huffman(bw: _BitWriter, lengths: list[int]) -> _Huffman:
    """Write a 'normal' code (code-length-code + plain per-symbol
    lengths, no RLE) and return the canonical tree for symbol writes."""
    bw.bits(0, 1)  # not simple
    cl_freq = [0] * 19
    for l in lengths:
        cl_freq[l] += 1
    cl_len = _huffman_lengths(cl_freq, max_len=7)
    bw.bits(19 - 4, 4)
    for sym in _CL_ORDER:
        bw.bits(cl_len[sym], 3)
    cl_tree = _Huffman(cl_len)
    bw.bits(0, 1)  # no max_symbol shortcut
    for l in lengths:
        cl_tree.write(bw, l)
    return _Huffman(lengths)


def _write_literal_planes(bw: _BitWriter, g, r, b, a, main: bool) -> None:
    """Literal-only entropy-coded image body: no cache, no LZ77; one
    huffman group.  ``main`` images carry the meta-huffman bit,
    entropy subimages (palette, predictor) don't."""
    bw.bits(0, 1)  # no color cache
    if main:
        bw.bits(0, 1)  # no meta-huffman
    planes = [np.asarray(g).ravel(), np.asarray(r).ravel(),
              np.asarray(b).ravel(), np.asarray(a).ravel()]
    sizes = [256 + 24, 256, 256, 256, 40]
    trees = []
    for i, size in enumerate(sizes):
        freqs = [0] * size
        if i < 4:
            vals, counts = np.unique(planes[i], return_counts=True)
            for v, c in zip(vals, counts):
                freqs[int(v)] = int(c)
        else:
            freqs[0] = 1  # unused distance tree still needs a code
        trees.append(_write_huffman(bw, _huffman_lengths(freqs)))
    gt, rt, bt, at, _ = trees
    for i in range(len(planes[0])):
        gt.write(bw, int(planes[0][i]))
        rt.write(bw, int(planes[1][i]))
        bt.write(bw, int(planes[2][i]))
        at.write(bw, int(planes[3][i]))


def _prefix_code(v: int) -> tuple[int, int, int]:
    """Inverse of :func:`_prefix_value`: value >= 1 -> (symbol,
    n_extra_bits, extra_value).  Exhaustively round-trip-tested against
    the decoder over the whole length range."""
    if v <= 4:
        return v - 1, 0, 0
    u = v - 1
    e = u.bit_length() - 2
    if u < 3 << e:
        return 2 * e + 2, e, u - (2 << e)
    return 2 * e + 3, e, u - (3 << e)


def _cache_slot(argb: int, cache_bits: int) -> int:
    """The VP8L color-cache hash slot (mirrors the decoder's emit)."""
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _lz77_tokenize(
    argb: list[int], w: int, cache_bits: int = 0, min_len: int = 3
) -> list[tuple]:
    """Greedy LZ77 over the ARGB pixel stream with an exact simulation
    of the decoder's color cache (every EMITTED pixel inserts, copies
    included).  Tokens: ('lit', argb) | ('copy', length, dist) |
    ('cache', slot).  Hash-chain matcher on 3-pixel keys; plain
    distances only (code = dist + 120 — spec-valid; the 120-entry
    neighborhood map is an optional compaction the decoder also
    accepts).  Length capped at 4096 and dist at the 40-symbol
    ceiling, the alphabet bounds."""
    n = len(argb)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    # seen[slot] tracks whether the slot was ever written: slot 0
    # holds argb 0 only after an actual insert
    seen = [False] * (1 << cache_bits) if cache_bits else None
    chains: dict[tuple[int, int, int], list[int]] = {}
    toks: list[tuple] = []
    pos = 0

    def insert(p: int) -> None:
        if cache is not None:
            s = _cache_slot(argb[p], cache_bits)
            cache[s] = argb[p]
            seen[s] = True
        if p + 2 < n:
            key = (argb[p], argb[p + 1], argb[p + 2])
            lst = chains.setdefault(key, [])
            lst.append(p)
            if len(lst) > 16:
                lst.pop(0)

    max_dist = (1 << 20) - 120  # 40 distance symbols
    while pos < n:
        best_len, best_dist = 0, 0
        if pos + 2 < n:
            for cand in reversed(chains.get(
                    (argb[pos], argb[pos + 1], argb[pos + 2]), ())):
                dist = pos - cand
                if dist > max_dist:
                    continue
                ln = 0
                limit = min(n - pos, 4096)
                while ln < limit and argb[cand + ln] == argb[pos + ln]:
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
        if best_len >= min_len:
            toks.append(("copy", best_len, best_dist))
            for i in range(best_len):
                insert(pos + i)
            pos += best_len
            continue
        if cache is not None:
            s = _cache_slot(argb[pos], cache_bits)
            if seen[s] and cache[s] == argb[pos]:
                toks.append(("cache", s))
                insert(pos)
                pos += 1
                continue
        toks.append(("lit", argb[pos]))
        insert(pos)
        pos += 1
    return toks


def _write_image_body(
    bw: _BitWriter, argb: list[int], w: int, main: bool,
    cache_bits: int = 0, lz77: bool = False,
) -> None:
    """Entropy-coded image body with optional LZ77 backward references
    and color cache (one huffman group, plain distances).  Replaces
    the literal-only body when either feature is on; emits the exact
    inverse of the decoder loop above, so round-trips are
    pixel-exact."""
    bw.bits(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.bits(cache_bits, 4)
    if main:
        bw.bits(0, 1)  # no meta-huffman
    toks = _lz77_tokenize(argb, w, cache_bits) if (lz77 or cache_bits) else [
        ("lit", v) for v in argb]

    cache_size = (1 << cache_bits) if cache_bits else 0
    sizes = [256 + 24 + cache_size, 256, 256, 256, 40]
    freqs = [[0] * s for s in sizes]
    for t in toks:
        if t[0] == "lit":
            v = t[1]
            freqs[0][(v >> 8) & 255] += 1
            freqs[1][(v >> 16) & 255] += 1
            freqs[2][v & 255] += 1
            freqs[3][(v >> 24) & 255] += 1
        elif t[0] == "copy":
            ls, _, _ = _prefix_code(t[1])
            ds, _, _ = _prefix_code(t[2] + 120)
            freqs[0][256 + ls] += 1
            freqs[4][ds] += 1
        else:
            freqs[0][256 + 24 + t[1]] += 1
    if not any(freqs[4]):
        freqs[4][0] = 1  # unused distance tree still needs a code
    for i in (1, 2, 3):
        if not any(freqs[i]):
            freqs[i][0] = 1
    trees = [_write_huffman(bw, _huffman_lengths(f)) for f in freqs]
    gt, rt, bt, at, dt = trees
    for t in toks:
        if t[0] == "lit":
            v = t[1]
            gt.write(bw, (v >> 8) & 255)
            rt.write(bw, (v >> 16) & 255)
            bt.write(bw, v & 255)
            at.write(bw, (v >> 24) & 255)
        elif t[0] == "copy":
            ls, le, lv = _prefix_code(t[1])
            gt.write(bw, 256 + ls)
            if le:
                bw.bits(lv, le)
            ds, de, dv = _prefix_code(t[2] + 120)
            dt.write(bw, ds)
            if de:
                bw.bits(dv, de)
        else:
            gt.write(bw, 256 + 24 + t[1])


def encode_webp_lossless(
    img: np.ndarray, subtract_green: bool = False, palette: bool = False,
    lz77: bool = False, color_cache_bits: int = 0,
) -> bytes:
    """(h, w, 3|4) uint8 -> lossless WebP.

    ``palette=True`` writes a COLOR_INDEXING stream (requires <= 256
    distinct colors; indices packed per the spec's width reduction) —
    the shape every palette-ish web image uses.  ``lz77=True`` emits
    greedy backward references (plain distances, lengths <= 4096);
    ``color_cache_bits`` in 1..11 adds the color cache with an exact
    simulation of the decoder's insert rule.  Both compose with
    SUBTRACT_GREEN and palette packing; streams decode bit-exact
    through :func:`decode_vp8l` AND the system libwebp (oracle
    tests).  Default remains plain literals."""
    if not 0 <= color_cache_bits <= 11:
        raise ValueError("color_cache_bits must be 0..11")
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w = img.shape[:2]
    if w > 16384 or h > 16384:
        raise ValueError(
            f"VP8L dimension limit is 16384, got {w}x{h} "
            "(14-bit header fields would silently wrap)"
        )
    if img.shape[2] == 3:
        alpha = np.full((h, w), 255, dtype=np.uint8)
        rgba = np.dstack([img, alpha])
    else:
        rgba = img

    bw = _BitWriter()
    bw.bits(0x2F, 8)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(int((rgba[:, :, 3] != 255).any()), 1)
    bw.bits(0, 3)  # version

    if palette:
        colors, inv = np.unique(
            rgba.reshape(-1, 4), axis=0, return_inverse=True
        )
        n = len(colors)
        if n > 256:
            raise ValueError(f"palette encoding needs <= 256 colors, got {n}")
        idx = inv.reshape(h, w).astype(np.int64)
        bw.bits(1, 1)  # transform present
        bw.bits(3, 2)  # COLOR_INDEXING
        bw.bits(n - 1, 8)
        # palette subimage: 1 x n, (a, r, g, b) component-delta-coded
        pal = colors[:, [3, 0, 1, 2]].astype(np.int64)  # argb
        delta = pal.copy()
        delta[1:] = (pal[1:] - pal[:-1]) & 255
        _write_literal_planes(
            bw, delta[:, 2], delta[:, 1], delta[:, 3], delta[:, 0],
            main=False,
        )
        bw.bits(0, 1)  # no more transforms
        if n <= 2:
            width_bits = 3
        elif n <= 4:
            width_bits = 2
        elif n <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            ppu = 1 << width_bits
            bits = 8 >> width_bits
            wd = (w + ppu - 1) // ppu
            pad = np.zeros((h, wd * ppu), dtype=np.int64)
            pad[:, :w] = idx
            packed = np.zeros((h, wd), dtype=np.int64)
            for k in range(ppu):
                packed |= pad[:, k::ppu] << (k * bits)
        else:
            wd = w
            packed = idx
        if lz77 or color_cache_bits:
            argb = ((np.int64(255) << 24) | (packed << 8)).ravel().tolist()
            _write_image_body(bw, argb, wd, main=True,
                              cache_bits=color_cache_bits, lz77=lz77)
        else:
            zero = np.zeros((h, wd), dtype=np.int64)
            _write_literal_planes(
                bw, packed, zero, zero, np.full((h, wd), 255, np.int64),
                main=True)
    else:
        r = rgba[:, :, 0].astype(np.int64)
        g = rgba[:, :, 1].astype(np.int64)
        b = rgba[:, :, 2].astype(np.int64)
        a = rgba[:, :, 3].astype(np.int64)
        if subtract_green:
            r = (r - g) & 255
            b = (b - g) & 255
            bw.bits(1, 1)  # transform present
            bw.bits(2, 2)  # SUBTRACT_GREEN
        bw.bits(0, 1)  # no more transforms
        if lz77 or color_cache_bits:
            argb = ((a << 24) | (r << 16) | (g << 8) | b).ravel().tolist()
            _write_image_body(bw, argb, w, main=True,
                              cache_bits=color_cache_bits, lz77=lz77)
        else:
            _write_literal_planes(bw, g, r, b, a, main=True)

    payload = bw.finish()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
