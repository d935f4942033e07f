"""VP8L (lossless WebP) codec: encoder/decoder round trips plus
hand-woven bitstreams exercising the decoder paths the fixture
encoder never emits (LZ77 refs, color cache, simple codes,
meta-Huffman groups, predictor transform).

Honesty note: with no codec library in this image there are no
third-party lossless WebP fixtures; the hand-woven streams are built
directly from the public bitstream layout (bit-level, not via the
encoder), so encoder/decoder bugs cannot cancel for those paths — but
a shared misreading of the spec itself would.  The one named-boundary
path left (lossy VP8) raises rather than corrupts; truncated payloads
raise."""

import struct

import numpy as np
import pytest

from xarray_spatial_spark.operators.webp import (
    _BitReader,
    _BitWriter,
    _Huffman,
    _huffman_lengths,
    _write_huffman,
    decode_vp8l,
    decode_webp,
    encode_webp_lossless,
)


def _vp8l_header(bw, w, h):
    bw.bits(0x2F, 8)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(0, 1)
    bw.bits(0, 3)


def _tree(bw, pairs, size):
    """Write a normal-coded tree holding the given {sym: freq}."""
    freqs = [0] * size
    for s, f in pairs.items():
        freqs[s] = f
    return _write_huffman(bw, _huffman_lengths(freqs))


def test_roundtrip_shapes_and_modes():
    rng = np.random.default_rng(1)
    for h, w in [(1, 1), (2, 3), (13, 29), (64, 48)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        for sg in (False, True):
            out = decode_webp(encode_webp_lossless(img, subtract_green=sg))
            np.testing.assert_array_equal(out[:, :, :3], img)
            assert (out[:, :, 3] == 255).all()


def test_roundtrip_alpha():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (9, 7, 4)).astype(np.uint8)
    np.testing.assert_array_equal(decode_webp(encode_webp_lossless(img)), img)


def test_lz77_backward_reference():
    """1x4 image: literal pixel then a length-3 dist-1 copy -> AAAA."""
    bw = _BitWriter()
    _vp8l_header(bw, 4, 1)
    bw.bits(0, 1)  # no transforms
    bw.bits(0, 1)  # no cache
    bw.bits(0, 1)  # no meta
    g = _tree(bw, {10: 1, 256 + 2: 1}, 256 + 24)  # literal G=10, len-code 3
    r = _tree(bw, {20: 1}, 256)
    b = _tree(bw, {30: 1}, 256)
    a = _tree(bw, {255: 1}, 256)
    d = _tree(bw, {13: 1}, 40)  # dist prefix 13 (+5 extra bits)
    g.write(bw, 10)
    r.write(bw, 20)
    b.write(bw, 30)
    a.write(bw, 255)
    g.write(bw, 256 + 2)        # length = 3
    d.write(bw, 13)
    bw.bits(24, 5)              # 96 + 24 + 1 = dist_code 121 -> dist 1
    out = decode_vp8l(bw.finish())
    assert out.shape == (1, 4, 4)
    for x in range(4):
        assert tuple(out[0, x]) == (20, 10, 30, 255)


def test_color_cache_hit():
    """Literal pixel, then a cache-index symbol re-emits it."""
    argb = (255 << 24) | (20 << 16) | (10 << 8) | 30
    cache_bits = 4
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = _BitWriter()
    _vp8l_header(bw, 2, 1)
    bw.bits(0, 1)
    bw.bits(1, 1)               # color cache
    bw.bits(cache_bits, 4)
    bw.bits(0, 1)               # no meta
    size_g = 256 + 24 + (1 << cache_bits)
    g = _tree(bw, {10: 1, 256 + 24 + int(idx): 1}, size_g)
    r = _tree(bw, {20: 1}, 256)
    b = _tree(bw, {30: 1}, 256)
    a = _tree(bw, {255: 1}, 256)
    _tree(bw, {0: 1}, 40)
    g.write(bw, 10)
    r.write(bw, 20)
    b.write(bw, 30)
    a.write(bw, 255)
    g.write(bw, 256 + 24 + int(idx))
    out = decode_vp8l(bw.finish())
    assert tuple(out[0, 0]) == tuple(out[0, 1]) == (20, 10, 30, 255)


def test_simple_codes_one_and_two_symbols():
    """All five trees simple-coded; 1x2 image of two literals."""
    bw = _BitWriter()
    _vp8l_header(bw, 2, 1)
    bw.bits(0, 1)
    bw.bits(0, 1)
    bw.bits(0, 1)
    # green: simple, two symbols 7 and 9 (8-bit first)
    bw.bits(1, 1); bw.bits(1, 1); bw.bits(1, 1)
    bw.bits(7, 8); bw.bits(9, 8)
    # red: simple, one symbol 1 (1-bit first-symbol form)
    bw.bits(1, 1); bw.bits(0, 1); bw.bits(0, 1); bw.bits(1, 1)
    # blue: simple, one symbol 200
    bw.bits(1, 1); bw.bits(0, 1); bw.bits(1, 1); bw.bits(200, 8)
    # alpha: simple, one symbol 255
    bw.bits(1, 1); bw.bits(0, 1); bw.bits(1, 1); bw.bits(255, 8)
    # dist: simple, one symbol 0
    bw.bits(1, 1); bw.bits(0, 1); bw.bits(0, 1); bw.bits(0, 1)
    # pixels: greens 7 then 9 (two-symbol code: 1 bit each, canonical
    # order -> 7 gets code 0, 9 gets code 1); r/b/a/dist read 0 bits
    bw.bits(0, 1)
    bw.bits(1, 1)
    out = decode_vp8l(bw.finish())
    assert tuple(out[0, 0]) == (1, 7, 200, 255)   # RGBA
    assert tuple(out[0, 1]) == (1, 9, 200, 255)


def test_meta_huffman_two_groups():
    """8x1 image, meta block size 4 -> two huffman groups with
    different fixed colors; the meta image routes pixels to groups."""
    bw = _BitWriter()
    _vp8l_header(bw, 8, 1)
    bw.bits(0, 1)  # no transforms
    bw.bits(0, 1)  # no cache
    bw.bits(1, 1)  # meta-huffman
    bw.bits(0, 3)  # meta_bits = 2 -> block 4 -> meta image 2x1
    # --- meta image (recursive, no meta of its own) ---
    bw.bits(0, 1)  # no cache
    mg = _tree(bw, {0: 1, 1: 1}, 256 + 24)  # green = low byte of group
    mr = _tree(bw, {0: 1}, 256)
    mb = _tree(bw, {0: 1}, 256)
    ma = _tree(bw, {255: 1}, 256)
    _tree(bw, {0: 1}, 40)
    for gi in (0, 1):
        mg.write(bw, gi)
        mr.write(bw, 0)
        mb.write(bw, 0)
        ma.write(bw, 255)
    # --- two groups for the main image ---
    trees = []
    for colors in [(1, 2, 3), (4, 5, 6)]:  # (g, r, b) per group
        g = _tree(bw, {colors[0]: 1}, 256 + 24)
        r = _tree(bw, {colors[1]: 1}, 256)
        b = _tree(bw, {colors[2]: 1}, 256)
        a = _tree(bw, {255: 1}, 256)
        _tree(bw, {0: 1}, 40)
        trees.append((g, r, b, a))
    for x in range(8):
        g, r, b, a = trees[0] if x < 4 else trees[1]
        gs = 1 if x < 4 else 4
        g.write(bw, gs)
        r.write(bw, 2 if x < 4 else 5)
        b.write(bw, 3 if x < 4 else 6)
        a.write(bw, 255)
    out = decode_vp8l(bw.finish())
    for x in range(8):
        want = (2, 1, 3, 255) if x < 4 else (5, 4, 6, 255)  # RGBA
        assert tuple(out[0, x]) == want, (x, tuple(out[0, x]))


def _forward_predict(img_argb: np.ndarray, mode: int, size_bits: int):
    """Test-side forward predictor (residual builder) mirroring the
    spec's scan rules: (0,0) from opaque black, row 0 from left,
    col 0 from top, else the block's mode."""
    from xarray_spatial_spark.operators.webp import _PRED_BLACK, _predict

    h, w = img_argb.shape[:2]
    res = np.zeros_like(img_argb)
    for y in range(h):
        for x in range(w):
            if y == 0 and x == 0:
                pred = _PRED_BLACK
            elif y == 0:
                pred = tuple(img_argb[0, x - 1])
            elif x == 0:
                pred = tuple(img_argb[y - 1, 0])
            else:
                left = tuple(img_argb[y, x - 1])
                top = tuple(img_argb[y - 1, x])
                topleft = tuple(img_argb[y - 1, x - 1])
                # spec: upper_row[width] aliases current_row[0], so
                # the last column's topright is THIS row's col-0 pixel
                topright = (
                    tuple(img_argb[y - 1, x + 1]) if x + 1 < w
                    else tuple(img_argb[y, 0])
                )
                pred = _predict(mode, None, left, top, topleft, topright)
            res[y, x] = (img_argb[y, x].astype(np.int64)
                         - np.asarray(pred, dtype=np.int64)) & 255
    return res


def test_clamp_add_sub_half_spec_values():
    """Direct spec check of predictor 13 (the round-3 review found the
    first cut re-averaging with topleft and using floor division):
    pred = Clamp(ave + trunc((ave - TL) / 2)), ave = Average2(L, T)."""
    from xarray_spatial_spark.operators.webp import (
        _avg2, _clamp_add_sub_half)

    # L = T = 100, TL = 50 -> ave 100, d 50 -> 125
    assert _clamp_add_sub_half(_avg2(100, 100), 50) == 125
    # negative correction truncates toward zero: ave 10, TL 15 ->
    # d = -5, trunc(-5/2) = -2 -> 8 (floor would give 7)
    assert _clamp_add_sub_half(10, 15) == 8
    # clamping both ends
    assert _clamp_add_sub_half(250, 0) == 255
    assert _clamp_add_sub_half(2, 200) == 0


@pytest.mark.parametrize("mode", [1, 2, 3, 5, 6, 7, 9, 10, 11, 12, 13])
def test_predictor_transform(mode):
    """Residual stream + single-mode predictor image decodes back to
    the target (forward transform built independently in the test)."""
    rng = np.random.default_rng(mode)
    h, w = 4, 4
    target = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)  # a,r,g,b
    res = _forward_predict(target, mode, size_bits=2)

    bw = _BitWriter()
    _vp8l_header(bw, w, h)
    bw.bits(1, 1)   # transform present
    bw.bits(0, 2)   # PREDICTOR
    bw.bits(0, 3)   # size_bits = 2 -> block 4 -> 1x1 predictor image
    # predictor subimage: green = mode
    bw.bits(0, 1)   # no cache
    pg = _tree(bw, {mode: 1}, 256 + 24)
    pr = _tree(bw, {0: 1}, 256)
    pb = _tree(bw, {0: 1}, 256)
    pa = _tree(bw, {255: 1}, 256)
    _tree(bw, {0: 1}, 40)
    pg.write(bw, mode); pr.write(bw, 0); pb.write(bw, 0); pa.write(bw, 255)
    bw.bits(0, 1)   # no more transforms
    bw.bits(0, 1)   # no cache
    bw.bits(0, 1)   # no meta
    gt = _tree(bw, {int(v): 1 for v in np.unique(res[:, :, 2])}, 256 + 24)
    rt = _tree(bw, {int(v): 1 for v in np.unique(res[:, :, 1])}, 256)
    bt = _tree(bw, {int(v): 1 for v in np.unique(res[:, :, 3])}, 256)
    at = _tree(bw, {int(v): 1 for v in np.unique(res[:, :, 0])}, 256)
    _tree(bw, {0: 1}, 40)
    for y in range(h):
        for x in range(w):
            gt.write(bw, int(res[y, x, 2]))
            rt.write(bw, int(res[y, x, 1]))
            bt.write(bw, int(res[y, x, 3]))
            at.write(bw, int(res[y, x, 0]))
    out = decode_vp8l(bw.finish())  # RGBA
    np.testing.assert_array_equal(out[:, :, [3, 0, 1, 2]], target)


def test_named_boundaries(monkeypatch):
    from xarray_spatial_spark.operators import webp as W

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (4, 4, 3)).astype(np.uint8)
    good = encode_webp_lossless(img)
    lossy = good.replace(b"VP8L", b"VP8 ", 1)
    # without a system libwebp, lossy VP8 raises with the format named
    monkeypatch.setattr(W, "_LIBWEBP", None)
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_webp(lossy)
    # with libwebp present this fake-lossy stream is simply corrupt —
    # either way it never decodes silently
    monkeypatch.setattr(W, "_LIBWEBP", "unset")
    if W._libwebp() is not None:
        with pytest.raises(ValueError):
            decode_webp(lossy)
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00AVI ")


def test_multimodal_sniff_routes_webp():
    from xarray_spatial_spark.operators.multimodal import sniff_and_decode

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (6, 5, 3)).astype(np.uint8)
    out = sniff_and_decode(encode_webp_lossless(img))
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("n_colors,shape", [(2, (5, 9)), (4, (7, 6)),
                                            (16, (8, 11)), (200, (12, 13))])
def test_palette_roundtrip(n_colors, shape):
    """COLOR_INDEXING round trip across every packing width (8/4/2/1
    px per byte), odd widths included (packing pad)."""
    rng = np.random.default_rng(n_colors)
    pal = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
    idx = rng.integers(0, n_colors, shape)
    img = pal[idx]
    out = decode_webp(encode_webp_lossless(img, palette=True))
    np.testing.assert_array_equal(out[:, :, :3], img)
    assert (out[:, :, 3] == 255).all()


def test_color_transform_handwoven():
    """Cross-color (COLOR) inverse: residual stream + single-block
    multipliers decodes back to the target (forward transform done
    independently in the test, signed 3.5 fixed-point)."""
    rng = np.random.default_rng(9)
    h, w = 4, 4
    target = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)  # a,r,g,b
    g2r, g2b, r2b = 37, -12, 100  # int8 multipliers

    def s8(v):
        v = int(v) & 255
        return v - 256 if v >= 128 else v

    res = target.astype(np.int64).copy()
    for y in range(h):
        for x in range(w):
            a_, r_, g_, b_ = (int(v) for v in target[y, x])
            nr = (r_ - ((g2r * s8(g_)) >> 5)) & 255
            nb = (b_ - ((g2b * s8(g_)) >> 5) - ((r2b * s8(r_)) >> 5)) & 255
            res[y, x] = (a_, nr, g_, nb)

    bw = _BitWriter()
    _vp8l_header(bw, w, h)
    bw.bits(1, 1)   # transform present
    bw.bits(1, 2)   # COLOR
    bw.bits(0, 3)   # size_bits=2 -> one 4x4 block -> 1x1 subimage
    # cte pixel: blue=g2r, green=g2b, red=r2b (stored as uint8)
    bw.bits(0, 1)   # no cache (subimage)
    cg = _tree(bw, {g2b & 255: 1}, 256 + 24)
    cr = _tree(bw, {r2b & 255: 1}, 256)
    cb = _tree(bw, {g2r & 255: 1}, 256)
    ca = _tree(bw, {255: 1}, 256)
    _tree(bw, {0: 1}, 40)
    cg.write(bw, g2b & 255); cr.write(bw, r2b & 255)
    cb.write(bw, g2r & 255); ca.write(bw, 255)
    bw.bits(0, 1)   # no more transforms
    bw.bits(0, 1)   # no cache
    bw.bits(0, 1)   # no meta
    gt = _tree(bw, {int(v): 1 for v in np.unique(res[:, :, 2])}, 256 + 24)
    rt = _tree(bw, {int(v): 1 for v in np.unique(res[:, :, 1])}, 256)
    bt = _tree(bw, {int(v): 1 for v in np.unique(res[:, :, 3])}, 256)
    at = _tree(bw, {int(v): 1 for v in np.unique(res[:, :, 0])}, 256)
    _tree(bw, {0: 1}, 40)
    for y in range(h):
        for x in range(w):
            gt.write(bw, int(res[y, x, 2]))
            rt.write(bw, int(res[y, x, 1]))
            bt.write(bw, int(res[y, x, 3]))
            at.write(bw, int(res[y, x, 0]))
    out = decode_vp8l(bw.finish())  # RGBA
    np.testing.assert_array_equal(out[:, :, [3, 0, 1, 2]], target)


def test_inverse_predictor_vectorized_matches_naive():
    """Row/segment-vectorized predictor inverse == the naive per-pixel
    scan on random residuals with RANDOM per-block modes (stresses
    segment boundaries, row 0 / col 0 chains, topright wrap)."""
    from xarray_spatial_spark.operators.webp import (
        _PRED_BLACK, _inverse_predictor, _predict)

    rng = np.random.default_rng(21)
    hh, ww, size_bits = 21, 27, 2
    a = rng.integers(0, 256, (hh, ww, 4)).astype(np.uint8)
    modes = rng.integers(0, 14, ((hh >> size_bits) + 1,
                                 (ww >> size_bits) + 1)).astype(np.uint8)

    def naive(img):
        arr = img.astype(np.int64)
        res = np.empty_like(arr)
        for y in range(hh):
            for x in range(ww):
                if y == 0 and x == 0:
                    pred = _PRED_BLACK
                elif y == 0:
                    pred = tuple(res[0, x - 1])
                elif x == 0:
                    pred = tuple(res[y - 1, 0])
                else:
                    mode = int(modes[y >> size_bits, x >> size_bits])
                    left = tuple(res[y, x - 1])
                    top = tuple(res[y - 1, x])
                    topleft = tuple(res[y - 1, x - 1])
                    topright = (tuple(res[y - 1, x + 1]) if x + 1 < ww
                                else tuple(res[y, 0]))  # spec TR alias
                    pred = _predict(mode, None, left, top, topleft, topright)
                res[y, x] = (arr[y, x] + np.asarray(pred, np.int64)) & 255
        return res.astype(np.uint8)

    np.testing.assert_array_equal(
        _inverse_predictor(a, modes, size_bits), naive(a))


def test_short_dist_table_matches_spec():
    """The generated 120-entry neighborhood map has the spec's domain
    and ordering: dy 0..7, dx -7..8 (dx >= 1 on row 0), sorted by
    squared distance with |dx|-ascending / positive-first ties; the
    head must equal the published table rows verbatim."""
    from xarray_spatial_spark.operators.webp import _SHORT_DIST

    assert len(_SHORT_DIST) == 120
    assert len(set(_SHORT_DIST)) == 120
    d2 = [x * x + y * y for x, y in _SHORT_DIST]
    assert d2 == sorted(d2)
    for x, y in _SHORT_DIST:
        assert 0 <= y <= 7 and -7 <= x <= 8
        assert y > 0 or x >= 1
    assert _SHORT_DIST[:16] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    ]
    # spot-check published groups deeper in the table
    i25 = d2.index(25)
    assert _SHORT_DIST[i25:i25 + 6] == [
        (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0)]
    assert _SHORT_DIST[d2.index(64)] == (8, 0)
    assert _SHORT_DIST[-1] == (8, 7)


def test_short_distance_copy_row_above():
    """4x3 image: 4 literals then a length-8 copy with short-distance
    code 1 = (dx 0, dy 1) -> dist = w -> every row repeats row 0."""
    bw = _BitWriter()
    _vp8l_header(bw, 4, 3)
    bw.bits(0, 1)  # no transforms
    bw.bits(0, 1)  # no cache
    bw.bits(0, 1)  # no meta
    g = _tree(bw, {1: 1, 2: 1, 3: 1, 4: 1, 256 + 5: 1}, 256 + 24)
    r = _tree(bw, {7: 1}, 256)
    b = _tree(bw, {9: 1}, 256)
    a = _tree(bw, {255: 1}, 256)
    d = _tree(bw, {0: 1}, 40)  # dist prefix 0 -> dist_code 1 (short map)
    for gv in (1, 2, 3, 4):
        g.write(bw, gv); r.write(bw, 7); b.write(bw, 9); a.write(bw, 255)
    g.write(bw, 256 + 5)        # length prefix 5: 7 + extra bit
    bw.bits(1, 1)               # extra -> length 8
    d.write(bw, 0)              # short code 1 -> (0,1) -> dist 4
    out = decode_vp8l(bw.finish())
    assert out.shape == (3, 4, 4)
    for y in range(3):
        for x in range(4):
            assert tuple(out[y, x]) == (7, x + 1, 9, 255)


def test_short_distance_negative_dx_overlap():
    """Short code 4 = (dx -1, dy 1) -> dist = w - 1 = 3 on a 4-wide
    image; the length-4 copy overlaps its own output (LZ77 rule)."""
    bw = _BitWriter()
    _vp8l_header(bw, 4, 2)
    bw.bits(0, 1); bw.bits(0, 1); bw.bits(0, 1)
    g = _tree(bw, {1: 1, 2: 1, 3: 1, 4: 1, 256 + 3: 1}, 256 + 24)
    r = _tree(bw, {7: 1}, 256)
    b = _tree(bw, {9: 1}, 256)
    a = _tree(bw, {255: 1}, 256)
    d = _tree(bw, {3: 1}, 40)  # dist prefix 3 -> dist_code 4 (short map)
    for gv in (1, 2, 3, 4):
        g.write(bw, gv); r.write(bw, 7); b.write(bw, 9); a.write(bw, 255)
    g.write(bw, 256 + 3)        # length prefix 3 -> length 4, no extra
    d.write(bw, 3)              # short code 4 -> (-1,1) -> dist 3
    out = decode_vp8l(bw.finish())
    want_g = [2, 3, 4, 2]       # copies from pos 1,2,3 then own pos 4
    for x in range(4):
        assert tuple(out[1, x]) == (7, want_g[x], 9, 255)


def test_truncated_payload_raises():
    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    buf = encode_webp_lossless(img)
    (size,) = struct.unpack("<I", buf[16:20])
    payload = buf[20:20 + size]
    with pytest.raises(ValueError, match="truncated|corrupt"):
        decode_vp8l(payload[:len(payload) // 2])


def test_encode_dimension_guard():
    img = np.zeros((1, 16385, 3), np.uint8)
    with pytest.raises(ValueError, match="16384"):
        encode_webp_lossless(img)
    with pytest.raises(ValueError, match="16384"):
        encode_webp_lossless(np.zeros((16385, 1, 3), np.uint8))


# ---------------------------------------------------------------------------
# LZ77 + color-cache encoder
# ---------------------------------------------------------------------------


def test_prefix_code_inverse_exhaustive():
    """_prefix_code is the exact inverse of the decoder's
    _prefix_value over the whole length alphabet (1..4096) and the
    plain-distance range's first segment."""
    from xarray_spatial_spark.operators.webp import _prefix_code

    for v in list(range(1, 4097)) + [120 + 1, 120 + 997, 1 << 19]:
        sym, e, ev = _prefix_code(v)
        if sym < 4:
            assert (e, ev) == (0, 0) and sym + 1 == v
        else:
            extra = (sym - 2) >> 1
            offset = (2 + (sym & 1)) << extra
            assert e == extra and 0 <= ev < (1 << extra)
            assert offset + ev + 1 == v


@pytest.mark.parametrize("kw", [
    {"lz77": True},
    {"color_cache_bits": 6},
    {"lz77": True, "color_cache_bits": 5},
    {"lz77": True, "subtract_green": True},
    {"palette": True, "lz77": True},
])
def test_lz77_cache_roundtrip(kw):
    rng = np.random.default_rng(11)
    if kw.get("palette"):
        idx = rng.integers(0, 7, (45, 38), np.uint8)
        img = np.stack([idx * 30, idx * 20, 255 - idx * 10], 2).astype(np.uint8)
    else:
        img = np.tile(rng.integers(0, 256, (9, 11, 4), np.uint8), (5, 4, 1))
    out = decode_webp(encode_webp_lossless(img, **kw))
    want = img if img.shape[2] == 4 else np.dstack(
        [img, np.full(img.shape[:2], 255, np.uint8)])
    np.testing.assert_array_equal(out, want)


def test_lz77_compresses_repetitive_content():
    """The point of the upgrade: a tiled image must shrink an order of
    magnitude vs the literal-only stream."""
    rng = np.random.default_rng(3)
    img = np.tile(rng.integers(0, 256, (8, 8, 4), np.uint8), (8, 8, 1))
    lit = len(encode_webp_lossless(img))
    lz = len(encode_webp_lossless(img, lz77=True, color_cache_bits=6))
    assert lz < lit / 5, (lit, lz)


def test_cache_only_stream_uses_cache_symbols():
    """With few distinct colors and no LZ77, repeats must arrive as
    cache hits (mirrors the decoder's insert-on-every-emit rule)."""
    from xarray_spatial_spark.operators.webp import (_cache_slot,
                                                     _lz77_tokenize)

    # two colors in DISTINCT cache slots (same-slot pairs evict each
    # other every insert and legitimately never hit)
    a = 0xFF000011
    b = next(v for v in range(0xFF000012, 0xFF0000FF)
             if _cache_slot(v, 4) != _cache_slot(a, 4))
    argb = [a, b, a, b, a]
    toks = _lz77_tokenize(argb, 5, cache_bits=4, min_len=99)  # no copies
    kinds = [t[0] for t in toks]
    assert kinds[:2] == ["lit", "lit"] and set(kinds[2:]) == {"cache"}


def test_overlapping_copy_roundtrip():
    """dist < length (run-length shape) must round-trip: the decoder
    copies pixel-by-pixel, the encoder's match rule is equivalent."""
    img = np.full((1, 64, 4), 200, np.uint8)
    img[0, 0] = (1, 2, 3, 255)
    out = decode_webp(encode_webp_lossless(img, lz77=True))
    np.testing.assert_array_equal(out, img)


def test_encode_rejects_bad_cache_bits():
    img = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError):
        encode_webp_lossless(img, color_cache_bits=12)
