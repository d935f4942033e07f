"""Property-based tests (hypothesis) for the pure-numpy kernels —
no SparkSession, so these run in milliseconds and explore the input
space the example-based suites can't."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from xarray_spatial_spark import grid


@settings(max_examples=200, deadline=None)
@given(st.integers(0, grid.MAX_ZOOM), st.data())
def test_grid_encode_decode_roundtrip(zoom, data):
    n = 1 << zoom
    xt = data.draw(st.lists(st.integers(0, n - 1), min_size=1, max_size=20))
    yt = data.draw(st.lists(st.integers(0, n - 1), min_size=len(xt),
                            max_size=len(xt)))
    cells = grid.encode(np.array(xt), np.array(yt), zoom)
    dx, dy, dz = grid.decode(cells)
    assert (dx == np.array(xt)).all()
    assert (dy == np.array(yt)).all()
    assert (dz == zoom).all()


@settings(max_examples=100, deadline=None)
@given(st.floats(-180, 180, allow_nan=False), st.floats(-89, 89, allow_nan=False),
       st.integers(1, grid.MAX_ZOOM))
def test_grid_parent_contains_child(lon, lat, zoom):
    cell = grid.cell_of(np.array([lon]), np.array([lat]), zoom)
    par = grid.parent(cell, zoom - 1)
    cx, cy, _ = grid.decode(cell)
    px, py, _ = grid.decode(par)
    assert (px == cx // 2).all() and (py == cy // 2).all()
    # and the parent computed directly from coordinates agrees
    direct = grid.cell_of(np.array([lon]), np.array([lat]), zoom - 1)
    assert (par == direct).all()


@settings(max_examples=100, deadline=None)
@given(st.integers(2, 8), st.data())
def test_gif_lzw_roundtrip(min_code, data):
    from xarray_spatial_spark.operators.multimodal import (
        _gif_lzw_decode, _gif_lzw_encode,
    )

    n_vals = 1 << min_code
    idx = data.draw(st.lists(st.integers(0, n_vals - 1), min_size=1,
                             max_size=400))
    arr = np.array(idx, dtype=np.uint8)
    out = _gif_lzw_decode(_gif_lzw_encode(arr, min_code), min_code, len(arr))
    assert (out == arr).all()


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_jpeg_dct_inverse_and_magnitude_coding(data):
    from xarray_spatial_spark.operators import jpeg

    vals = data.draw(st.lists(
        st.floats(-1000, 1000, allow_nan=False, width=32),
        min_size=64, max_size=64))
    blk = np.array(vals).reshape(8, 8)
    np.testing.assert_allclose(jpeg.idct2(jpeg.fdct2(blk)), blk, atol=1e-8)
    v = data.draw(st.integers(-32767, 32767))
    s = jpeg._size_of(abs(v))
    if s:
        coded = v if v >= 0 else v + (1 << s) - 1
        assert jpeg._extend(coded, s) == v


@settings(max_examples=50, deadline=None)
@given(st.integers(1, 200))
def test_gif_interlace_is_permutation(h):
    from xarray_spatial_spark.operators.multimodal import _gif_interlace_rows

    rows = _gif_interlace_rows(h)
    assert sorted(rows) == list(range(h))


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 10**7), st.integers(0, 63))
def test_simhash_band_plan_valid(n_docs, d):
    from xarray_spatial_spark.functions.dedup import simhash_band_plan

    nb, c = simhash_band_plan(max(n_docs, 1), d)
    assert c == nb - d >= 1
    assert nb <= 64
    import math
    # chosen alternatives respect the table cap; the minimal layout may not
    assert nb == d + 1 or math.comb(nb, c) <= 35


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_kll_rank_error_bound_random_distributions(data):
    """KLL rank error stays inside a generous 4/k band on arbitrary
    multisets (uniform, clustered, constant runs, adversarial order)."""
    from xarray_spatial_spark.functions.sketch import KLL

    vals = data.draw(st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1, max_size=4000))
    k = data.draw(st.sampled_from([32, 64, 128]))
    sk = KLL(k)
    # feed in arbitrary chunk sizes to exercise compaction timing
    i = 0
    while i < len(vals):
        step = data.draw(st.integers(1, 500))
        sk.update(np.array(vals[i:i + step]))
        i += step
    assert sk.n == len(vals)
    s = np.sort(np.array(vals))
    band = max(4.0 / k, 1.0 / len(s)) + 0.08
    for q in (0.1, 0.5, 0.9):
        est = sk.quantiles([q])[0]
        # with duplicates a value occupies a rank INTERVAL; the
        # estimate is correct when q falls within `band` of it
        lo = np.searchsorted(s, est, side="left") / len(s)
        hi = np.searchsorted(s, est, side="right") / len(s)
        dist = max(lo - q, q - hi, 0.0)
        assert dist <= band, (q, lo, hi, est)


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_kmv_union_algebra(data):
    """Union is commutative, associative, idempotent, and equals the
    sketch of the concatenated sets; cardinality of a sub-k sketch is
    exact."""
    from xarray_spatial_spark.functions import sketch as sk_mod

    def mk(ids):
        # independent "hash": splitmix of the ids, like the build's
        # xxhash64 — uniform uint64, deterministic
        from xarray_spatial_spark.functions.dedup import _splitmix64
        h = _splitmix64(np.array(sorted(set(ids)), np.uint64))
        return np.sort(np.unique(h))[:16]

    a = mk(data.draw(st.lists(st.integers(0, 10**9), max_size=60)))
    b = mk(data.draw(st.lists(st.integers(0, 10**9), max_size=60)))
    c = mk(data.draw(st.lists(st.integers(0, 10**9), max_size=60)))
    u = sk_mod.kmv_union
    assert np.array_equal(u(a, b, 16), u(b, a, 16))
    assert np.array_equal(u(u(a, b, 16), c, 16), u(a, u(b, c, 16), 16))
    assert np.array_equal(u(a, a, 16), a)
    both = np.sort(np.unique(np.concatenate([a, b])))[:16]
    assert np.array_equal(u(a, b, 16), both)
    if a.size < 16:
        assert sk_mod.kmv_cardinality(a, 16) == float(a.size)


@settings(max_examples=150, deadline=None)
@given(st.integers(-324000000, 324000000), st.integers(-648000000, 648000000))
def test_exif_gps_roundtrip_any_coordinate(lat_cs, lon_cs):
    """Any (lat, lon) in centi-arcseconds encodes (independent
    writer) and parses back to the exact DMS arithmetic."""
    import struct

    from xarray_spatial_spark.operators.exif import parse_exif

    def dms(cs):
        cs = abs(cs)
        d, rem = divmod(cs, 360000)
        m, s100 = divmod(rem, 6000)
        return [(d, 1), (m, 1), (s100, 100)]

    def rat(pairs):
        return b"".join(struct.pack("<II", a, b) for a, b in pairs)

    def ifd(entries, off):
        n = len(entries)
        base = off + 2 + 12 * n + 4
        body, heap = b"", b""
        for tag, typ, cnt, payload in entries:
            unit = {2: 1, 4: 4, 5: 8}[typ]
            if unit * cnt <= 4:
                body += (struct.pack("<HHI", tag, typ, cnt)
                         + payload + b"\x00" * (4 - len(payload)))
            else:
                body += (struct.pack("<HHI", tag, typ, cnt)
                         + struct.pack("<I", base + len(heap)))
                heap += payload
        return struct.pack("<H", n) + body + struct.pack("<I", 0) + heap

    ifd0 = ifd([(0x8825, 4, 1, struct.pack("<I", 8 + 2 + 12 + 4))], 8)
    gps = ifd([
        (1, 2, 2, (b"N" if lat_cs >= 0 else b"S") + b"\x00"),
        (2, 5, 3, rat(dms(lat_cs))),
        (3, 2, 2, (b"E" if lon_cs >= 0 else b"W") + b"\x00"),
        (4, 5, 3, rat(dms(lon_cs))),
    ], 8 + 2 + 12 + 4)
    tiff = b"II" + struct.pack("<HI", 42, 8) + ifd0 + gps
    payload = b"Exif\x00\x00" + tiff
    jpeg = (b"\xff\xd8\xff\xe1" + struct.pack(">H", len(payload) + 2)
            + payload + b"\xff\xd9")
    got = parse_exif(jpeg)

    def expect(cs):
        a = abs(cs)
        d, rem = divmod(a, 360000)
        m, s100 = divmod(rem, 6000)
        deg = d + m / 60.0 + (s100 / 100) / 3600.0
        return -deg if cs < 0 else deg

    assert got["lat"] == expect(lat_cs)
    assert got["lon"] == expect(lon_cs)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_exif_parser_never_raises_on_garbage(blob):
    from xarray_spatial_spark.operators.exif import parse_exif

    parse_exif(blob)  # any outcome but an exception
    parse_exif(b"\xff\xd8" + blob)
    parse_exif(b"II*\x00" + blob)


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_crawl_delay_parser_never_raises_and_respects_groups(data):
    from xarray_spatial_spark.functions.robots import parse_crawl_delay

    lines = data.draw(st.lists(st.sampled_from([
        "User-agent: *", "User-agent: bot", "Crawl-delay: 2",
        "Crawl-delay: 0.5", "Crawl-delay: nope", "Disallow: /x",
        "# comment", "", ":", "Crawl-delay:", "User-agent:",
    ]), max_size=20))
    d = parse_crawl_delay("\n".join(lines), "bot")
    assert d is None or d >= 0
