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
