"""Focal/convolution goldens ported from reference
xrspatial/tests/test_focal.py (convolve fixtures :113-176, focal_stats
:353-394, hotspots :426-454) plus tiling-invariance checks that the
halo exchange is exact at tile edges and corners."""

import numpy as np
import pytest

from xarray_spatial_spark.operators import convolution as conv
from xarray_spatial_spark.operators import focal
from xarray_spatial_spark.raster import df_from_numpy, numpy_from_df

CONV_DATA = np.array(
    [
        [0.0, 1.0, 1.0, 1.0, 1.0, 1.0],
        [1.0, 0.0, 1.0, 1.0, 1.0, 1.0],
        [1.0, 1.0, 0.0, 1.0, 1.0, 1.0],
        [1.0, 1.0, 1.0, np.nan, 1.0, 1.0],
        [1.0, 1.0, 1.0, 1.0, 0.0, 1.0],
        [1.0, 1.0, 1.0, 1.0, 1.0, 0.0],
    ]
)


def _grid(df, col="value"):
    return numpy_from_df(df, value_col=col)


def test_kernels():
    # test_focal.py:126-135, 190-198
    np.testing.assert_allclose(
        conv.circle_kernel(1, 1, 1), np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    )
    np.testing.assert_allclose(
        conv.annulus_kernel(2, 2, 2, 1), np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]])
    )
    with pytest.raises(ValueError):
        conv.custom_kernel(np.ones((4, 6)))
    with pytest.raises(ValueError):
        conv.annulus_kernel(1, 1, 1, 2)


def test_kernel_from_distance_strings():
    k1 = conv.circle_kernel(1000, 1000, "2 km")
    assert k1.shape == (5, 5)
    assert conv._get_distance("1 mile") == pytest.approx(1609.344)


def test_convolution_circle_kernel(spark):
    # test_focal.py:139-149
    expected = np.array(
        [
            [np.nan] * 6,
            [np.nan, 4.0, 3.0, 5.0, 5.0, np.nan],
            [np.nan, 3.0, np.nan, np.nan, np.nan, np.nan],
            [np.nan, 5.0, np.nan, np.nan, np.nan, np.nan],
            [np.nan, 5.0, np.nan, np.nan, np.nan, np.nan],
            [np.nan] * 6,
        ]
    )
    df = df_from_numpy(spark, CONV_DATA, keep_nonfinite=False)
    got = _grid(conv.convolve_2d(df, conv.circle_kernel(1, 1, 1)))
    np.testing.assert_allclose(got, expected, equal_nan=True)


def test_convolution_custom_kernel(spark):
    # test_focal.py:164-176 — asymmetric kernel
    kernel = np.array([[1, 0, 0], [1, 1, 0], [1, 0, 0]])
    expected = np.array(
        [
            [np.nan] * 6,
            [np.nan, 2.0, 3.0, 3.0, 4.0, np.nan],
            [np.nan, 4.0, np.nan, np.nan, np.nan, np.nan],
            [np.nan, 4.0, np.nan, np.nan, np.nan, np.nan],
            [np.nan, 4.0, np.nan, np.nan, np.nan, np.nan],
            [np.nan] * 6,
        ]
    )
    df = df_from_numpy(spark, CONV_DATA)
    got = _grid(conv.convolve_2d(df, kernel))
    np.testing.assert_allclose(got, expected, equal_nan=True)


def test_focal_stats(spark):
    # test_focal.py:353-394
    data = np.arange(16).reshape(4, 4).astype(float)
    kernel = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 0]])
    df = df_from_numpy(spark, data)
    out = focal.focal_stats(df, kernel)
    expected = {
        "mean": [[0, 1, 2, 3], [4, 2.5, 3.5, 4.5], [8, 6.5, 7.5, 8.5], [12, 10.5, 11.5, 12.5]],
        "max": [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11], [12, 13, 14, 15]],
        "min": [[0, 1, 2, 3], [4, 0, 1, 2], [8, 4, 5, 6], [12, 8, 9, 10]],
        "range": [[0, 0, 0, 0], [0, 5, 5, 5], [0, 5, 5, 5], [0, 5, 5, 5]],
        "std": [[0, 0, 0, 0], [0, 2.5, 2.5, 2.5], [0, 2.5, 2.5, 2.5], [0, 2.5, 2.5, 2.5]],
        "var": [[0, 0, 0, 0], [0, 6.25, 6.25, 6.25], [0, 6.25, 6.25, 6.25], [0, 6.25, 6.25, 6.25]],
        "sum": [[0, 1, 2, 3], [4, 5, 7, 9], [8, 13, 15, 17], [12, 21, 23, 25]],
    }
    for name, want in expected.items():
        np.testing.assert_allclose(
            _grid(out, name), np.asarray(want, dtype=float), err_msg=name
        )


def test_hotspots(spark):
    # test_focal.py:426-454
    data = np.zeros((10, 10))
    data[1:4, 1:4] = 10000.0
    data[7:10, 7:10] = -10000.0
    data[0, 0] = np.nan
    data[4, 4] = np.nan
    data[5, 5] = np.nan
    data[6, 6] = np.nan
    kernel = np.array([[0.0, 1.0, 0.0], [1.0, 1.0, 1.0], [0.0, 1.0, 0.0]])
    expected = np.array(
        [
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 90, 0, 0, 0, 0, 0, 0, 0],
            [0, 90, 95, 90, 0, 0, 0, 0, 0, 0],
            [0, 0, 90, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, -90, 0],
            [0, 0, 0, 0, 0, 0, 0, -90, -95, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        ],
        dtype=float,
    )
    df = df_from_numpy(spark, data)
    got = _grid(focal.hotspots(df, kernel))
    np.testing.assert_allclose(got, expected)


def test_focal_mean_excludes_passthrough(spark):
    # reference focal.py:37-66: excluded centers (default NaN) unchanged
    data = np.full((5, 5), 1.0)
    data[2, 2] = np.nan
    df = df_from_numpy(spark, data)
    got = _grid(focal.mean(df))
    assert np.isnan(got[2, 2])
    # neighbors of the nan average over the present cells only
    np.testing.assert_allclose(got[0, 0], 1.0)
    np.testing.assert_allclose(got[2, 1], 1.0)


def test_focal_mean_multiple_passes(spark):
    data = np.zeros((7, 7))
    data[3, 3] = 9.0
    df = df_from_numpy(spark, data)
    one = _grid(focal.mean(df, passes=1))
    two = _grid(focal.mean(df, passes=2))
    np.testing.assert_allclose(one[3, 3], 1.0)
    # second pass spreads the bump one ring further
    assert one[1, 1] == 0.0 and two[1, 1] > 0.0
    np.testing.assert_allclose(one.sum(), 9.0)


@pytest.mark.parametrize("tile", [2, 3, 256])
def test_tiling_invariance_convolve(spark, tile):
    """Halo exchange must make results independent of tile size —
    the Spark analog of the reference's numpy-vs-dask backend
    equivalence tests (general_checks.py:124-154)."""
    rng = np.random.default_rng(2841)
    data = rng.integers(-100, 100, (13, 17)).astype(float)
    data[3, 4] = np.nan
    df = df_from_numpy(spark, data)
    kernel = conv.circle_kernel(1, 1, 1)
    base = _grid(conv.convolve_2d(df, kernel, tile_h=256, tile_w=256))
    got = _grid(conv.convolve_2d(df, kernel, tile_h=tile, tile_w=tile))
    np.testing.assert_allclose(got, base, equal_nan=True)


@pytest.mark.parametrize("tile", [2, 5])
def test_tiling_invariance_focal_stats(spark, tile):
    rng = np.random.default_rng(7)
    data = rng.uniform(-5, 5, (11, 9))
    df = df_from_numpy(spark, data)
    kernel = np.ones((5, 5))
    base = focal.focal_stats(df, kernel, tile_h=256, tile_w=256)
    got = focal.focal_stats(df, kernel, tile_h=tile, tile_w=tile)
    for col in ("mean", "sum", "std"):
        np.testing.assert_allclose(
            _grid(got, col), _grid(base, col), equal_nan=True, err_msg=col
        )


def test_focal_apply_custom_reducer(spark):
    """focal.apply with a user callable — the Spark analog of the
    reference's custom @ngjit reducer (focal.py:396-399)."""
    data = np.arange(16, dtype=float).reshape(4, 4)
    df = df_from_numpy(spark, data)
    kernel = np.ones((3, 3))

    def nan_range(windows, axis):
        return np.nanmax(windows, axis=axis) - np.nanmin(windows, axis=axis)

    got = _grid(focal.apply(df, kernel, func=nan_range))
    # center cell (1,1): window 0..10 -> range 10
    assert got[1, 1] == 10.0
    # corner (0,0): clamped window {0,1,4,5} -> 5
    assert got[0, 0] == 5.0
