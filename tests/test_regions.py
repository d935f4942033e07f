"""regions (CCL) ported from reference tests/test_zonal.py:999-1044 +
cross-tile correctness via tiling invariance."""

import numpy as np
import pytest

from xarray_spatial_spark.operators.regions import regions
from xarray_spatial_spark.raster import df_from_numpy, numpy_from_df


def _grid(df):
    return numpy_from_df(df, value_col="region")


def test_regions_four_connectivity_int(spark):
    arr = np.array(
        [[0, 0, 0, 0], [0, 4, 0, 0], [1, 4, 4, 0], [1, 1, 1, 0], [0, 0, 0, 0]],
        dtype=float,
    )
    out = _grid(regions(df_from_numpy(spark, arr), neighborhood=4))
    assert len(np.unique(out[np.isfinite(out)])) == 3
    assert out.shape == arr.shape


def test_regions_four_connectivity_float_nan(spark):
    arr = np.array(
        [[0, 0, 0, np.nan], [0, 4, 0, 0], [1, 4, 4, 0], [1, 1, 1, 0], [0, 0, 0, 0]],
        dtype=float,
    )
    out = _grid(regions(df_from_numpy(spark, arr, keep_nonfinite=False),
                        neighborhood=4))
    # reference: the NaN cell is its own region -> 4 uniques
    # (test_zonal.py:1011-1020); NULL-valued rows connect via
    # NULL==NULL like the reference's nan==nan equality
    assert len(np.unique(out)) == 4
    nan_label = out[0, 3]
    assert (out == nan_label).sum() == 1  # singleton region


def test_regions_eight_connectivity(spark):
    arr = np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1], [0, 0, 0, 1]],
        dtype=float,
    )
    out4 = _grid(regions(df_from_numpy(spark, arr), neighborhood=4))
    out8 = _grid(regions(df_from_numpy(spark, arr), neighborhood=8))
    assert len(np.unique(out8)) == 2  # diagonal 1s merge under 8-conn
    assert len(np.unique(out4)) > 2


def test_regions_docstring_example(spark):
    arr = np.array(
        [
            [1, 1, 0, 2, 2],
            [1, 1, 0, 2, 2],
            [0, 0, 0, 0, 0],
            [3, 3, 0, 3, 3],
            [3, 3, 0, 3, 3],
        ],
        dtype=float,
    )
    out = _grid(regions(df_from_numpy(spark, arr), neighborhood=4))
    # regions: the connected 0-cross, two 1/2 blocks, two 3 blocks -> 5
    labels = {tuple(map(int, np.argwhere(out == v)[0])): v for v in np.unique(out)}
    assert len(np.unique(out)) == 5
    # same-value disconnected blocks get DIFFERENT labels
    assert out[3, 0] != out[3, 3]
    assert out[0, 0] != out[0, 3]
    # scan-order dense ids starting at 0
    assert out.min() == 0.0 and out.max() == 4.0


@pytest.mark.parametrize("conn", [4, 8])
def test_regions_tiling_invariance(spark, conn):
    """Cross-tile union must give the same partition of cells as a
    single-tile run (label ids are canonical scan-order, so grids are
    exactly equal)."""
    rng = np.random.default_rng(77)
    arr = rng.integers(0, 3, (23, 31)).astype(float)
    df = df_from_numpy(spark, arr)
    base = _grid(regions(df, neighborhood=conn, tile_h=256, tile_w=256))
    tiled = _grid(regions(df, neighborhood=conn, tile_h=5, tile_w=7))
    np.testing.assert_array_equal(base, tiled)
