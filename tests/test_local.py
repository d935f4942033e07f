"""Local family goldens ported from reference xrspatial/tests/test_local.py
(fixture arrays :8-28, goldens cited per test)."""

import numpy as np
import pytest

from xarray_spatial_spark.operators import local
from xarray_spatial_spark.raster import df_from_bands, numpy_from_df

ARR = np.full((4, 4), 2.0)
ARR1 = np.array(
    [[np.nan, 4, 2, 0], [2, 3, np.nan, 1], [5, 1, 2, 0], [1, 3, 2, np.nan]], dtype=float
)
ARR2 = np.array(
    [[3, 1, 1, 2], [4, 1, 2, 5], [0, 0, 0, 0], [np.nan, 1, 1, 1]], dtype=float
)
ARR3 = np.array(
    [[3, 3, 2, 0], [4, 1, 3, 1], [6, 1, 2, 2], [0, 0, 1, 1]], dtype=float
)


@pytest.fixture()
def ds(spark):
    return df_from_bands(spark, arr=ARR, arr1=ARR1, arr2=ARR2, arr3=ARR3)


def _grid(df, col):
    return numpy_from_df(df, value_col=col)


def test_cell_stats_sum(ds):
    # test_local.py:31-38
    expected = np.array(
        [[np.nan, 8, 5, 2], [10, 5, np.nan, 7], [11, 2, 4, 2], [np.nan, 4, 4, np.nan]],
        dtype=float,
    )
    got = _grid(local.cell_stats(ds, ["arr1", "arr2", "arr3"]), "cell_stats")
    np.testing.assert_allclose(got, expected)


def test_cell_stats_all_funcs(ds):
    cols = ["arr1", "arr2", "arr3"]
    ref = np.stack([ARR1, ARR2, ARR3])
    for func, np_func in [
        ("max", np.max), ("min", np.min), ("mean", np.mean),
        ("median", np.median), ("std", np.std), ("sum", np.sum),
    ]:
        got = _grid(local.cell_stats(ds, cols, func), "cell_stats")
        expected = np_func(ref, axis=0)
        np.testing.assert_allclose(got, expected, rtol=1e-12, err_msg=func)


def test_combine(ds):
    # test_local.py:132-139: ids by first appearance in row-major order
    expected = np.array(
        [[np.nan, 1, 2, 3], [4, 5, np.nan, 6], [7, 8, 9, 10], [np.nan, 11, 12, np.nan]],
        dtype=float,
    )
    got = _grid(local.combine(ds, ["arr1", "arr2", "arr3"]), "combine")
    np.testing.assert_allclose(got, expected)


def test_combine_some_vars(ds):
    # test_local.py:142-146
    expected = np.array(
        [[np.nan, 1, 2, 3], [4, 5, np.nan, 6], [7, 6, 2, 8], [9, 10, 11, np.nan]],
        dtype=float,
    )
    got = _grid(local.combine(ds, ["arr1", "arr3"]), "combine")
    np.testing.assert_allclose(got, expected)


def test_lesser_frequency(ds):
    # test_local.py:175-182
    expected = np.array(
        [[np.nan, 1, 1, 2], [0, 2, np.nan, 2], [1, 3, 1, 2], [np.nan, 2, 2, np.nan]],
        dtype=float,
    )
    got = _grid(local.lesser_frequency(ds, "arr", ["arr1", "arr2", "arr3"]),
                "lesser_frequency")
    np.testing.assert_allclose(got, expected)


def test_equal_frequency(ds):
    # test_local.py:250-257
    expected = np.array(
        [[np.nan, 0, 2, 1], [1, 0, np.nan, 0], [0, 0, 2, 1], [np.nan, 0, 1, np.nan]],
        dtype=float,
    )
    got = _grid(local.equal_frequency(ds, "arr", ["arr1", "arr2", "arr3"]),
                "equal_frequency")
    np.testing.assert_allclose(got, expected)


def test_greater_frequency(ds):
    # test_local.py:325-332
    expected = np.array(
        [[np.nan, 2, 0, 0], [2, 1, np.nan, 1], [2, 0, 0, 0], [np.nan, 1, 0, np.nan]],
        dtype=float,
    )
    got = _grid(local.greater_frequency(ds, "arr", ["arr1", "arr2", "arr3"]),
                "greater_frequency")
    np.testing.assert_allclose(got, expected)


def test_highest_position(ds):
    # test_local.py:400-407
    expected = np.array(
        [[np.nan, 1, 1, 2], [2, 1, np.nan, 2], [3, 1, 1, 3], [np.nan, 1, 1, np.nan]],
        dtype=float,
    )
    got = _grid(local.highest_position(ds, ["arr1", "arr2", "arr3"]), "highest_position")
    np.testing.assert_allclose(got, expected)


def test_lowest_position(ds):
    # test_local.py:444-451
    expected = np.array(
        [[np.nan, 2, 2, 1], [1, 2, np.nan, 1], [2, 2, 2, 1], [np.nan, 3, 2, np.nan]],
        dtype=float,
    )
    got = _grid(local.lowest_position(ds, ["arr1", "arr2", "arr3"]), "lowest_position")
    np.testing.assert_allclose(got, expected)


def test_popularity(ds):
    # test_local.py:490-497
    expected = np.array(
        [
            [np.nan, np.nan, 2, 2],
            [4, 3, np.nan, 5],
            [np.nan, 1, 2, 2],
            [np.nan, np.nan, 2, np.nan],
        ],
        dtype=float,
    )
    got = _grid(local.popularity(ds, "arr", ["arr1", "arr2", "arr3"]), "popularity")
    np.testing.assert_allclose(got, expected)


def test_rank(ds):
    # test_local.py:561-565
    expected = np.array(
        [[np.nan, 3, 2, 0], [4, 1, np.nan, 1], [5, 1, 2, 0], [np.nan, 1, 1, np.nan]],
        dtype=float,
    )
    got = _grid(local.rank(ds, "arr", ["arr1", "arr2", "arr3"]), "rank")
    np.testing.assert_allclose(got, expected)
