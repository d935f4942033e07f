"""Classification goldens ported from reference xrspatial/tests/test_classify.py.

Input fixture: 4x5 ramp with -inf, NaN, +inf (test_classify.py:20-28).
Goldens: binary (:32-40), reclassify (:76-85), quantile (:129-138),
natural_breaks (:185-194), equal_interval (:259-267), std_mean
(:511-518), head_tail_breaks (:570-577), percentiles (:635-642),
maximum_breaks (:706-713), box_plot (:773-780).
"""

import numpy as np
import pytest

from xarray_spatial_spark.operators import classify
from xarray_spatial_spark.raster import df_from_numpy, numpy_from_df

DATA = np.array(
    [
        [-np.inf, 2.0, 3.0, 4.0, np.nan],
        [5.0, 6.0, 7.0, 8.0, 9.0],
        [10.0, 11.0, 12.0, 13.0, 14.0],
        [15.0, 16.0, 17.0, 18.0, np.inf],
    ]
)


@pytest.fixture()
def raster(spark):
    return df_from_numpy(spark, DATA)


def _grid(df):
    return numpy_from_df(df).astype(np.float32)


def test_binary(raster):
    expected = np.asarray(
        [
            [np.nan, 1, 1, 0, np.nan],
            [0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0],
            [0, 0, 0, 0, np.nan],
        ],
        dtype=np.float32,
    )
    got = _grid(classify.binary(raster, [1, 2, 3]))
    np.testing.assert_allclose(got, expected)


def test_reclassify(raster):
    expected = np.asarray(
        [
            [np.nan, 1.0, 1.0, 1.0, np.nan],
            [1.0, 1.0, 1.0, 1.0, 1.0],
            [1.0, 2.0, 2.0, 2.0, 2.0],
            [2.0, 3.0, 3.0, 3.0, np.nan],
        ],
        dtype=np.float32,
    )
    got = _grid(classify.reclassify(raster, bins=[10, 15, np.inf], new_values=[1, 2, 3]))
    np.testing.assert_allclose(got, expected)


def test_quantile(raster):
    expected = np.asarray(
        [
            [np.nan, 0.0, 0.0, 0.0, np.nan],
            [0.0, 1.0, 1.0, 1.0, 2.0],
            [2.0, 2.0, 3.0, 3.0, 3.0],
            [4.0, 4.0, 4.0, 4.0, np.nan],
        ],
        dtype=np.float32,
    )
    np.testing.assert_allclose(_grid(classify.quantile(raster, k=5)), expected)


def test_natural_breaks(raster):
    expected = np.asarray(
        [
            [np.nan, 0.0, 0.0, 0.0, np.nan],
            [1.0, 1.0, 1.0, 2.0, 2.0],
            [2.0, 3.0, 3.0, 3.0, 3.0],
            [4.0, 4.0, 4.0, 4.0, np.nan],
        ],
        dtype=np.float32,
    )
    np.testing.assert_allclose(_grid(classify.natural_breaks(raster, k=5)), expected)


def test_equal_interval(raster):
    expected = np.asarray(
        [
            [np.nan, 0.0, 0.0, 0.0, np.nan],
            [0.0, 0.0, 0.0, 1.0, 1.0],
            [1.0, 1.0, 1.0, 2.0, 2.0],
            [2.0, 2.0, 2.0, 2.0, np.nan],
        ],
        dtype=np.float32,
    )
    np.testing.assert_allclose(_grid(classify.equal_interval(raster, k=3)), expected)


def test_std_mean(raster):
    expected = np.asarray(
        [
            [np.nan, 1.0, 1.0, 1.0, np.nan],
            [1.0, 2.0, 2.0, 2.0, 2.0],
            [2.0, 2.0, 2.0, 2.0, 2.0],
            [3.0, 3.0, 3.0, 3.0, np.nan],
        ],
        dtype=np.float32,
    )
    np.testing.assert_allclose(_grid(classify.std_mean(raster)), expected)


def test_head_tail_breaks(raster):
    expected = np.asarray(
        [
            [np.nan, 0.0, 0.0, 0.0, np.nan],
            [0.0, 0.0, 0.0, 0.0, 0.0],
            [0.0, 1.0, 1.0, 1.0, 1.0],
            [1.0, 1.0, 1.0, 1.0, np.nan],
        ],
        dtype=np.float32,
    )
    np.testing.assert_allclose(_grid(classify.head_tail_breaks(raster)), expected)


def test_percentiles(raster):
    expected = np.asarray(
        [
            [np.nan, 0.0, 1.0, 2.0, np.nan],
            [2.0, 2.0, 2.0, 2.0, 2.0],
            [2.0, 3.0, 3.0, 3.0, 3.0],
            [3.0, 3.0, 4.0, 5.0, np.nan],
        ],
        dtype=np.float32,
    )
    np.testing.assert_allclose(_grid(classify.percentiles(raster)), expected)


def test_maximum_breaks(raster):
    expected = np.asarray(
        [
            [np.nan, 0.0, 0.0, 0.0, np.nan],
            [0.0, 0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0, 0.0],
            [1.0, 2.0, 3.0, 4.0, np.nan],
        ],
        dtype=np.float32,
    )
    np.testing.assert_allclose(_grid(classify.maximum_breaks(raster, k=5)), expected)


def test_box_plot(raster):
    expected = np.asarray(
        [
            [np.nan, 1.0, 1.0, 1.0, np.nan],
            [1.0, 1.0, 2.0, 2.0, 2.0],
            [2.0, 3.0, 3.0, 3.0, 3.0],
            [4.0, 4.0, 4.0, 4.0, np.nan],
        ],
        dtype=np.float32,
    )
    np.testing.assert_allclose(_grid(classify.box_plot(raster)), expected)


def test_quantile_not_enough_unique_values(raster):
    n_uniques = int(np.isfinite(DATA).sum())
    out = _grid(classify.quantile(raster, k=n_uniques + 1))
    assert int(np.isfinite(out).sum()) == n_uniques
