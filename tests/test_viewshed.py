"""Viewshed invariants mirrored from reference tests/test_viewshed.py:
flat terrain fully visible, single wall casts a shadow, viewpoint =
180, symmetry on symmetric input."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.operators.viewshed import viewshed
from xarray_spatial_spark.raster import df_from_numpy, numpy_from_df


def _grid(df):
    return numpy_from_df(df, value_col="visibility")


def test_flat_all_visible(spark):
    flat = np.zeros((9, 9))
    out = _grid(viewshed(df_from_numpy(spark, flat), x=4, y=4, observer_elev=2))
    assert out[4, 4] == 180.0
    assert (out >= 0).all()  # nothing invisible on a flat plane
    # horizontal-ish far cells approach 90 from above (observer above
    # ground, looking down slightly => angle slightly > 90)
    assert 90 < out[4, 8] < 180


def test_wall_shadow(spark):
    data = np.zeros((9, 9))
    data[4, 6] = 10.0  # wall east of the observer
    out = _grid(viewshed(df_from_numpy(spark, data), x=4, y=4, observer_elev=2))
    assert out[4, 6] >= 0     # the wall is visible
    assert out[4, 7] == -1.0  # cells behind it are not
    assert out[4, 8] == -1.0
    assert out[4, 2] >= 0     # other directions unaffected
    assert out[2, 4] >= 0


def test_symmetry(spark):
    rng = np.random.default_rng(6)
    half = rng.uniform(0, 5, (9, 5))
    data = np.hstack([half, half[:, :-1][:, ::-1]])  # mirror around x=4
    out = _grid(viewshed(df_from_numpy(spark, data), x=4, y=4, observer_elev=3))
    np.testing.assert_allclose(out, out[:, ::-1], rtol=1e-9)


def test_observer_on_hill_sees_more(spark):
    rng = np.random.default_rng(13)
    data = rng.uniform(0, 3, (15, 15))
    low = _grid(viewshed(df_from_numpy(spark, data), x=7, y=7, observer_elev=0.5))
    high = _grid(viewshed(df_from_numpy(spark, data), x=7, y=7, observer_elev=50.0))
    assert (high >= 0).sum() >= (low >= 0).sum()
    assert (high >= 0).all()  # from 50 units up everything is visible


def test_target_elev_extends_visibility(spark):
    data = np.zeros((9, 9))
    data[4, 6] = 10.0
    base = _grid(viewshed(df_from_numpy(spark, data), x=4, y=4, observer_elev=2))
    raised = _grid(
        viewshed(df_from_numpy(spark, data), x=4, y=4, observer_elev=2,
                 target_elev=30.0)
    )
    assert base[4, 8] == -1.0 and raised[4, 8] >= 0


def test_dense_targets_matches_row_path(spark):
    """dense_targets enumerates targets against the broadcast terrain
    — output must be bit-identical to the row-passthrough path."""
    rng = np.random.default_rng(31)
    arr = rng.uniform(0, 30, (24, 18))
    df = df_from_numpy(spark, arr)
    base = numpy_from_df(
        viewshed(df, x=7, y=9, observer_elev=3.0), value_col="visibility")
    got = numpy_from_df(
        viewshed(df, x=7, y=9, observer_elev=3.0, shape=arr.shape,
                 dense_targets=True),
        value_col="visibility")
    np.testing.assert_array_equal(base, got)


def test_dense_targets_rejects_extra_columns(spark):
    arr = np.zeros((4, 4))
    df = df_from_numpy(spark, arr).withColumn("extra", F.lit(1))
    with pytest.raises(ValueError, match="dense_targets"):
        viewshed(df, x=1, y=1, shape=arr.shape, dense_targets=True)


def test_viewshed_timings_dict(spark):
    arr = np.zeros((6, 6))
    t = {}
    viewshed(df_from_numpy(spark, arr), x=1, y=1, shape=arr.shape,
             timings=t)
    assert set(t) == {"collect_dense", "broadcast"}
