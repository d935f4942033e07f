"""pathfinding (A*), bump, resample, geodesic surface ops, fused zonal."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.operators import resample, surface, zonal
from xarray_spatial_spark.operators.pathfinding import a_star_search
from xarray_spatial_spark.raster import df_from_numpy, numpy_from_df
from xarray_spatial_spark.sources.bump import bump

PATH_DATA = np.array(
    [[0, 1, 0, 0], [1, 1, 0, 0], [0, 1, 2, 2], [1, 0, 2, 0], [0, 2, 2, 2]],
    dtype=float,
)


def test_a_star_8_connectivity(spark):
    # reference tests/test_pathfinding.py:35-41: start (3,1) goal (0,2)
    df = df_from_numpy(spark, PATH_DATA)
    out = a_star_search(df, start=(3, 1), goal=(0, 2), connectivity=8)
    got = {(r["y"], r["x"]): r["cost"] for r in out.collect()}
    assert got[(0, 2)] == pytest.approx(3.41421356)
    assert got[(3, 1)] == 0.0
    assert len(got) == 4


def test_a_star_4_connectivity(spark):
    df = df_from_numpy(spark, PATH_DATA)
    out = a_star_search(df, start=(3, 1), goal=(0, 2), connectivity=4)
    got = {(r["y"], r["x"]): r["cost"] for r in out.collect()}
    assert got[(0, 2)] == pytest.approx(4.0)
    assert got[(3, 1)] == 0.0
    assert len(got) == 5


def test_a_star_barriers_block(spark):
    # barriers=[1]: (0,0) is walled off (test_pathfinding.py:78-95)
    df = df_from_numpy(spark, PATH_DATA)
    out = a_star_search(df, start=(0, 0), goal=(4, 3), barriers=[1])
    assert out.count() == 0


def test_a_star_same_start_goal(spark):
    df = df_from_numpy(spark, PATH_DATA)
    out = a_star_search(df, start=(2, 2), goal=(2, 2)).collect()
    assert len(out) == 1 and out[0]["cost"] == 0.0


def test_a_star_snap(spark):
    data = PATH_DATA.copy()
    data[1, 2] = np.nan
    df = df_from_numpy(spark, data)
    with pytest.warns(Warning):
        out = a_star_search(df, start=(1, 2), goal=(0, 0))
    assert out.count() == 0  # non-crossable start, no snap
    out2 = a_star_search(df, start=(1, 2), goal=(0, 0), snap_start=True)
    assert out2.count() > 0


def test_bump(spark):
    df = bump(spark, 20, 15, count=6, spread=2, seed=5)
    arr = numpy_from_df(df)
    assert arr.shape == (15, 20)
    assert (arr > 0).sum() >= 6  # centers plus spread
    assert arr.sum() > 0
    # determinism
    arr2 = numpy_from_df(bump(spark, 20, 15, count=6, spread=2, seed=5))
    np.testing.assert_array_equal(arr, arr2)


def test_resample_roundtrip(spark):
    rng = np.random.default_rng(4)
    data = rng.uniform(0, 10, (8, 12))
    df = df_from_numpy(spark, data)
    up = resample.upsample(df, 3)
    assert up.count() == 8 * 12 * 9
    back = resample.downsample(up, 3, agg="mean")
    np.testing.assert_allclose(numpy_from_df(back), data, rtol=1e-12)
    # block-mean downsample oracle
    down = numpy_from_df(resample.downsample(df, 2, agg="mean"))
    want = data.reshape(4, 2, 6, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(down, want, rtol=1e-12)


def test_geodesic_slope_flat_and_tilted(spark):
    import pandas as pd

    # flat patch at mid-latitude -> slope ~ 0
    h, w = 6, 6
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    res_deg = 0.001
    lat = 45.0 - yy * res_deg
    lon = 10.0 + xx * res_deg

    def make_df(elev):
        pdf = pd.DataFrame(
            {
                "y": yy.ravel().astype("int32"), "x": xx.ravel().astype("int32"),
                "lat": lat.ravel(), "lon": lon.ravel(),
                "value": elev.ravel(),
            }
        )
        return spark.createDataFrame(
            pdf, schema="y int, x int, lat double, lon double, value double"
        )

    flat = numpy_from_df(surface.geodesic_slope(make_df(np.full((h, w), 100.0))))
    interior = flat[1:-1, 1:-1]
    np.testing.assert_allclose(interior, 0.0, atol=1e-4)

    # northward-rising ramp: rise = 100 m per ~111 m cell -> slope ~ 42 deg
    cell_m = res_deg * 111194.9
    ramp = (h - 1 - yy) * 100.0
    sl = numpy_from_df(surface.geodesic_slope(make_df(ramp)))[1:-1, 1:-1]
    expected = np.degrees(np.arctan(100.0 / cell_m))
    np.testing.assert_allclose(sl, expected, rtol=0.05)
    asp = numpy_from_df(surface.geodesic_aspect(make_df(ramp)))[1:-1, 1:-1]
    # downslope points south (aspect ~180)
    np.testing.assert_allclose(asp, 180.0, atol=2.0)


def test_zonal_stats_fused_matches_plain(spark):
    rng = np.random.default_rng(9)
    zones = df_from_numpy(spark, rng.integers(0, 5, (20, 20)).astype(float),
                          value_col="zone")
    values = df_from_numpy(spark, rng.integers(0, 9, (20, 20)).astype(float))
    zv = zonal.align(zones, values)
    a = {r["zone"]: r.asDict() for r in zonal.stats(zv).collect()}
    b = {r["zone"]: r.asDict() for r in zonal.stats_fused(zv).collect()}
    assert set(a) == set(b)
    for z in a:
        for k in ("mean", "max", "min", "sum", "std", "var", "count", "majority"):
            np.testing.assert_allclose(a[z][k], b[z][k], rtol=1e-9, err_msg=f"{z}/{k}")


def test_stats_to_raster(spark):
    zones = df_from_numpy(spark, np.array([[0, 0, 1, 1]] * 2, dtype=float),
                          value_col="zone")
    values = df_from_numpy(spark, np.array([[1, 3, 5, 7]] * 2, dtype=float))
    zv = zonal.align(zones, values)
    stats = zonal.stats(zv, stats_funcs=("mean",))
    back = zonal.stats_to_raster(zv, stats)
    got = {(r["y"], r["x"]): r["mean"] for r in back.collect()}
    assert got[(0, 0)] == 2.0 and got[(0, 3)] == 6.0


def test_collect_dense_cap_guard(spark):
    from xarray_spatial_spark.raster import collect_dense, df_from_numpy
    import numpy as np
    import pytest as _pt

    df = df_from_numpy(spark, np.ones((20, 20)))
    with _pt.raises(ValueError, match="cap"):
        collect_dense(df, cap_cells=100)
    arr = collect_dense(df)
    assert arr.shape == (20, 20) and np.all(arr == 1.0)


def test_a_star_default_margin_is_bounded(spark):
    """margin=None must search a finite window (never whole-raster
    collect) and still find the same path as unrestricted when the
    path stays near the bbox."""
    import numpy as np
    from xarray_spatial_spark.operators.pathfinding import a_star_search
    from xarray_spatial_spark.raster import df_from_numpy

    rng = np.random.default_rng(2)
    a = rng.uniform(1, 2, size=(80, 80))
    df = df_from_numpy(spark, a)
    auto = a_star_search(df, (10, 12), (18, 25)).toPandas()
    full = a_star_search(df, (10, 12), (18, 25), margin=-1).toPandas()
    assert sorted(map(tuple, auto[["y", "x"]].to_numpy())) == sorted(
        map(tuple, full[["y", "x"]].to_numpy())
    )
