"""Zonal goldens ported from reference xrspatial/tests/test_zonal.py.

Fixtures: zones 3x8 (test_zonal.py:30-36), values_2d 3x8 (:39-47).
Goldens: default stats (:62-74), zone_ids subset (:132-145), custom
stats w/ nodata (:212-221), crosstab count (:241-250) and percentage
(:254-263).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.operators import zonal
from xarray_spatial_spark.raster import df_from_numpy

ZONES = np.array(
    [
        [0, 0, 1, 1, 2, 2, 3, 3],
        [0, 0, 1, 1, 2, 2, 3, 3],
        [0, 0, 1, 1, 2, np.nan, 3, 3],
    ]
)
VALUES = np.array(
    [
        [0, 0, 1, 1, 2, 2, 3, np.inf],
        [0, 0, 1, 1, 2, np.nan, 3, 0],
        [np.inf, 0, 1, 1, 2, 2, 3, 3],
    ]
)


@pytest.fixture()
def zv(spark):
    zones = df_from_numpy(spark, ZONES, value_col="zone")
    values = df_from_numpy(spark, VALUES, value_col="value")
    return zonal.align(zones, values)


def _as_dict(df):
    rows = sorted(df.collect(), key=lambda r: r["zone"])
    return {c: [r[c] for r in rows] for c in df.columns}


def test_default_stats(zv):
    out = _as_dict(zonal.stats(zv))
    assert out["zone"] == [0, 1, 2, 3]
    np.testing.assert_allclose(out["mean"], [0, 1, 2, 2.4], rtol=1e-6)
    np.testing.assert_allclose(out["max"], [0, 1, 2, 3])
    np.testing.assert_allclose(out["min"], [0, 1, 2, 0])
    np.testing.assert_allclose(out["sum"], [0, 6, 8, 12])
    np.testing.assert_allclose(out["std"], [0, 0, 0, 1.2], rtol=1e-6)
    np.testing.assert_allclose(out["var"], [0, 0, 0, 1.44], rtol=1e-6)
    assert out["count"] == [5, 6, 4, 5]
    np.testing.assert_allclose(out["majority"], [0, 1, 2, 3])


def test_zone_ids_stats(zv):
    out = _as_dict(zonal.stats(zv, zone_ids=[0, 3]))
    assert out["zone"] == [0, 3]
    np.testing.assert_allclose(out["mean"], [0, 2.4], rtol=1e-6)
    np.testing.assert_allclose(out["sum"], [0, 12])
    assert out["count"] == [5, 5]
    np.testing.assert_allclose(out["majority"], [0, 3])


def test_custom_stats_nodata(zv):
    # reference test_zonal.py:205-221: custom double_sum/range, nodata=0
    custom = {
        "double_sum": F.sum("value") * 2,
        "range": F.max("value") - F.min("value"),
    }
    out = _as_dict(
        zonal.stats(zv, zone_ids=[1, 2], stats_funcs=custom, nodata_values=0)
    )
    assert out["zone"] == [1, 2]
    np.testing.assert_allclose(out["double_sum"], [12, 16])
    np.testing.assert_allclose(out["range"], [0, 0])


def test_crosstab_2d_count(zv):
    zv_cat = zv.withColumnRenamed("value", "cat")
    out = _as_dict(
        zonal.crosstab(zv_cat, zone_ids=[1, 2, 3], cat_ids=[0, 1, 2])
    )
    assert out["zone"] == [1, 2, 3]
    assert out["0"] == [0, 0, 1]
    assert out["1"] == [6, 0, 0]
    assert out["2"] == [0, 4, 0]


def test_crosstab_2d_percentage(zv):
    zv_cat = zv.withColumnRenamed("value", "cat")
    out = _as_dict(
        zonal.crosstab(
            zv_cat,
            zone_ids=[1, 2],
            cat_ids=[1, 2],
            agg="percentage",
            nodata_values=3,
        )
    )
    assert out["zone"] == [1, 2]
    np.testing.assert_allclose(out["1"], [100, 0])
    np.testing.assert_allclose(out["2"], [0, 100])


def test_zonal_apply(spark):
    zones = df_from_numpy(spark, ZONES, value_col="zone")
    values = df_from_numpy(spark, np.ones((3, 8)), value_col="value")
    out = zonal.apply(zonal.align(zones, values), F.col("value") * 10, nodata=0)
    got = {(r["y"], r["x"]): r["value"] for r in out.collect()}
    # zone 0 cells (cols 0-1) pass through; other zones scaled
    assert got[(0, 0)] == 1.0 and got[(0, 2)] == 10.0 and got[(2, 6)] == 10.0


def test_trim(spark):
    arr = np.full((5, 5), np.nan)
    arr[1:4, 2:4] = 7.0
    df = df_from_numpy(spark, arr)
    out = zonal.trim(df).collect()
    ys = {r["y"] for r in out}
    xs = {r["x"] for r in out}
    assert ys == {1, 2, 3} and xs == {2, 3}


def test_crop(spark):
    zones = df_from_numpy(spark, ZONES, value_col="zone")
    values = df_from_numpy(spark, VALUES, value_col="value")
    out = zonal.crop(zonal.align(zones, values), zones_ids=[1]).collect()
    xs = {r["x"] for r in out}
    assert xs == {2, 3}


def test_crosstab_3d(spark):
    """3-D crosstab golden (reference test_zonal.py:267-321): ones
    raster stacked over 4 category layers -> per-(zone, cat) stats."""
    import pandas as pd

    cats = ["cat1", "cat2", "cat3", "cat4"]
    rows = []
    for y in range(3):
        for x in range(8):
            for c in cats:
                rows.append((y, x, c, 1.0))
    values3d = spark.createDataFrame(
        pd.DataFrame(rows, columns=["y", "x", "cat", "value"]),
        schema="y int, x int, cat string, value double",
    )
    zones = df_from_numpy(spark, ZONES, value_col="zone")
    zv = zonal.align(zones, values3d)
    out = _as_dict(
        zonal.crosstab(zv, zone_ids=[1, 2, 3], cat_ids=cats,
                       value_col="value", agg="sum")
    )
    assert out["zone"] == [1, 2, 3]
    for c in cats:
        assert out[c] == [6.0, 5.0, 6.0]
    mean_out = _as_dict(
        zonal.crosstab(zv, zone_ids=[1, 2, 3], cat_ids=cats,
                       value_col="value", agg="mean")
    )
    for c in cats:
        assert mean_out[c] == [1.0, 1.0, 1.0]


def test_stats_multi_band_fanout(spark):
    """Dataset fan-out (reference zonal.py:592-611): stats per value
    column merged on zone."""
    zones = df_from_numpy(spark, ZONES, value_col="zone")
    v1 = df_from_numpy(spark, VALUES, value_col="band_a")
    v2 = df_from_numpy(spark, VALUES * 2, value_col="band_b")
    zv = zonal.align(zonal.align(zones, v1), v2)
    a = zonal.stats(zv, value_col="band_a", stats_funcs=("mean", "count"))
    b = zonal.stats(zv, value_col="band_b", stats_funcs=("mean", "count"))
    merged = a.withColumnRenamed("mean", "mean_a").join(
        b.withColumnRenamed("mean", "mean_b").select("zone", "mean_b"), "zone"
    )
    got = {r["zone"]: (r["mean_a"], r["mean_b"]) for r in merged.collect()}
    assert got[3][1] == pytest.approx(2 * got[3][0])


def test_stats_dataset_multiband(spark):
    """Multi-band fan-out == per-band stats merged on zone, in one
    pass (reference Dataset recursion, zonal.py:592-611)."""
    import numpy as np
    from pyspark.sql import functions as F
    from xarray_spatial_spark.operators import zonal

    rng = np.random.default_rng(4)
    n = 500
    pdf = [
        (int(i % 7), float(rng.uniform(0, 10)), float(rng.uniform(-5, 5)))
        for i in range(n)
    ]
    df = spark.createDataFrame(pdf, schema="zone long, a double, b double")
    ds = zonal.stats_dataset(df, ["a", "b"], stats_funcs=("mean", "max", "count"))
    sa = zonal.stats(df, value_col="a", stats_funcs=("mean", "max", "count"))
    sb = zonal.stats(df, value_col="b", stats_funcs=("mean", "max", "count"))
    merged = {r["zone"]: r for r in ds.collect()}
    for r in sa.collect():
        assert abs(merged[r["zone"]]["a_mean"] - r["mean"]) < 1e-12
        assert merged[r["zone"]]["a_max"] == r["max"]
        assert merged[r["zone"]]["a_count"] == r["count"]
    for r in sb.collect():
        assert abs(merged[r["zone"]]["b_mean"] - r["mean"]) < 1e-12
    # single-pass plan: exactly one shuffle (AQE may print the
    # exchange node once per stage section)
    plan = ds._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1 or \
        plan.count("ShuffleQueryStage") == 1


def test_stats_tiled_matches_fused(spark):
    """Tiled (per-tile histogram) zonal == stats_fused over the
    long-form twin: exact for count/min/max/majority, fp-tolerant for
    the float combines, NaN zones/values excluded, nodata honored."""
    import numpy as np

    from xarray_spatial_spark import tiled
    from xarray_spatial_spark.raster import df_from_numpy

    rng = np.random.default_rng(31)
    vals = rng.integers(0, 9, (40, 53)).astype(float)
    zones = (rng.integers(0, 5, (40, 53))).astype(float)
    vals[3, 4] = np.nan
    zones[10, 11] = np.nan
    long = df_from_numpy(spark, vals)
    longz = df_from_numpy(spark, zones).withColumnRenamed("value", "zone")
    zv = long.join(longz, ["y", "x"])
    base = {r["zone"]: r.asDict() for r in zonal.stats_fused(
        zv.select(F.col("zone"), F.col("value"))).collect()}

    tdf = tiled.tile(zv, tile_h=16, tile_w=16, value_cols=("zone", "value"))
    got = {r["zone"]: r.asDict() for r in
           zonal.stats_tiled(tdf).collect()}
    assert set(got) == set(base)
    for z in base:
        for k in ("count", "min", "max", "majority"):
            assert got[z][k] == base[z][k], (z, k)
        for k in ("mean", "sum", "std", "var"):
            np.testing.assert_allclose(got[z][k], base[z][k], rtol=1e-12)

    # nodata + zone_ids filters
    g2 = zonal.stats_tiled(tdf, zone_ids=[1.0, 2.0], nodata_values=3.0)
    b2 = zonal.stats_fused(zv.select("zone", "value"),
                           zone_ids=[1.0, 2.0], nodata_values=3.0)
    gd = {r["zone"]: r["count"] for r in g2.collect()}
    bd = {r["zone"]: r["count"] for r in b2.collect()}
    assert gd == bd and set(gd) == {1.0, 2.0}


def test_crosstab_tiled_matches_long(spark):
    import numpy as np

    from xarray_spatial_spark import tiled
    from xarray_spatial_spark.raster import df_from_numpy

    rng = np.random.default_rng(41)
    cats = rng.integers(0, 4, (30, 30)).astype(float)
    zones = rng.integers(0, 3, (30, 30)).astype(float)
    long = df_from_numpy(spark, cats).withColumnRenamed("value", "cat")
    longz = df_from_numpy(spark, zones).withColumnRenamed("value", "zone")
    zv = long.join(longz, ["y", "x"])
    base = {r["zone"]: r.asDict() for r in zonal.crosstab(
        zv.select("zone", "cat"), cat_ids=[0.0, 1.0, 2.0, 3.0]).collect()}
    tdf = tiled.tile(zv.select("y", "x", "zone", "cat"),
                     tile_h=16, tile_w=16, value_cols=("zone", "cat"))
    got = {r["zone"]: r.asDict() for r in zonal.crosstab_tiled(
        tdf, cat_ids=[0.0, 1.0, 2.0, 3.0]).collect()}
    assert set(got) == set(base)
    for z in base:
        for c in ("0.0", "1.0", "2.0", "3.0"):
            assert got[z][c] == base[z][c], (z, c)
    # percentage form sums to 100 per zone
    pct = zonal.crosstab_tiled(tdf, cat_ids=[0.0, 1.0, 2.0, 3.0],
                               agg="percentage").collect()
    for r in pct:
        s = sum(r[c] for c in ("0.0", "1.0", "2.0", "3.0"))
        np.testing.assert_allclose(s, 100.0)
