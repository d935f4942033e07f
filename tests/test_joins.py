"""plans/joins.py strategy planner + bucket-pruned broadcast NN."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark import raster
from xarray_spatial_spark.operators import proximity
from xarray_spatial_spark.plans import joins


def test_nearest_plan_tiers():
    assert joins.nearest_plan(5) == "expr"
    assert joins.nearest_plan(64) == "expr"
    assert joins.nearest_plan(65) == "broadcast"
    assert joins.nearest_plan(64, k=3) == "broadcast"
    assert joins.nearest_plan(5_000_001) == "ring"


def test_ring_zoom_bounds_radius():
    for md in (0.01, 0.5, 3.0, 45.0):
        z = joins.ring_zoom(md)
        assert 360.0 / (1 << z) >= md          # one cell spans the radius
        assert z == 0 or 360.0 / (1 << (z + 1)) < md  # tightest such zoom


def test_ring_unbounded_raises(spark):
    pts = spark.range(10).select(
        (F.col("id") * 1.0).alias("lon"), (F.col("id") * 1.0).alias("lat")
    )
    with pytest.raises(ValueError, match="unbounded"):
        joins.nearest_join(pts, pts, n_targets=10_000_000, strategy="ring")


@pytest.fixture(scope="module")
def scattered(spark):
    rng = np.random.default_rng(11)
    pts = rng.uniform(-50, 50, size=(400, 2))
    tgt = rng.uniform(-50, 50, size=(80, 2))
    pdf = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], schema="lon double, lat double"
    )
    tv = [(float(x), float(y), float(i + 1)) for i, (x, y) in enumerate(tgt)]
    tdf = spark.createDataFrame(tv, schema="lon double, lat double, value double")
    return pdf, tdf, pts, np.array([(x, y, v) for x, y, v in tv])


def test_bucket_pruned_matches_dense(spark, scattered):
    """Finite max_distance turns on the grid-bucket index; results must
    equal the dense path exactly (including out-of-range NULLs)."""
    pdf, tdf, pts, tgt = scattered
    md = 7.5
    pruned = proximity.nearest_broadcast(
        pdf, tdf, target_payload="value", max_distance=md
    ).toPandas().sort_values(["lon", "lat"]).reset_index(drop=True)
    dense = proximity.nearest_broadcast(
        pdf, tdf, target_payload="value"
    ).toPandas().sort_values(["lon", "lat"]).reset_index(drop=True)
    # dense path + manual cutoff == pruned path
    mask = dense["nearest_dist"] > md
    for c in ("nearest_dist", "nearest_x", "nearest_y", "nearest_value"):
        dense.loc[mask, c] = np.nan
        np.testing.assert_allclose(
            pruned[c].to_numpy(np.float64), dense[c].to_numpy(np.float64),
            equal_nan=True,
        )
    assert mask.sum() > 0 and (~mask).sum() > 0  # both regimes exercised


def test_bucket_pruned_great_circle(spark, scattered):
    pdf, tdf, _, _ = scattered
    md = 900_000.0  # meters
    pruned = proximity.nearest_broadcast(
        pdf, tdf, target_payload="value", metric="GREAT_CIRCLE",
        max_distance=md,
    ).toPandas().sort_values(["lon", "lat"]).reset_index(drop=True)
    dense = proximity.nearest_broadcast(
        pdf, tdf, target_payload="value", metric="GREAT_CIRCLE",
    ).toPandas().sort_values(["lon", "lat"]).reset_index(drop=True)
    mask = dense["nearest_dist"] > md
    dense.loc[mask, "nearest_dist"] = np.nan
    np.testing.assert_allclose(
        pruned["nearest_dist"].to_numpy(np.float64),
        dense["nearest_dist"].to_numpy(np.float64),
        equal_nan=True,
    )


def test_proximity_ring_strategy_matches_broadcast(spark):
    """The ring path (forced) must reproduce the broadcast result on a
    raster whose search radius is bounded — the planner's 100-TB tier
    exercised at a real zoom."""
    rng = np.random.default_rng(5)
    a = np.zeros((40, 40))
    ii = rng.integers(0, 40, size=15)
    jj = rng.integers(0, 40, size=15)
    a[ii, jj] = rng.integers(1, 5, size=15).astype(float)
    df = raster.df_from_numpy(spark, a).select(
        F.col("x").cast("double").alias("cx"),
        F.col("y").cast("double").alias("cy"),
        "value",
    )
    md = 6.0
    kw = dict(x_col="cx", y_col="cy", max_distance=md)
    b = proximity.proximity(df, strategy="broadcast", **kw).toPandas()
    r = proximity.proximity(df, strategy="ring", **kw).toPandas()
    b = b.sort_values(["cy", "cx"]).reset_index(drop=True)
    r = r.sort_values(["cy", "cx"]).reset_index(drop=True)
    np.testing.assert_allclose(
        r["value"].to_numpy(np.float64), b["value"].to_numpy(np.float64),
        equal_nan=True,
    )
    assert np.isnan(r["value"]).any() and np.isfinite(r["value"]).any()


def test_allocation_ring_strategy(spark):
    rng = np.random.default_rng(6)
    a = np.zeros((30, 30))
    a[3, 4] = 2.0
    a[20, 25] = 1.0
    a[11, 16] = 3.0
    df = raster.df_from_numpy(spark, a).select(
        F.col("x").cast("double").alias("cx"),
        F.col("y").cast("double").alias("cy"),
        "value",
    )
    kw = dict(x_col="cx", y_col="cy", max_distance=50.0)
    b = proximity.allocation(df, strategy="broadcast", **kw).toPandas()
    r = proximity.allocation(df, strategy="ring", **kw).toPandas()
    b = b.sort_values(["cy", "cx"]).reset_index(drop=True)
    r = r.sort_values(["cy", "cx"]).reset_index(drop=True)
    np.testing.assert_allclose(
        r["value"].to_numpy(np.float64), b["value"].to_numpy(np.float64),
        equal_nan=True,
    )


def test_ring_strategy_high_latitude(spark):
    """Mercator cells span fewer degrees of latitude away from the
    equator; the lat-aware ring must keep the ring path exact at
    60-75 deg latitude where a fixed 1-cell ring under-covers."""
    rng = np.random.default_rng(21)
    pts = [(float(rng.uniform(-30, 30)), float(rng.uniform(55, 75)))
           for _ in range(300)]
    tgts = [(float(rng.uniform(-30, 30)), float(rng.uniform(55, 75)),
             float(i + 1)) for i in range(25)]
    pdf = spark.createDataFrame(pts, schema="lon double, lat double")
    tdf = spark.createDataFrame(tgts, schema="lon double, lat double, value double")
    md = 6.0
    pid = F.struct(F.col("lon"), F.col("lat"))
    rj = joins.nearest_join(
        pdf.withColumn("_pid", pid), tdf.withColumn("_tid", pid),
        max_distance=md, strategy="ring", point_id="_pid",
        target_id="_tid", target_payload="value",
    ).filter(F.col("dist") <= md)
    ring_d = {(r["_pid"]["lon"], r["_pid"]["lat"]): r["dist"]
              for r in rj.collect()}
    bc = proximity.nearest_broadcast(pdf, tdf, target_payload="value",
                                     max_distance=md)
    miss = 0
    for r in bc.collect():
        key = (r["lon"], r["lat"])
        if r["nearest_dist"] is not None and not math.isnan(r["nearest_dist"]):
            assert key in ring_d, f"ring missed point {key}"
            assert abs(ring_d[key] - r["nearest_dist"]) < 1e-9
        else:
            miss += 1
    assert miss < 300  # some points do have in-range targets


def test_ring_strategy_polar_exact_span(spark):
    """The exact-span ring (tile rows of lat +/- radius) keeps the ring
    path exact right up to the mercator clamp — latitudes 78-85 where
    the old cos(point_lat) heuristic under-covered."""
    rng = np.random.default_rng(7)
    pts = [(float(rng.uniform(-170, 170)), float(rng.uniform(78.0, 85.0)))
           for _ in range(200)]
    tgts = [(float(rng.uniform(-170, 170)), float(rng.uniform(78.0, 85.0)),
             float(i + 1)) for i in range(20)]
    pdf = spark.createDataFrame(pts, schema="lon double, lat double")
    tdf = spark.createDataFrame(tgts, schema="lon double, lat double, value double")
    md = 8.0
    pid = F.struct(F.col("lon"), F.col("lat"))
    rj = joins.nearest_join(
        pdf.withColumn("_pid", pid), tdf.withColumn("_tid", pid),
        max_distance=md, strategy="ring", point_id="_pid",
        target_id="_tid", target_payload="value",
    ).filter(F.col("dist") <= md)
    ring_d = {(r["_pid"]["lon"], r["_pid"]["lat"]): r["dist"]
              for r in rj.collect()}
    bc = proximity.nearest_broadcast(pdf, tdf, target_payload="value",
                                     max_distance=md)
    for r in bc.collect():
        key = (r["lon"], r["lat"])
        if r["nearest_dist"] is not None and not math.isnan(r["nearest_dist"]):
            assert key in ring_d, f"ring missed polar point {key}"
            assert abs(ring_d[key] - r["nearest_dist"]) < 1e-9


def test_ring_cell_budget_error(spark):
    """Polar blow-up guard: a radius needing >4096 candidate cells per
    point raises with actionable advice instead of exploding the
    join."""
    pdf = spark.createDataFrame([(0.0, 85.0)], schema="lon double, lat double")
    tdf = spark.createDataFrame([(0.0, 85.0, 1.0)],
                                schema="lon double, lat double, value double")
    import pytest
    with pytest.raises(Exception, match="lower the zoom"):
        proximity.knn_ring_join(
            pdf.withColumn("doc_id", F.lit(1)),
            tdf.withColumn("target_id", F.lit(1)),
            zoom=12, max_distance_deg=10.0,
            point_id="doc_id", target_id="target_id",
        ).collect()
