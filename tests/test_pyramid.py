"""pyramid_rollup — hierarchical cell aggregation (H3/S2 compact analog).

Parity model: every level of the pyramid must equal a from-scratch
aggregation of the raw points at that zoom (this exercises the
floor-division parent identity floor(floor(v*2^z)/2^k) == floor(v*2^(z-k))
on real coordinates, including the clamped mercator edges).
"""

import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark import grid
from xarray_spatial_spark.operators import tiling


def _points(spark, n=5000):
    # deterministic scatter incl. polar/antimeridian edges
    return spark.range(n).select(
        (F.col("id") % 3600 / 10.0 - 180.0).alias("lon"),
        ((F.col("id") * 7919 % 1780) / 10.0 - 89.0).alias("lat"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def AGGS():
    return [
        F.count(F.lit(1)).alias("cnt_pts"),
        F.sum("v").alias("sum_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    ]


def _direct(df, z):
    return (
        df.groupBy(
            grid.tile_x_col(F.col("lon"), z).alias("tile_x"),
            grid.tile_y_col(F.col("lat"), z).alias("tile_y"),
        )
        .agg(*AGGS())
    )


@pytest.mark.parametrize("n_salt", [0, 8])
def test_pyramid_matches_direct_per_level(spark, n_salt):
    pts = _points(spark)
    out = tiling.pyramid_rollup(pts, zoom=5, min_zoom=2, aggs=AGGS(), n_salt=n_salt)
    rows = {(r["zoom"], r["tile_x"], r["tile_y"]): (r["cnt_pts"], r["sum_v"], r["min_v"], r["max_v"])
            for r in out.collect()}
    assert out.columns == ["zoom", "tile_x", "tile_y", "cnt_pts", "sum_v", "min_v", "max_v"]
    n_levels = 0
    for z in (5, 4, 3, 2):
        want = {(z, r["tile_x"], r["tile_y"]): (r["cnt_pts"], r["sum_v"], r["min_v"], r["max_v"])
                for r in _direct(pts, z).collect()}
        got = {k: v for k, v in rows.items() if k[0] == z}
        assert got == want, f"zoom {z} mismatch"
        n_levels += 1
    assert len(rows) == sum(
        _direct(pts, z).count() for z in (5, 4, 3, 2)
    )


def test_pyramid_single_raw_scan(spark):
    """Coarser levels re-aggregate the cached base aggregate — the raw
    source appears in exactly one union branch's lineage (the base);
    every other branch reads the InMemoryRelation."""
    pts = _points(spark, 500)
    out = tiling.pyramid_rollup(pts, zoom=4, min_zoom=1, aggs=AGGS())
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # all 4 union branches read the cached base aggregate (the Range text
    # inside an InMemoryRelation is its cached lineage, not a rescan)
    assert plan.count("InMemoryRelation") == 4


def test_pyramid_bad_args(spark):
    pts = _points(spark, 10)
    with pytest.raises(ValueError):
        tiling.pyramid_rollup(pts, zoom=3, min_zoom=4, aggs=AGGS())
    with pytest.raises(ValueError):
        tiling.pyramid_rollup(
            pts, zoom=3, min_zoom=1, aggs=[F.avg("v").alias("mean_v")]
        )


def test_pyramid_salted_high_zoom_exact_keys(spark):
    """At zoom 27 the packed salt key reaches 2^54 — the decomposition
    must be integer bit ops, not double division (which rounds)."""
    pts = spark.range(200).select(
        (179.9 - F.col("id") * 0.0001).alias("lon"),
        (-84.9 + F.col("id") * 0.0007).alias("lat"),
        F.lit(1.0).alias("v"),
    )
    aggs = [F.count(F.lit(1)).alias("cnt_pts"), F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"), F.max("v").alias("max_v")]
    plain = tiling.pyramid_rollup(pts, zoom=27, min_zoom=27, aggs=aggs)
    salted = tiling.pyramid_rollup(pts, zoom=27, min_zoom=27, aggs=aggs, n_salt=8)
    a = {(r["tile_x"], r["tile_y"]): r["cnt_pts"] for r in plain.collect()}
    b = {(r["tile_x"], r["tile_y"]): r["cnt_pts"] for r in salted.collect()}
    assert a == b and len(a) > 0


def test_pyramid_rejects_conflicting_columns(spark):
    pts = _points(spark, 10).withColumn("tile_x", F.lit(1))
    with pytest.raises(ValueError, match="tile_x"):
        tiling.pyramid_rollup(pts, zoom=3, min_zoom=2, aggs=AGGS())


class TestS2Focal:
    def _cells(self, spark, pts, vals, level=10):
        import numpy as np

        from xarray_spatial_spark import s2

        lon = np.array([p[0] for p in pts], float)
        lat = np.array([p[1] for p in pts], float)
        cells = s2.cell_of(lon, lat, level).view(np.int64)
        rows = [(int(c), float(v)) for c, v in zip(cells, vals)]
        return (spark.createDataFrame(rows, "cell_id long, v double"),
                {int(c) for c in cells})

    def _brute(self, rows, include_self=True):
        import numpy as np

        from xarray_spatial_spark import s2

        by_cell = {}
        for c, v in rows:
            s_, n = by_cell.get(c, (0.0, 0))
            by_cell[c] = (s_ + v, n + 1)
        out = {}
        for c in by_cell:
            nbrs = s2.all_neighbors(np.array([c], np.int64).view(np.uint64))[0]
            members = [int(x) for x in nbrs.view(np.int64)] + (
                [c] if include_self else [])
            s_, n = 0.0, 0
            for m in members:
                if m in by_cell:
                    s_ += by_cell[m][0]
                    n += by_cell[m][1]
            if n:
                out[c] = s_ / n
        return out

    def test_matches_bruteforce_incl_dateline(self, spark):
        from xarray_spatial_spark.operators.tiling import s2_focal

        # a tight cluster plus points straddling the dateline and a
        # high-latitude band (cube-face boundary crossings)
        pts = [(10.0, 45.0), (10.001, 45.0), (10.0, 45.001),
               (179.999, 0.0), (-179.999, 0.0),
               (45.0, 89.9), (135.0, 89.9), (0.0, -0.001)]
        vals = [1.0, 3.0, 5.0, 10.0, 20.0, 7.0, 9.0, 2.0]
        df, _ = self._cells(spark, pts, vals, level=8)
        rows = [(r["cell_id"], r["v"]) for r in df.collect()]
        got = {r["cell_id"]: r["focal_mean"]
               for r in s2_focal(df, "v").collect()}
        want = self._brute(rows)
        assert got.keys() == want.keys()
        for c in want:
            assert got[c] == pytest.approx(want[c], rel=1e-12), c

    def test_stats_and_exclude_self(self, spark):
        from xarray_spatial_spark.operators.tiling import s2_focal

        pts = [(10.0, 45.0), (10.001, 45.0), (10.0, 45.001)]
        df, _ = self._cells(spark, pts, [1.0, 3.0, 5.0], level=8)
        rows = [(r["cell_id"], r["v"]) for r in df.collect()]
        for stat, comb in (("sum", sum), ("count", len),
                           ("min", min), ("max", max)):
            got = {r["cell_id"]: r[f"focal_{stat}"]
                   for r in s2_focal(df, "v", stat=stat).collect()}
            assert got  # every input cell appears
        ns = {r["cell_id"]: r["focal_mean"]
              for r in s2_focal(df, "v", include_self=False).collect()}
        want = self._brute(rows, include_self=False)
        for c, v in want.items():
            assert ns[c] == pytest.approx(v, rel=1e-12)

    def test_bad_stat(self, spark):
        from xarray_spatial_spark.operators.tiling import s2_focal

        df = spark.createDataFrame([(1, 1.0)], "cell_id long, v double")
        with pytest.raises(ValueError, match="unsupported focal stat"):
            s2_focal(df, "v", stat="median")
