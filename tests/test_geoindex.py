"""Geohash + Bing quadkey (functions/geoindex.py): published goldens,
encode/decode roundtrips, prefix properties, boundary clamps, and
bit-exact agreement between the Column implementation and the ANSI-SQL
twins run in DuckDB."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark import grid
from xarray_spatial_spark.functions import geoindex as gx


def _one(spark, lat, lon, col):
    df = spark.createDataFrame([(float(lat), float(lon))], "lat double, lon double")
    return df.select(col.alias("v")).collect()[0].v


# --- published goldens ------------------------------------------------------


def test_geohash_wiki_golden(spark):
    # the canonical geohash example (57.64911, 10.40744) -> u4pruydqqvj
    assert (
        _one(spark, 57.64911, 10.40744, gx.geohash_col(F.col("lat"), F.col("lon"), 11))
        == "u4pruydqqvj"
    )


def test_geohash_ezs42_golden(spark):
    assert (
        _one(spark, 42.605, -5.603, gx.geohash_col(F.col("lat"), F.col("lon"), 5))
        == "ezs42"
    )


def test_quadkey_bing_golden(spark):
    # Bing tile-system doc example: tile (x=3, y=5) at zoom 3 -> "213"
    cell = int(grid.encode(np.array([3]), np.array([5]), 3)[0])
    x0, y0, x1, y1 = grid.tile_bounds(cell)
    got = _one(
        spark, (y0 + y1) / 2, (x0 + x1) / 2, gx.quadkey_col(F.col("lat"), F.col("lon"), 3)
    )
    assert got == "213"


def test_boundary_clamps(spark):
    # poles / antimeridian quantize into the last (or first) bucket
    for lat, lon, g8 in [(90.0, 180.0, "zzzzzzzz"), (-90.0, -180.0, "00000000")]:
        assert _one(spark, lat, lon, gx.geohash_col(F.col("lat"), F.col("lon"), 8)) == g8


def test_precision_bounds():
    with pytest.raises(ValueError):
        gx._gh_bits(0)
    with pytest.raises(ValueError):
        gx._gh_bits(12)
    with pytest.raises(ValueError):
        gx.quadkey_col(F.lit(0.0), F.lit(0.0), 0)


# --- roundtrips and prefix properties --------------------------------------


def _rand_points(spark, n=300, seed=7):
    rng = np.random.default_rng(seed)
    lats = rng.uniform(-90, 90, n)
    lons = rng.uniform(-180, 180, n)
    return spark.createDataFrame(
        [(float(a), float(o)) for a, o in zip(lats, lons)], "lat double, lon double"
    )


@pytest.mark.parametrize("p", [1, 4, 7, 8, 11])
def test_geohash_roundtrip(spark, p):
    df = _rand_points(spark)
    gh = gx.geohash_col(F.col("lat"), F.col("lon"), p)
    la, lo = gx.geohash_decode_cols(F.col("gh"), p)
    bl, bt = gx._gh_bits(p)
    rows = (
        df.withColumn("gh", gh)
        .select("lat", "lon", la.alias("dlat"), lo.alias("dlon"), "gh")
        .collect()
    )
    for r in rows:
        assert len(r.gh) == p
        assert abs(r.lat - r.dlat) <= 180.0 / (1 << bt) / 2 + 1e-9
        assert abs(r.lon - r.dlon) <= 360.0 / (1 << bl) / 2 + 1e-9
        # re-encoding the decoded center reproduces the code exactly
    re = (
        df.withColumn("gh", gh)
        .withColumn("dlat", la)
        .withColumn("dlon", lo)
        .select(
            "gh", gx.geohash_col(F.col("dlat"), F.col("dlon"), p).alias("gh2")
        )
        .collect()
    )
    assert all(r.gh == r.gh2 for r in re)


def test_geohash_prefix_property(spark):
    df = _rand_points(spark, n=200, seed=11)
    rows = df.select(
        gx.geohash_col(F.col("lat"), F.col("lon"), 4).alias("g4"),
        gx.geohash_col(F.col("lat"), F.col("lon"), 8).alias("g8"),
        gx.geohash_col(F.col("lat"), F.col("lon"), 11).alias("g11"),
    ).collect()
    for r in rows:
        assert r.g8.startswith(r.g4) and r.g11.startswith(r.g8)


def test_quadkey_roundtrip_and_prefix(spark):
    df = _rand_points(spark, n=200, seed=13)
    z = 9
    qk = gx.quadkey_col(F.col("lat"), F.col("lon"), z)
    xt, yt = gx.quadkey_decode_cols(F.col("qk"), z)
    rows = (
        df.withColumn("qk", qk)
        .select(
            "qk",
            xt.alias("xt"),
            yt.alias("yt"),
            grid.tile_x_col(F.col("lon"), z).alias("xr"),
            grid.tile_y_col(F.col("lat"), z).alias("yr"),
            gx.quadkey_col(F.col("lat"), F.col("lon"), 4).alias("qk4"),
        )
        .collect()
    )
    for r in rows:
        assert (r.xt, r.yt) == (r.xr, r.yr)
        assert r.qk.startswith(r.qk4)


# --- the plan stays Python-free ---------------------------------------------


def test_geohash_plan_has_no_python(spark):
    df = _rand_points(spark, n=10)
    plan = df.select(
        gx.geohash_col(F.col("lat"), F.col("lon"), 8),
        gx.quadkey_col(F.col("lat"), F.col("lon"), 8),
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_reencode_of_decode_plan_stays_small(spark):
    # regression: the original per-char create_map decode built trees
    # that multiplied through downstream compositions and OOM'd the
    # optimizer at p=11; decode now parses the value in ONE conv()
    # node chain so the composed optimized plan stays bounded.
    #
    # NOTE deliberately no .filter("gh != gh2") here: Catalyst's
    # predicate pushdown substitutes aliased trees UNGUARDED (unlike
    # CollapseProject's cost check), and the part1by1/compact1by1
    # chains reference their input twice per step (64x), so a filter
    # over three chained computed-column projects multiplies to
    # millions of nodes regardless of how cheap decode is.  The
    # module docstring documents the hazard; the invariant is checked
    # driver-side instead.
    p = 11
    df = _rand_points(spark, n=50).withColumn(
        "gh", gx.geohash_col(F.col("lat"), F.col("lon"), p)
    )
    la, lo = gx.geohash_decode_cols(F.col("gh"), p)
    q = df.withColumn("dlat", la).withColumn("dlon", lo).select(
        "gh", gx.geohash_col(F.col("dlat"), F.col("dlon"), p).alias("gh2")
    )
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 500_000, f"optimized plan blew up: {len(plan)} chars"
    rows = q.collect()
    assert rows and all(r.gh == r.gh2 for r in rows)


# --- SQL twins: bit-exact vs DuckDB -----------------------------------------


@pytest.mark.parametrize("p,z", [(5, 6), (8, 9), (11, 3)])
def test_sql_twins_match_duckdb(spark, p, z):
    df = _rand_points(spark, n=400, seed=p * 100 + z)
    got = sorted(
        (r.gh, r.qk)
        for r in df.select(
            gx.geohash_col(F.col("lat"), F.col("lon"), p).alias("gh"),
            gx.quadkey_col(F.col("lat"), F.col("lon"), z).alias("qk"),
        ).collect()
    )
    pdf = df.toPandas()
    n = 1 << z
    tx = f"CAST(least(greatest(floor((lon + 180.0) / 360.0 * {n}), 0), {n - 1}) AS BIGINT)"
    latc = "least(greatest(lat, -85.05112878), 85.05112878)"
    merc = f"(1 - ln(tan(radians({latc})) + 1.0/cos(radians({latc}))) / pi()) / 2 * {n}"
    ty = f"CAST(least(greatest(floor({merc}), 0), {n - 1}) AS BIGINT)"
    con = duckdb.connect()
    con.register("pts", pdf)
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH t AS (SELECT lat AS la, lon AS lo, {tx} AS tx, {ty} AS ty FROM pts)
            SELECT {gx.geohash_sql('la', 'lo', p)} AS gh,
                   {gx.quadkey_sql('tx', 'ty', z)} AS qk
            FROM t
            """
        ).fetchall()
    )
    assert got == want
