"""Spatial k-anonymity: publish geotagged counts without disclosure.

Publishing per-cell document counts from a geotagged corpus leaks
location privacy when a cell holds fewer than k items (the classic
small-cell disclosure problem; national statistics offices suppress or
merge such cells).  :func:`anonymize_cells` implements the standard
bottom-up quadtree coarsening rule:

  start at ``max_zoom``; a cell with count >= k is PUBLISHED at that
  zoom; cells below threshold merge into their parent (counts summed)
  and retry one level up; whatever still fails at zoom 0 is SUPPRESSED.

Every published cell provably aggregates >= k items, and published +
suppressed counts PARTITION the input exactly: a point exits the
roll-up exactly once, so no point is ever counted twice.  Note the
residue semantics: a published parent's count covers only the points
NOT already published in a deeper descendant (the parent row means
"the rest of this cell"), so parent and child rows can coexist by
AREA while remaining disjoint by COUNT — the disclosure guarantee
(every published number >= k) holds either way.  All invariants are
pytest-pinned against a pure-Python replay.

Scale contract (100 TB): ONE corpus-scale aggregation (points ->
leaf-cell counts); the merge loop then runs on the cells-scale frame,
which at web-mercator zoom 12 is bounded by 16.7M rows WORLDWIDE
regardless of corpus size, and halves (at worst) each round.  No
collect, no window, no Python — the whole thing is Catalyst
aggregates, and the rule is simple integer arithmetic a SQL oracle
replays with one unrolled CTE per zoom level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from xarray_spatial_spark.grid import tile_x_col, tile_y_col


def anonymize_cells(
    df: DataFrame,
    k: int,
    max_zoom: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    include_suppressed: bool = False,
) -> DataFrame:
    """Bottom-up k-anonymous cell counts: (tile_x, tile_y, zoom, n)
    with every published n >= k.  With ``include_suppressed`` the
    zoom-0 residue below k is emitted too, flagged ``zoom = -1`` (its
    tile is the root), so callers can audit conservation."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if max_zoom < 0:
        raise ValueError("max_zoom must be >= 0")
    counts = (
        df.select(
            tile_x_col(F.col(lon_col), max_zoom).alias("tile_x"),
            tile_y_col(F.col(lat_col), max_zoom).alias("tile_y"),
        )
        .groupBy("tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    published = []
    cur = counts
    for zoom in range(max_zoom, 0, -1):
        published.append(
            cur.where(F.col("n") >= k)
            .select("tile_x", "tile_y", F.lit(zoom).alias("zoom"), "n")
        )
        cur = (
            cur.where(F.col("n") < k)
            .groupBy(
                F.expr("tile_x div 2").alias("tile_x"),
                F.expr("tile_y div 2").alias("tile_y"),
            )
            .agg(F.sum("n").alias("n"))
        )
    published.append(
        cur.where(F.col("n") >= k)
        .select("tile_x", "tile_y", F.lit(0).alias("zoom"), "n")
    )
    out = published[0]
    for p in published[1:]:
        out = out.unionByName(p)
    if include_suppressed:
        out = out.unionByName(
            cur.where(F.col("n") < k)
            .select("tile_x", "tile_y", F.lit(-1).alias("zoom"), "n")
        )
    return out


def cell_bounds(df: DataFrame) -> DataFrame:
    """Web-mercator lon/lat bounding box for (tile_x, tile_y, zoom)
    rows — the publishable geometry of an anonymized cell.  Inverse of
    the tile formulas; pure Catalyst."""
    import math

    n = F.pow(F.lit(2.0), F.col("zoom").cast("double"))
    lon_w = F.col("tile_x") / n * 360.0 - 180.0
    lon_e = (F.col("tile_x") + 1) / n * 360.0 - 180.0
    # y tile edge -> latitude: lat = atan(sinh(pi * (1 - 2*y/n)))
    def lat_of(yt):
        t = F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * yt / n)
        return F.degrees(F.atan((F.exp(t) - F.exp(-t)) / F.lit(2.0)))

    return df.select(
        "*",
        lon_w.alias("lon_min"), lon_e.alias("lon_max"),
        lat_of(F.col("tile_y") + 1).alias("lat_min"),
        lat_of(F.col("tile_y").cast("double")).alias("lat_max"),
    )
