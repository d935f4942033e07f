"""Distributed exact DBSCAN over planar points (eps-grid + CCL).

The reference's proximity family (xrspatial/proximity.py) answers
"how far is every cell from a target"; DBSCAN answers the inverse
corpus question — "which geocoded pages form dense spatial clusters"
— and is the standard density-clustering primitive a web-scale
spatial table needs (city/POI discovery over page geotags, spam-farm
colocation, datacenter-IP clumps).

Exact semantics (Ester et al. 1996):

- core point:   |N_eps(p)| >= min_pts, the point itself included;
- cluster:      connected component of core points under the
                "within eps" relation;
- border point: non-core within eps of >= 1 core — assigned to the
                SMALLEST cluster label among its core neighbors
                (deterministic tie-break; plain DBSCAN is
                order-dependent here, which would break any oracle);
- noise:        everything else, cluster = NULL.

Distributed plan (the standard eps-grid decomposition, e.g. the
MR-DBSCAN family):

1. bucket every point into an eps-sized grid cell
   (floor(x/eps), floor(y/eps));
2. candidate pairs = ONE equi-join: the left side explodes its 3x3
   neighbor cell keys, the right side is keyed by its own cell —
   any pair within eps is at most one cell apart, so the join loses
   nothing, and each ordered pair is produced exactly once;
3. exact distance filter (squared, no sqrt) -> neighbor pairs;
4. degree count -> core flags (one groupBy);
5. cluster labels = graph.connected_components over core-core pairs
   (min-label + pointer-jump, O(log diameter) rounds);
6. border assignment = min core-neighbor label (one groupBy).

Scale notes: the exchange is pairs-shaped — O(n * avg_eps_density).
A pathologically dense single cell makes its in-cell pair count
quadratic; that's inherent to EXACT DBSCAN (the answer itself is
that big), and AQE skew-join (on in session.py) splits the hot cell's
join tasks.  For web-scale point sets the right eps keeps
avg_eps_density O(1)-ish; callers who can tolerate approximation
should pre-aggregate to cells and cluster those instead
(operators/spatialstats.kde_smooth + thresholding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.graph import connected_components


def neighbor_pairs(
    points: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    eps: float = 1.0,
) -> DataFrame:
    """Ordered pairs (id, nb_id) with 0 < dist <= eps, via the 3x3
    eps-grid equi-join.  Each ordered pair appears exactly once."""
    if eps <= 0:
        raise ValueError("eps must be > 0")
    pts = points.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    )
    keyed = pts.select(
        "_id", "_x", "_y",
        F.floor(F.col("_x") / F.lit(float(eps))).alias("_cx"),
        F.floor(F.col("_y") / F.lit(float(eps))).alias("_cy"),
    )
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    ])
    left = keyed.withColumn("_o", F.explode(offs)).select(
        F.col("_id").alias("_aid"),
        F.col("_x").alias("_ax"),
        F.col("_y").alias("_ay"),
        (F.col("_cx") + F.col("_o.dx")).alias("_cx"),
        (F.col("_cy") + F.col("_o.dy")).alias("_cy"),
    )
    right = keyed.select(
        F.col("_id").alias("_bid"),
        F.col("_x").alias("_bx"),
        F.col("_y").alias("_by"),
        "_cx", "_cy",
    )
    dx = F.col("_ax") - F.col("_bx")
    dy = F.col("_ay") - F.col("_by")
    return (
        left.join(right, ["_cx", "_cy"])
        .where((F.col("_aid") != F.col("_bid"))
               & (dx * dx + dy * dy <= F.lit(float(eps) * float(eps))))
        .select(F.col("_aid").alias("id"), F.col("_bid").alias("nb_id"))
    )


def dbscan(
    points: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    eps: float = 1.0,
    min_pts: int = 5,
) -> DataFrame:
    """Exact DBSCAN.  Returns one row per input point:
    ``(id, is_core boolean, cluster long)`` — cluster is the smallest
    point id in the cluster's core component, NULL for noise.

    ``min_pts`` counts the point itself (the classical definition)."""
    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")
    pairs = neighbor_pairs(points, id_col, x_col, y_col, eps)
    # pairs feed three consumers (degree, core edges, border
    # assignment) — materialize once so the 3x3 join runs once
    pairs = pairs.localCheckpoint()
    deg = pairs.groupBy("id").agg((F.count(F.lit(1)) + 1).alias("_k"))
    ids = points.select(F.col(id_col).alias("id"))
    core = (
        ids.join(deg, "id", "left")
        .select("id", (F.coalesce(F.col("_k"), F.lit(1)) >= min_pts).alias("is_core"))
    )
    core_ids = core.where("is_core").select("id")
    core_edges = (
        pairs.join(core_ids, "id")
        .join(core_ids.select(F.col("id").alias("nb_id")), "nb_id")
    )
    # isolated cores (min_pts == 1 with no neighbor) still form their
    # own singleton cluster: connected_components only sees nodes with
    # edges, so seed labels from the core set itself
    labels = connected_components(core_edges, src="id", dst="nb_id").select(
        F.col("node").alias("id"), F.col("label").alias("cluster")
    )
    core_labeled = (
        core_ids.join(labels, "id", "left")
        .select("id", F.coalesce(F.col("cluster"), F.col("id")).alias("cluster"))
    )
    border = (
        pairs.join(core_labeled.select(F.col("id").alias("nb_id"),
                                       F.col("cluster")), "nb_id")
        .join(core_ids, "id", "left_anti")
        .groupBy("id")
        .agg(F.min("cluster").alias("cluster"))
    )
    assigned = core_labeled.unionByName(border)
    return (
        core.join(assigned, "id", "left")
        .select("id", "is_core", F.col("cluster").cast("long").alias("cluster"))
    )
