"""Proximity / allocation / direction + kNN — the distance-join family.

Reference semantics: xrspatial/proximity.py (proximity :652-790,
allocation :793-928, direction :931-1071; target rule :318-327 —
explicit ``target_values``, else any non-zero finite cell; metrics
:38-235; ``max_distance`` -> NaN beyond :386-397).

The reference runs a GDAL-style two-pass dynamic-programming scan per
raster (sequential in y), and under dask pads every chunk by
``max_distance/cellsize`` cells (proximity.py:603-627), falling back
to a SINGLE chunk when the distance is unbounded (:605-612) — its own
docs call out that this does not scale (:713-720).

Spark re-plan: targets are sparse, so this is a **broadcast
nearest-neighbor join**, not a scan:

- job 1: extract target cells (a filter; predicate pushed to the scan)
  and broadcast them (``sc.broadcast`` of packed numpy arrays, the
  "broadcast R-tree" role).
- job 2: one ``mapInPandas`` pass over the cells computing vectorized
  distance-to-all-targets per Arrow batch with running min — zero
  shuffles, embarrassingly parallel, identical results at any
  parallelism.

When the target side is too big to broadcast, ``knn_ring_join`` is the
shuffle path: bucket both sides by grid cell at a zoom matched to the
search radius, explode query cells to their neighbor ring, equi-join
on cell (AQE skew-join handles hot cells), exact distance + windowed
top-k.  Strategy choice mirrors Spark's own broadcast-vs-shuffle
decision and is explicit in plans/joins.py.

Ties in allocation break toward the smallest target value (the
deterministic analog of the reference's scan-order tie; documented
deviation — scan order is not defined for a distributed scan).
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xarray_spatial_spark import grid
from xarray_spatial_spark.functions.geo import EARTH_RADIUS, distance_col

_BROADCAST_CAP = 5_000_000  # targets above this must use knn_ring_join


def _dist_matrix(
    px: np.ndarray, py: np.ndarray, tx: np.ndarray, ty: np.ndarray, metric: str
) -> np.ndarray:
    """(P, T) distances, vectorized numpy. Formulas mirror
    reference proximity.py:39-221."""
    dx = px[:, None] - tx[None, :]
    dy = py[:, None] - ty[None, :]
    m = metric.upper()
    if m == "EUCLIDEAN":
        return np.sqrt(dx * dx + dy * dy)
    if m == "MANHATTAN":
        return np.abs(dx) + np.abs(dy)
    if m == "GREAT_CIRCLE":
        lat1 = np.radians(py)[:, None]
        lat2 = np.radians(ty)[None, :]
        dlat = lat2 - lat1
        dlon = np.radians(tx)[None, :] - np.radians(px)[:, None]
        a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
        return EARTH_RADIUS * 2.0 * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))
    raise ValueError(f"unknown metric {metric!r}")


def _bearing(px, py, tx, ty):
    """Compass direction (reference proximity.py:238-258), vectorized."""
    x = tx - px
    y = ty - py
    d = np.degrees(np.arctan2(-y, x))  # 57.29578 * atan2
    out = np.where(d < 0, 90.0 - d, np.where(d > 90.0, 450.0 - d, 90.0 - d))
    return np.where((x == 0) & (y == 0), 0.0, out)


def nearest_broadcast(
    points: DataFrame,
    targets: DataFrame,
    x_col: str = "lon",
    y_col: str = "lat",
    target_payload: str | None = None,
    metric: str = "EUCLIDEAN",
    max_distance: float = math.inf,
    chunk: int = 1 << 22,
) -> DataFrame:
    """Append nearest-target columns to ``points``: ``nearest_dist``,
    ``nearest_x``, ``nearest_y``[, ``nearest_<payload>``].  No target in
    range -> NULLs.  Zero-shuffle broadcast NN join."""
    sc = points.sparkSession.sparkContext
    tcols = [x_col, y_col] + ([target_payload] if target_payload else [])
    tpdf = targets.select(*tcols).toPandas()
    if len(tpdf) > _BROADCAST_CAP:
        raise ValueError(
            f"{len(tpdf)} targets exceed broadcast cap; use knn_ring_join"
        )
    # sort by payload (then coords) so argmin tie-breaks to smallest value
    sort_cols = ([target_payload] if target_payload else []) + [x_col, y_col]
    tpdf = tpdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    bc = sc.broadcast(
        {
            "tx": tpdf[x_col].to_numpy(np.float64),
            "ty": tpdf[y_col].to_numpy(np.float64),
            "tv": tpdf[target_payload].to_numpy() if target_payload else None,
        }
    )

    out_fields = "nearest_dist double, nearest_x double, nearest_y double"
    if target_payload:
        out_fields += f", nearest_{target_payload} double"
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in points.schema)
    schema += ", " + out_fields

    empty = len(tpdf) == 0

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = bc.value
        tx, ty, tv = t["tx"], t["ty"], t["tv"]
        for pdf in batches:
            n = len(pdf)
            dist = np.full(n, np.nan)
            bx = np.full(n, np.nan)
            by = np.full(n, np.nan)
            bv = np.full(n, np.nan)
            if not empty and n:
                px = pdf[x_col].to_numpy(np.float64)
                py = pdf[y_col].to_numpy(np.float64)
                # chunk rows so the (rows, T) matrix stays in cache/RAM
                step = max(1, chunk // max(1, len(tx)))
                for s in range(0, n, step):
                    e = min(n, s + step)
                    d = _dist_matrix(px[s:e], py[s:e], tx, ty, metric)
                    idx = np.argmin(d, axis=1)  # first min => smallest payload
                    rows = np.arange(e - s)
                    dist[s:e] = d[rows, idx]
                    bx[s:e] = tx[idx]
                    by[s:e] = ty[idx]
                    if tv is not None:
                        bv[s:e] = tv[idx]
                beyond = dist > max_distance
                dist[beyond] = np.nan
                bx[beyond] = np.nan
                by[beyond] = np.nan
                bv[beyond] = np.nan
            res = pdf.copy()
            res["nearest_dist"] = dist
            res["nearest_x"] = bx
            res["nearest_y"] = by
            if target_payload:
                res[f"nearest_{target_payload}"] = bv
            yield res

    return points.mapInPandas(_op, schema=schema)


def _targets(
    raster: DataFrame, value_col: str, target_values: Iterable[float] | None
) -> DataFrame:
    """Target rule, reference proximity.py:318-327: explicit values, else
    any non-zero finite (NULL = NaN/inf already excluded on ingest)."""
    tv = list(target_values or [])
    if tv:
        return raster.filter(F.col(value_col).isin(tv))
    return raster.filter(F.col(value_col).isNotNull() & (F.col(value_col) != 0))


def _proximity_family(
    raster: DataFrame,
    mode: str,
    x_col: str,
    y_col: str,
    value_col: str,
    target_values: Iterable[float] | None,
    max_distance: float,
    distance_metric: str,
) -> DataFrame:
    near = nearest_broadcast(
        raster,
        _targets(raster, value_col, target_values),
        x_col=x_col,
        y_col=y_col,
        target_payload=value_col if mode == "allocation" else None,
        metric=distance_metric,
        max_distance=max_distance,
    )
    if mode == "proximity":
        out = F.col("nearest_dist")
    elif mode == "allocation":
        out = F.col(f"nearest_{value_col}")
    else:  # direction: bearing to the nearest target, 0 at the target itself
        rad = math.pi / 180.0
        px, py = F.col(x_col), F.col(y_col)
        tx, ty = F.col("nearest_x"), F.col("nearest_y")
        d = F.atan2(-(ty - py), tx - px) * F.lit(57.29578)
        folded = (
            F.when(d < 0, F.lit(90.0) - d)
            .when(d > 90.0, F.lit(360.0) - d + F.lit(90.0))
            .otherwise(F.lit(90.0) - d)
        )
        out = F.when(F.col("nearest_dist").isNull(), F.lit(None)).otherwise(
            F.when((tx == px) & (ty == py), F.lit(0.0)).otherwise(folded)
        )
    keep = [c for c in raster.columns if c != value_col]
    return near.select(*keep, out.alias(value_col))


def proximity(
    raster: DataFrame,
    x_col: str = "lon",
    y_col: str = "lat",
    value_col: str = "value",
    target_values: Iterable[float] | None = None,
    max_distance: float = math.inf,
    distance_metric: str = "EUCLIDEAN",
) -> DataFrame:
    """Distance from every cell to its nearest target (proximity.py:652-790)."""
    return _proximity_family(
        raster, "proximity", x_col, y_col, value_col, target_values,
        max_distance, distance_metric,
    )


def allocation(
    raster: DataFrame,
    x_col: str = "lon",
    y_col: str = "lat",
    value_col: str = "value",
    target_values: Iterable[float] | None = None,
    max_distance: float = math.inf,
    distance_metric: str = "EUCLIDEAN",
) -> DataFrame:
    """Value of the nearest target — Voronoi assignment (proximity.py:793-928)."""
    return _proximity_family(
        raster, "allocation", x_col, y_col, value_col, target_values,
        max_distance, distance_metric,
    )


def direction(
    raster: DataFrame,
    x_col: str = "lon",
    y_col: str = "lat",
    value_col: str = "value",
    target_values: Iterable[float] | None = None,
    max_distance: float = math.inf,
    distance_metric: str = "EUCLIDEAN",
) -> DataFrame:
    """Compass bearing to the nearest target (proximity.py:931-1071)."""
    return _proximity_family(
        raster, "direction", x_col, y_col, value_col, target_values,
        max_distance, distance_metric,
    )


def nearest_expr(
    points: DataFrame,
    targets: list[tuple[float, float, float]],
    x_col: str = "lon",
    y_col: str = "lat",
    metric: str = "EUCLIDEAN",
    max_targets: int = 64,
) -> DataFrame:
    """Compiled nearest-target (kNN-1 / allocation fast path): a SMALL
    broadcast target set inlines into whole-stage codegen as a LEAST
    chain over (distance, payload) structs — no Python, no shuffle,
    fuses with the surrounding stages.  ``targets`` = [(x, y, payload)].
    Ties break toward the smaller payload (struct ordering), matching
    ``nearest_broadcast``.  Adds ``nearest_dist`` + ``nearest_payload``."""
    if len(targets) > max_targets:
        raise ValueError(f"{len(targets)} targets: use nearest_broadcast")
    px, py = F.col(x_col), F.col(y_col)
    structs = [
        F.struct(
            distance_col(px, F.lit(float(tx)), py, F.lit(float(ty)), metric).alias("d"),
            F.lit(float(pl)).alias("p"),
        )
        for tx, ty, pl in targets
    ]
    best = F.least(*structs)
    return points.withColumn("nearest_dist", best["d"]).withColumn(
        "nearest_payload", best["p"]
    )


# ---------------------------------------------------------------------------
# Distributed kNN via cell-ring expansion (the shuffle path)
# ---------------------------------------------------------------------------


def knn_ring_join(
    points: DataFrame,
    targets: DataFrame,
    k: int = 1,
    zoom: int = 8,
    ring: int = 1,
    x_col: str = "lon",
    y_col: str = "lat",
    point_id: str = "doc_id",
    target_id: str = "target_id",
    metric: str = "EUCLIDEAN",
) -> DataFrame:
    """Approximate-exact kNN: bucket targets by grid cell at ``zoom``;
    explode each query point to its (2*ring+1)^2 neighbor cells; equi-join
    on cell; exact distance; top-k per point.

    Exact whenever the true k-th neighbor lies within ``ring`` cells —
    pick ``zoom`` so one cell spans the expected search radius (the same
    bound as the reference's chunk padding, proximity.py:614-618).
    Points whose ring holds no targets are left out (caller widens the
    ring or falls back to ``nearest_broadcast``).
    """
    r = ring

    @F.pandas_udf("array<long>")
    def _disk(lon: pd.Series, lat: pd.Series) -> pd.Series:
        cells = grid.cell_of(lon.to_numpy(np.float64), lat.to_numpy(np.float64), zoom)
        disks = grid.neighbors_disk(cells, r)
        return pd.Series(list(disks))

    @F.pandas_udf("long")
    def _cell(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(grid.cell_of(lon.to_numpy(np.float64), lat.to_numpy(np.float64), zoom))

    t = targets.select(
        F.col(target_id),
        F.col(x_col).alias("_tx"),
        F.col(y_col).alias("_ty"),
        _cell(F.col(x_col), F.col(y_col)).alias("_tcell"),
    )
    p = points.select(
        F.col(point_id),
        F.col(x_col).alias("_px"),
        F.col(y_col).alias("_py"),
        F.explode(_disk(F.col(x_col), F.col(y_col))).alias("_tcell"),
    )
    joined = p.join(t, "_tcell").withColumn(
        "dist",
        distance_col(F.col("_px"), F.col("_tx"), F.col("_py"), F.col("_ty"), metric),
    )
    w = Window.partitionBy(point_id).orderBy(F.col("dist").asc(), F.col(target_id).asc())
    return (
        joined.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select(point_id, target_id, "dist", "knn_rank")
    )
