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
    range -> NULLs.  Zero-shuffle broadcast NN join.

    With a finite ``max_distance`` the broadcast carries a grid-bucket
    index (cell side = the search radius) and each point only scores
    targets in its 3x3 cell ring — O(local density) per point instead
    of the dense O(P x T) matrix, which is what makes raster proximity
    (targets = every non-zero cell) survive 100x target counts."""
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
    txa = tpdf[x_col].to_numpy(np.float64)
    tya = tpdf[y_col].to_numpy(np.float64)
    payload = {
        "tx": txa,
        "ty": tya,
        "tv": tpdf[target_payload].to_numpy() if target_payload else None,
        "cell": None,
        "index": None,
    }
    if math.isfinite(max_distance) and max_distance > 0 and len(tpdf):
        # bucket targets on a grid whose cell side >= the search radius:
        # every in-range target of a point lies in its 3x3 cell ring
        # (euclidean and manhattan balls both fit; great-circle uses a
        # degree cell widened by the worst-case lon shrink below)
        if metric.upper() == "GREAT_CIRCLE":
            cell = max_distance / 111320.0  # meters -> degrees latitude
        else:
            cell = float(max_distance)
        index: dict[tuple[int, int], list[int]] = {}
        cxs = np.floor(txa / cell).astype(np.int64)
        cys = np.floor(tya / cell).astype(np.int64)
        for i, (cx, cy) in enumerate(zip(cxs, cys)):
            index.setdefault((int(cx), int(cy)), []).append(i)
        payload["cell"] = cell
        payload["index"] = {k: np.asarray(v, np.int64) for k, v in index.items()}
    bc = sc.broadcast(payload)

    out_fields = "nearest_dist double, nearest_x double, nearest_y double"
    if target_payload:
        out_fields += f", nearest_{target_payload} double"
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in points.schema)
    schema += ", " + out_fields

    empty = len(tpdf) == 0

    gc = metric.upper() == "GREAT_CIRCLE"

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = bc.value
        tx, ty, tv = t["tx"], t["ty"], t["tv"]
        cell, index = t["cell"], t["index"]
        for pdf in batches:
            n = len(pdf)
            dist = np.full(n, np.nan)
            bx = np.full(n, np.nan)
            by = np.full(n, np.nan)
            bv = np.full(n, np.nan)
            if not empty and n:
                px = pdf[x_col].to_numpy(np.float64)
                py = pdf[y_col].to_numpy(np.float64)
                if index is not None:
                    # bucket-pruned path: per occupied point cell, score
                    # only targets in the 3x3 (lon-widened for
                    # great-circle) neighbor cells
                    pcx = np.floor(px / cell).astype(np.int64)
                    pcy = np.floor(py / cell).astype(np.int64)
                    order = np.lexsort((pcx, pcy))
                    keys = pcy[order] * (1 << 32) + pcx[order]
                    starts = np.flatnonzero(
                        np.r_[True, keys[1:] != keys[:-1]]
                    ).tolist() + [n]
                    for gi in range(len(starts) - 1):
                        rows = order[starts[gi]:starts[gi + 1]]
                        cx, cy = int(pcx[rows[0]]), int(pcy[rows[0]])
                        rx = 1
                        if gc:
                            lat_edge = min(
                                89.0, abs(py[rows[0]]) + 2 * cell
                            )
                            rx = int(np.ceil(
                                1.0 / max(np.cos(np.radians(lat_edge)), 1e-3)
                            ))
                        cand = [
                            index.get((cx + dx, cy + dy))
                            for dy in (-1, 0, 1)
                            for dx in range(-rx, rx + 1)
                        ]
                        cand = [c for c in cand if c is not None]
                        if not cand:
                            continue
                        ci = np.sort(np.concatenate(cand))  # payload order
                        d = _dist_matrix(px[rows], py[rows], tx[ci], ty[ci],
                                         metric)
                        loc = np.argmin(d, axis=1)
                        rr = np.arange(len(rows))
                        dist[rows] = d[rr, loc]
                        sel = ci[loc]
                        bx[rows] = tx[sel]
                        by[rows] = ty[sel]
                        if tv is not None:
                            bv[rows] = tv[sel]
                else:
                    # dense path: chunk rows so the (rows, T) matrix
                    # stays in cache/RAM
                    step = max(1, chunk // max(1, len(tx)))
                    for s in range(0, n, step):
                        e = min(n, s + step)
                        d = _dist_matrix(px[s:e], py[s:e], tx, ty, metric)
                        idx = np.argmin(d, axis=1)  # first min => min payload
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
    strategy: str | None = None,
) -> DataFrame:
    """Shared proximity/allocation/direction plan, routed through the
    plans/joins.py strategy planner: <=64 targets inline into codegen
    (expr), <=5M broadcast with cell-bucket pruning, beyond that the
    cell-ring shuffle join (requires finite max_distance).  One tiny
    count job sizes the target side (the Spark analog of the
    reference's bounded-vs-global dispatch, xrspatial/proximity.py:
    605-627)."""
    from xarray_spatial_spark.plans.joins import nearest_join, nearest_plan

    targets = _targets(raster, value_col, target_values)
    n_targets = targets.count()
    chosen = strategy or nearest_plan(n_targets, k=1, max_distance=max_distance)

    if chosen == "ring":
        pid = F.struct(F.col(x_col).alias("px"), F.col(y_col).alias("py"))
        pts = raster.withColumn("_pid", pid)
        tgt = targets.withColumn(
            "_tid", F.struct(F.col(x_col).alias("px"), F.col(y_col).alias("py"))
        )
        rj = nearest_join(
            pts, tgt, x_col=x_col, y_col=y_col, target_payload=value_col,
            metric=distance_metric, max_distance=max_distance, k=1,
            n_targets=n_targets, strategy="ring",
            point_id="_pid", target_id="_tid",
        ).filter(F.col("dist") <= max_distance)
        near = (
            pts.join(rj, "_pid", "left")
            .withColumn("nearest_dist", F.col("dist"))
            .withColumn("nearest_x", F.col("_tx"))
            .withColumn("nearest_y", F.col("_ty"))
            .withColumn(f"nearest_{value_col}", F.col("_tpay"))
        )
    else:
        near = nearest_join(
            raster, targets, x_col=x_col, y_col=y_col,
            target_payload=value_col,
            metric=distance_metric, max_distance=max_distance,
            n_targets=n_targets, strategy=chosen,
        )
        if chosen == "expr":
            # expr inlines the payload as nearest_payload; align to the
            # broadcast naming the mode selectors below use
            near = near.withColumnRenamed("nearest_payload",
                                          f"nearest_{value_col}")
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
    strategy: str | None = None,
) -> DataFrame:
    """Distance from every cell to its nearest target (proximity.py:652-790)."""
    return _proximity_family(
        raster, "proximity", x_col, y_col, value_col, target_values,
        max_distance, distance_metric, strategy=strategy,
    )


def allocation(
    raster: DataFrame,
    x_col: str = "lon",
    y_col: str = "lat",
    value_col: str = "value",
    target_values: Iterable[float] | None = None,
    max_distance: float = math.inf,
    distance_metric: str = "EUCLIDEAN",
    strategy: str | None = None,
) -> DataFrame:
    """Value of the nearest target — Voronoi assignment (proximity.py:793-928)."""
    return _proximity_family(
        raster, "allocation", x_col, y_col, value_col, target_values,
        max_distance, distance_metric, strategy=strategy,
    )


def direction(
    raster: DataFrame,
    x_col: str = "lon",
    y_col: str = "lat",
    value_col: str = "value",
    target_values: Iterable[float] | None = None,
    max_distance: float = math.inf,
    distance_metric: str = "EUCLIDEAN",
    strategy: str | None = None,
) -> DataFrame:
    """Compass bearing to the nearest target (proximity.py:931-1071)."""
    return _proximity_family(
        raster, "direction", x_col, y_col, value_col, target_values,
        max_distance, distance_metric, strategy=strategy,
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
            F.lit(float(tx)).alias("x"),
            F.lit(float(ty)).alias("y"),
        )
        for tx, ty, pl in targets
    ]
    best = F.least(*structs)
    return (
        points.withColumn("nearest_dist", best["d"])
        .withColumn("nearest_payload", best["p"])
        .withColumn("nearest_x", best["x"])
        .withColumn("nearest_y", best["y"])
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
    target_payload: str | None = None,
    include_xy: bool = False,
    max_distance_deg: float | None = None,
) -> DataFrame:
    """Approximate-exact kNN: bucket targets by grid cell at ``zoom``;
    explode each query point to its neighbor-ring cells; equi-join on
    cell; exact distance; top-k per point.

    Exact whenever the true k-th neighbor lies within the ring —
    pick ``zoom`` so one cell spans the expected search radius (the same
    bound as the reference's chunk padding, proximity.py:614-618).
    With ``max_distance_deg`` the ring is EXACT at every latitude: the
    vertical span is read off the mercator tile rows of
    ``lat ± max_distance_deg`` (tile_y is monotone in lat, so those
    two rows bound every target within the radius — no cos()
    approximation, no |lat| restriction), widened per point via
    ``grid.neighbors_span``.  A per-point candidate-cell budget of
    4096 guards the polar blow-up (thin cells): beyond it the call
    raises with the zoom to use instead.  Points whose ring holds no
    targets are left out (caller widens the ring or falls back to
    ``nearest_broadcast``)."""
    r = ring

    @F.pandas_udf("array<long>")
    def _disk(lon: pd.Series, lat: pd.Series) -> pd.Series:
        lo = lon.to_numpy(np.float64)
        la = lat.to_numpy(np.float64)
        cells = grid.cell_of(lo, la, zoom)
        if max_distance_deg is None:
            return pd.Series(list(grid.neighbors_disk(cells, r)))
        span = 360.0 / (1 << zoom)  # cell lon-span in degrees
        rx = max(r, int(np.ceil(max_distance_deg / span)))
        _, yt = grid.lnglat_to_tile(lo, la, zoom)
        _, ty_top = grid.lnglat_to_tile(lo, la + max_distance_deg, zoom)
        _, ty_bot = grid.lnglat_to_tile(lo, la - max_distance_deg, zoom)
        up = np.maximum(yt - ty_top, r)
        dn = np.maximum(ty_bot - yt, r)
        ncells = (2 * rx + 1) * (up + dn + 1)
        if ncells.max() > 4096:
            raise ValueError(
                f"knn_ring_join: a point near lat {la[int(np.argmax(ncells))]:.2f} "
                f"needs {int(ncells.max())} candidate cells at zoom {zoom} for "
                f"max_distance_deg={max_distance_deg}; lower the zoom by "
                # cells shrink ~4x per level (rx and up/dn each halve)
                f"~{int(np.ceil(np.log2(ncells.max() / 4096) / 2))} levels"
            )
        out = np.empty(len(cells), dtype=object)
        key = up * (int(dn.max()) + 1) + dn
        for kv in np.unique(key):
            idx = np.flatnonzero(key == kv)
            rect = grid.neighbors_span(
                cells[idx], rx, int(up[idx[0]]), int(dn[idx[0]])
            )
            for j, i in enumerate(idx):
                out[i] = rect[j]
        return pd.Series(list(out))

    @F.pandas_udf("long")
    def _cell(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(grid.cell_of(lon.to_numpy(np.float64), lat.to_numpy(np.float64), zoom))

    extra = [F.col(target_payload).alias("_tpay")] if target_payload else []
    t = targets.select(
        F.col(target_id),
        F.col(x_col).alias("_tx"),
        F.col(y_col).alias("_ty"),
        _cell(F.col(x_col), F.col(y_col)).alias("_tcell"),
        *extra,
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
    # equidistant ties break toward the smallest payload (then id),
    # matching nearest_broadcast's payload-sorted argmin
    tie = ([F.col("_tpay").asc()] if target_payload else [])
    w = Window.partitionBy(point_id).orderBy(
        F.col("dist").asc(), *tie, F.col(target_id).asc()
    )
    keep = [point_id, target_id, "dist", "knn_rank"]
    if include_xy:
        keep += ["_tx", "_ty"]
    if target_payload:
        keep += ["_tpay"]
    return (
        joined.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select(*keep)
    )
