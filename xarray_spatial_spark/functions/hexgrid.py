"""Hexagonal cell index — the H3-analog of this engine's index family
(mercator/Morton cells in grid.py, real S2 in s2.py, geohash/quadkey
in geoindex.py).  Pointy-top axial hexagons on the planar lon/lat
plane: assignment is the standard fractional-axial transform + cube
rounding, expressed as whole-stage-codegen Column expressions — no
UDF — with ``*_sql`` twins that replay the IDENTICAL float arithmetic
in any ANSI engine (rounding is written as ``floor(v + 0.5)`` in both,
sidestepping engine ROUND-mode differences entirely).

Why hexagons at 100 TB: every cell has exactly 6 equidistant
neighbours (no diagonal-vs-edge asymmetry like square tiles), so
focal smoothing, kNN ring expansion, and gradient estimates are
isotropic — the reason H3 exists.  A cell id is pure integer
arithmetic over (q, r), so grouping, range-partitioning, and
neighbour sends are all shuffle-key math, never geometry.

Geometry (size s = circumradius, pointy-top):
  qf = (sqrt(3)/3 * x - 1/3 * y) / s      rf = (2/3 * y) / s
  center(q, r) = (s * (sqrt(3) * q + sqrt(3)/2 * r),  s * 1.5 * r)
Cube rounding picks the nearest hex center (ties measure-zero).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# exact double constants; repr() of these SAME values is embedded in
# the SQL twins, so both engines compute on identical bit patterns
_C_Q = math.sqrt(3.0) / 3.0
_C_Y = 1.0 / 3.0
_C_R = 2.0 / 3.0
_SQRT3 = math.sqrt(3.0)
_C_HALF = math.sqrt(3.0) / 2.0

# axial neighbour directions, pointy-top, CCW from east
HEX_DIRS = [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)]

_PACK_OFF = 1 << 21
_PACK_MUL = 1 << 22


def hex_cell_cols(x: Column, y: Column, size: float) -> tuple[Column, Column]:
    """Axial (q, r) of the hex containing (x, y) — codegen'd floats,
    rounding via floor(v + 0.5) (identical in the SQL twin)."""
    qf = (F.lit(_C_Q) * x - F.lit(_C_Y) * y) / F.lit(size)
    rf = (F.lit(_C_R) * y) / F.lit(size)
    sf = -qf - rf
    rq = F.floor(qf + F.lit(0.5)).cast("double")
    rr = F.floor(rf + F.lit(0.5)).cast("double")
    rs = F.floor(sf + F.lit(0.5)).cast("double")
    dq = F.abs(rq - qf)
    dr = F.abs(rr - rf)
    ds = F.abs(rs - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = (~fix_q) & (dr > ds)
    q = F.when(fix_q, -rr - rs).otherwise(rq).cast("long")
    r = F.when(fix_r, -rq - rs).otherwise(rr).cast("long")
    return q, r


def hex_center_cols(q: Column, r: Column, size: float) -> tuple[Column, Column]:
    """Center of hex (q, r) — exact products of integers and shared
    double constants, bit-identical in any engine."""
    cx = F.lit(size) * (F.lit(_SQRT3) * q + F.lit(_C_HALF) * r)
    cy = F.lit(size) * (F.lit(1.5) * r)
    return cx, cy


def hex_pack(q: Column, r: Column) -> Column:
    """(q, r) -> one bigint shuffle/cluster key (|q|,|r| < 2^21)."""
    return (q + F.lit(_PACK_OFF)) * F.lit(_PACK_MUL) + (r + F.lit(_PACK_OFF))


def hex_unpack(cell: Column) -> tuple[Column, Column]:
    q = F.floor(cell / F.lit(_PACK_MUL)).cast("long") - F.lit(_PACK_OFF)
    r = (cell % F.lit(_PACK_MUL)).cast("long") - F.lit(_PACK_OFF)
    return q, r


def hex_distance(q1: Column, r1: Column, q2: Column, r2: Column) -> Column:
    """Hex grid distance = (|dq| + |dr| + |dq + dr|) / 2 (integer)."""
    dq = q1 - q2
    dr = r1 - r2
    return ((F.abs(dq) + F.abs(dr) + F.abs(dq + dr)) / F.lit(2)).cast("long")


def hex_disk_offsets(r: int) -> np.ndarray:
    """All 1 + 3r(r+1) axial offsets at hex-distance <= r (rings 0..r
    concatenated) — the candidate-cell cover for bounded kNN."""
    return np.concatenate([hex_ring_offsets(k) for k in range(r + 1)])


def hex_ring_offsets(k: int) -> np.ndarray:
    """The 6k axial offsets at exactly hex-distance k (k=0 -> [(0,0)]);
    the expansion schedule for hex kNN, mirroring grid.ring."""
    if k == 0:
        return np.zeros((1, 2), dtype=np.int64)
    out = []
    q, r = -k, k  # start at direction 4 * k (south-west corner)
    for d in range(6):
        dq, dr = HEX_DIRS[d]
        for _ in range(k):
            out.append((q, r))
            q += dq
            r += dr
    return np.asarray(out, dtype=np.int64)


# ---------------------------------------------------------------------------
# SQL twins (identical arithmetic, linear-size expansion)
# ---------------------------------------------------------------------------

def _d(v: float) -> str:
    """Embed a double literal; bare numerics parse as DECIMAL in DuckDB,
    which would silently change the arithmetic (and the rounding)."""
    return f"CAST({v!r} AS DOUBLE)"


def hex_cell_sql(x_expr: str, y_expr: str, size: float) -> tuple[str, str]:
    qf = f"(({_d(_C_Q)} * ({x_expr}) - {_d(_C_Y)} * ({y_expr})) / {_d(size)})"
    rf = f"(({_d(_C_R)} * ({y_expr})) / {_d(size)})"
    sf = f"(-{qf} - {rf})"
    rq = f"floor({qf} + {_d(0.5)})"
    rr = f"floor({rf} + {_d(0.5)})"
    rs = f"floor({sf} + {_d(0.5)})"
    dq = f"abs({rq} - {qf})"
    dr = f"abs({rr} - {rf})"
    ds = f"abs({rs} - {sf})"
    fix_q = f"({dq} > {dr} AND {dq} > {ds})"
    q = (f"CAST(CASE WHEN {fix_q} THEN -{rr} - {rs} "
         f"ELSE {rq} END AS BIGINT)")
    r = (f"CAST(CASE WHEN NOT {fix_q} AND {dr} > {ds} "
         f"THEN -{rq} - {rs} ELSE {rr} END AS BIGINT)")
    return q, r


def hex_center_sql(q_expr: str, r_expr: str, size: float) -> tuple[str, str]:
    cx = (f"({_d(size)} * ({_d(_SQRT3)} * ({q_expr})"
          f" + {_d(_C_HALF)} * ({r_expr})))")
    cy = f"({_d(size)} * ({_d(1.5)} * ({r_expr})))"
    return cx, cy


# ---------------------------------------------------------------------------
# hex focal smoothing (the isotropic neighbourhood hexagons buy)
# ---------------------------------------------------------------------------

def hex_smooth(cells: DataFrame, value_col: str = "value") -> DataFrame:
    """Focal mean over each cell's EXISTING neighbours + itself on the
    hex graph: every cell sends its value to its 7-cell neighbourhood
    (explode of 7 literal offsets — scan-stage), receivers aggregate,
    and an inner join back to ``cells`` keeps only real cells.  ONE
    exchange of cells x 7 rows (cell-scale, independent of the point
    count that built the cells); the join is co-partitioned on the
    same key so AQE plans it shuffle-free.  The s2_focal shape
    (operators/tiling.py) on the hex graph."""
    offs = F.array(*[
        F.struct(F.lit(dq).alias("dq"), F.lit(dr).alias("dr"))
        for dq, dr in [(0, 0), *HEX_DIRS]
    ])
    sends = (
        cells.select("hq", "hr", F.col(value_col).alias("_v"),
                     F.explode(offs).alias("_o"))
        .select((F.col("hq") + F.col("_o.dq")).alias("hq"),
                (F.col("hr") + F.col("_o.dr")).alias("hr"),
                "_v")
    )
    agg = sends.groupBy("hq", "hr").agg(
        F.avg("_v").alias("smooth"),
        F.count(F.lit(1)).cast("int").alias("n_nb"),
    )
    return cells.join(agg, ["hq", "hr"])


# ---------------------------------------------------------------------------
# bounded kNN on the hex graph (the expansion schedule hex_ring_offsets
# exists for) — the proximity.knn_ring_join shape, but with ZERO Python:
# hex assignment is codegen and the disk cover is a literal-offset
# explode, so the whole plan is scan -> ONE equi-join -> window top-k.
# ---------------------------------------------------------------------------

def hex_knn_join(
    points: DataFrame,
    targets: DataFrame,
    k: int = 1,
    size: float = 1.0,
    ring: int = 1,
    x_col: str = "lon",
    y_col: str = "lat",
    point_id: str = "doc_id",
    target_id: str = "target_id",
    metric: str = "EUCLIDEAN",
    target_payload: str | None = None,
) -> DataFrame:
    """Bounded kNN: bucket targets by hex cell; explode each query
    point to its hex-disk cells (hex distance <= ``ring``, a LITERAL
    offset array — scan-stage, no Python anywhere in the plan); ONE
    shuffle equi-join on the packed cell key; exact distance; window
    top-k per point.

    Exactness bound (centers of cells at hex grid distance h are
    >= 1.5*size*h apart, each point within circumradius ``size`` of
    its center): every target within Euclidean distance
    ``size * (1.5 * ring - 0.5)`` of a point is inside its disk, so
    the result is EXACT whenever the true k-th neighbour is within
    that radius — pick ``size``/``ring`` from the expected search
    radius, same contract as proximity.knn_ring_join.  Points whose
    disk holds no targets are left out (caller widens the ring).
    Candidate volume per point is 1 + 3*ring*(ring+1) cells —
    bounded fan-out, never all-pairs; hot cells ride AQE skew-join
    splitting like every cell join here."""
    from .geo import distance_col

    tq, tr = hex_cell_cols(F.col(x_col), F.col(y_col), size)
    extra = [F.col(target_payload).alias("_tpay")] if target_payload else []
    t = targets.select(
        F.col(target_id),
        F.col(x_col).alias("_tx"),
        F.col(y_col).alias("_ty"),
        hex_pack(tq, tr).alias("_tcell"),
        *extra,
    )
    pq, pr = hex_cell_cols(F.col(x_col), F.col(y_col), size)
    offs = F.array(*[
        F.struct(F.lit(int(dq)).alias("dq"), F.lit(int(dr)).alias("dr"))
        for dq, dr in hex_disk_offsets(ring)
    ])
    p = points.select(
        F.col(point_id),
        F.col(x_col).alias("_px"),
        F.col(y_col).alias("_py"),
        pq.alias("_pq"),
        pr.alias("_pr"),
        F.explode(offs).alias("_o"),
    ).select(
        point_id, "_px", "_py",
        hex_pack(F.col("_pq") + F.col("_o.dq"),
                 F.col("_pr") + F.col("_o.dr")).alias("_tcell"),
    )
    joined = p.join(t, "_tcell").withColumn(
        "dist",
        distance_col(F.col("_px"), F.col("_tx"),
                     F.col("_py"), F.col("_ty"), metric),
    )
    # equidistant ties break toward the smallest payload (then id),
    # matching knn_ring_join / nearest_broadcast
    from pyspark.sql import Window

    tie = [F.col("_tpay").asc()] if target_payload else []
    w = Window.partitionBy(point_id).orderBy(
        F.col("dist").asc(), *tie, F.col(target_id).asc()
    )
    keep = [point_id, target_id, "dist", "knn_rank"]
    if target_payload:
        keep.append("_tpay")
    return (
        joined.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select(*keep)
    )
