"""Marching-squares contour extraction — raster -> vector isolines.

The raster->vector sibling of ``polygonize`` (which traces REGION
boundaries of equal-valued cells): ``contour_segments`` traces
ISO-VALUE lines of a continuous field, the classic cartographic
contour op (GDAL ``gdal_contour``; the reference repo stops at
``polygonize``, see xrspatial/experimental/polygonize.py:524-613 —
contours are the natural completion of its raster->vector bridge).

Semantics: the long-form raster's cell values are samples at integer
grid VERTICES.  Each unit "marching square" with lower-left corner
(x, y) reads its four corners

    v00 = (x, y)      v10 = (x+1, y)
    v01 = (x, y+1)    v11 = (x+1, y+1)

and, per iso level L, classifies each corner as above (``v > L``,
strictly) or not.  Crossing edges are linearly interpolated

    t = (L - v_a) / (v_b - v_a)

and the 16-case lookup emits 0, 1, or 2 line segments per square.
Saddle cases (5: v00,v11 above; 10: v10,v01 above) use a FIXED
deterministic convention — no center-average disambiguation — so the
output is a pure function of (grid, levels) in both engines:

    case  5 -> segments (left,bottom), (right,top)
    case 10 -> segments (bottom,right), (top,left)

Squares with any missing or non-finite corner emit nothing (NaN is
the universal nodata, SURVEY §1.2).

Distributed plan (pure Catalyst, no Python anywhere):

1. corner scatter — each vertex explodes to the <=4 squares it is a
   corner of (literal offsets), ONE groupBy on the square key
   pivots the 4 corners into one row.  The only exchange in the
   whole plan: 4x cell rows, independent of level count.
2. levels explode AFTER the aggregate (a literal array), so k iso
   levels multiply codegen work, never shuffle bytes.
3. case index + segment lookup (literal 16-entry nested-array
   table) + interpolation are whole-stage-codegen expressions.

Output is segment-scale (O(contour length), cells-bounded), one row
per (level, square, segment).  Every arithmetic step is replayable
verbatim in ANSI SQL, so the op is DuckDB-oracle-checkable when the
field is integer-derived (counts/sums) and levels are literals: both
engines then divide identical doubles in the same order.

100-TB audit: the corner scatter reuses the cell-grid partitioning
(cells << docs; a z12 world grid is <= 16.7M cells at any corpus
size); segments never exceed 2 x squares x levels and real contour
output is perimeter-scale.  No collect, no UDF, no skew key (square
keys are as uniform as the grid itself).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# case -> list of (e1, e2) edge pairs; edges 0=bottom 1=right 2=top
# 3=left.  Derived from corner bits b0..b3 = v00,v10,v11,v01 above.
CASE_SEGMENTS: dict[int, list[tuple[int, int]]] = {
    0: [],
    1: [(3, 0)],
    2: [(0, 1)],
    3: [(3, 1)],
    4: [(1, 2)],
    5: [(3, 0), (1, 2)],   # saddle: keep the two above-corners apart
    6: [(0, 2)],
    7: [(3, 2)],
    8: [(2, 3)],
    9: [(0, 2)],
    10: [(0, 1), (2, 3)],  # saddle twin
    11: [(1, 2)],
    12: [(3, 1)],
    13: [(0, 1)],
    14: [(3, 0)],
    15: [],
}


def _edge_point(
    e: Column, sx: Column, sy: Column,
    v00: Column, v10: Column, v11: Column, v01: Column, lvl: Column,
) -> tuple[Column, Column]:
    """(px, py) of the level crossing on edge ``e`` of the square at
    (sx, sy).  Only evaluated for edges the case table marks as
    crossing, so the divisors are never zero: the two corner values
    straddle the level strictly on one side (v > L vs v <= L), hence
    differ."""
    px = (
        F.when(e == 0, sx + (lvl - v00) / (v10 - v00))
        .when(e == 1, sx + F.lit(1.0))
        .when(e == 2, sx + (lvl - v01) / (v11 - v01))
        .otherwise(sx.cast("double"))
    )
    py = (
        F.when(e == 0, sy.cast("double"))
        .when(e == 1, sy + (lvl - v10) / (v11 - v10))
        .when(e == 2, sy + F.lit(1.0))
        .otherwise(sy + (lvl - v00) / (v01 - v00))
    )
    return px, py


def marching_squares(
    cells: DataFrame,
    levels: Sequence[float],
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "value",
) -> DataFrame:
    """Iso-line segments of a long-form scalar field at the given
    levels -> ``(level, sx, sy, seg, x1, y1, x2, y2)``.

    ``(sx, sy)`` is the emitting square's lower-left vertex, ``seg``
    the segment index within the square (0, or 1 in saddle cases);
    the pair makes every output row unique and deterministic.
    Coordinates are in grid units (vertex (x, y) sits at (x, y))."""
    levels = [float(v) for v in levels]
    if not levels:
        raise ValueError("need at least one contour level")

    # 1. corner scatter: vertex (x, y) is corner c of square
    #    (x + dx, y + dy) for the four (dx, dy, c) below.
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(c).alias("c"))
        for dx, dy, c in ((0, 0, 0), (-1, 0, 1), (-1, -1, 2), (0, -1, 3))
    ])
    corner = lambda k: F.max(F.when(F.col("_o.c") == k, F.col("_v")))
    sq = (
        cells.select(
            F.col(x_col).alias("_x"), F.col(y_col).alias("_y"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .where(F.col("_v").isNotNull() & ~F.isnan("_v"))
        .withColumn("_o", F.explode(offs))
        .groupBy(
            (F.col("_x") + F.col("_o.dx")).alias("sx"),
            (F.col("_y") + F.col("_o.dy")).alias("sy"),
        )
        .agg(
            corner(0).alias("v00"), corner(1).alias("v10"),
            corner(2).alias("v11"), corner(3).alias("v01"),
            F.count(F.lit(1)).alias("_n"),
        )
        .where(F.col("_n") == 4)
    )

    # 2. literal level fan-out (post-aggregate: no shuffle growth).
    lv = F.explode(F.array(*[F.lit(v) for v in levels])).alias("level")
    sq = sq.select("sx", "sy", "v00", "v10", "v11", "v01", lv)

    above = lambda c: (F.col(c) > F.col("level")).cast("int")
    case = (
        above("v00") + above("v10") * F.lit(2)
        + above("v11") * F.lit(4) + above("v01") * F.lit(8)
    ).alias("_case")

    # 3. literal 16-entry case table -> 0..2 segments per square.
    seg_t = "array<struct<e1:int,e2:int>>"
    tab = F.array(*[
        F.array(*[
            F.struct(F.lit(e1).alias("e1"), F.lit(e2).alias("e2"))
            for e1, e2 in CASE_SEGMENTS[c]
        ]).cast(seg_t)
        for c in range(16)
    ])
    segs = (
        sq.select("*", case)
        .select("*", F.posexplode(F.element_at(tab, F.col("_case") + 1))
                .alias("seg", "_s"))
    )
    lvl = F.col("level")
    x1, y1 = _edge_point(F.col("_s.e1"), F.col("sx"), F.col("sy"),
                         F.col("v00"), F.col("v10"), F.col("v11"),
                         F.col("v01"), lvl)
    x2, y2 = _edge_point(F.col("_s.e2"), F.col("sx"), F.col("sy"),
                         F.col("v00"), F.col("v10"), F.col("v11"),
                         F.col("v01"), lvl)
    return segs.select(
        "level", "sx", "sy", "seg",
        x1.alias("x1"), y1.alias("y1"), x2.alias("x2"), y2.alias("y2"),
    )


def marching_squares_sql(
    grid_sql: str,
    levels: Sequence[float],
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "v",
) -> str:
    """ANSI-SQL twin of :func:`marching_squares` over ``grid_sql``
    (a query producing the vertex grid) — the DuckDB oracle replays
    the identical corner scatter, case table, and interpolation
    expressions, so on integer-derived fields the hashes match."""
    levels = [float(v) for v in levels]
    lv = ", ".join(f"({v!r})" for v in levels)
    tab_rows = ", ".join(
        f"({c}, {i}, {e1}, {e2})"
        for c in range(16)
        for i, (e1, e2) in enumerate(CASE_SEGMENTS[c])
    )

    def pt(e: str, axis: str) -> str:
        if axis == "x":
            return (f"CASE {e} WHEN 0 THEN sx + (level - v00)/(v10 - v00) "
                    f"WHEN 1 THEN sx + 1.0 "
                    f"WHEN 2 THEN sx + (level - v01)/(v11 - v01) "
                    f"ELSE CAST(sx AS DOUBLE) END")
        return (f"CASE {e} WHEN 0 THEN CAST(sy AS DOUBLE) "
                f"WHEN 1 THEN sy + (level - v10)/(v11 - v10) "
                f"WHEN 2 THEN sy + 1.0 "
                f"ELSE sy + (level - v00)/(v01 - v00) END")

    return f"""
        WITH g AS ({grid_sql}),
        sq AS (
          SELECT g.{x_col} + o.dx AS sx, g.{y_col} + o.dy AS sy,
                 max(CASE WHEN o.c = 0 THEN g.{value_col} END) AS v00,
                 max(CASE WHEN o.c = 1 THEN g.{value_col} END) AS v10,
                 max(CASE WHEN o.c = 2 THEN g.{value_col} END) AS v11,
                 max(CASE WHEN o.c = 3 THEN g.{value_col} END) AS v01,
                 count(*) AS n
          FROM g CROSS JOIN (VALUES (0, 0, 0), (-1, 0, 1), (-1, -1, 2),
                                    (0, -1, 3)) o(dx, dy, c)
          GROUP BY 1, 2
        ),
        lev(level) AS (VALUES {lv}),
        cs AS (
          SELECT sq.*, lev.level,
                 (CASE WHEN v00 > level THEN 1 ELSE 0 END)
               + 2 * (CASE WHEN v10 > level THEN 1 ELSE 0 END)
               + 4 * (CASE WHEN v11 > level THEN 1 ELSE 0 END)
               + 8 * (CASE WHEN v01 > level THEN 1 ELSE 0 END) AS cas
          FROM sq CROSS JOIN lev WHERE sq.n = 4
        ),
        tab(cas, seg, e1, e2) AS (VALUES {tab_rows}),
        s AS (SELECT cs.*, tab.seg, tab.e1, tab.e2
              FROM cs JOIN tab ON tab.cas = cs.cas)
        SELECT level, sx, sy, seg,
               {pt('e1', 'x')} AS x1, {pt('e1', 'y')} AS y1,
               {pt('e2', 'x')} AS x2, {pt('e2', 'y')} AS y2
        FROM s
    """
