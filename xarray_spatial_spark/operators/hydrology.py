"""D8 hydrology — flow direction + flow accumulation over long-form
rasters.

The classic terrain-hydrology pair (ESRI flow-direction encoding;
O'Callaghan & Mark 1984) that completes the surface family the
reference ships (slope/aspect/curvature/hillshade — xrspatial has no
hydrology tier): where does each cell drain, and how much drains
through it?

``flow_direction`` — per cell, the steepest-descent neighbor among
the 8 present neighbors, ESRI power-of-two codes::

        32  64  128
        16   c    1          drop = (z_c - z_n) / dist,
         8   4    2          dist = 1 or sqrt(2)

    direction = code of the max positive drop; ties break to the
    SMALLEST code (deterministic — GDAL leaves ties implementation-
    defined); pits/flats (no positive drop) and isolated cells get 0.
    Missing / NaN neighbors are simply absent (NaN nodata, SURVEY
    §1.2).  y grows southward (code 4 = +y), matching the repo's
    tile-grid convention.

    Plan: ONE literal-offset explode (each cell mails its elevation
    to the 8 positions around it, tagged with the code the RECEIVER
    uses to point back), an equi-join on the receiving cell, and a
    struct-max aggregate — the join and the aggregate share the
    (x, y) hash partitioning, so cells shuffle once at 8x and once
    at 1x.  No Python, no window.

``flow_accumulation`` — number of UPSTREAM cells whose drainage path
    passes through each cell (self excluded; ESRI convention).  The
    D8 out-edges form a functional forest (a positive drop means the
    target is STRICTLY lower, so no cycles); accumulation is the
    transitive-closure pair count, built by pointer doubling in
    O(log drainage-depth) rounds with localCheckpoint lineage cuts
    (the graph.py loop idiom — the function docstring has the
    doubling-vs-Kahn trade).

100-TB audit: both operators run over the aggregated cell grid
(cells << docs; a z12 world grid is <= 16.7M cells at any corpus
size).  flow_direction is two bounded exchanges; accumulation's round
count is a property of the FIELD (drainage depth), not the corpus —
on web-corpus count fields the relief is noise-dominated and paths
are short, and the closure doubling makes round count LOGARITHMIC in
it anyway.  Driver work per round is one count() scalar (join-free
monotone convergence test); nothing collects.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SQRT2 = 1.4142135623730951  # repr-exact in BOTH engines (hexgrid.py rule)

# (code, dx, dy, dist) — ESRI D8, y southward
D8 = (
    (1, 1, 0, 1.0), (2, 1, 1, _SQRT2), (4, 0, 1, 1.0), (8, -1, 1, _SQRT2),
    (16, -1, 0, 1.0), (32, -1, -1, _SQRT2), (64, 0, -1, 1.0),
    (128, 1, -1, _SQRT2),
)


def _code_to(delta: int) -> Column:
    """CASE ladder direction-code -> dx (delta=0) or dy (delta=1)."""
    expr = F.lit(0)
    for code, dx, dy, _ in D8:
        expr = F.when(F.col("direction") == code, F.lit((dx, dy)[delta])) \
            .otherwise(expr)
    return expr


def flow_direction(
    cells: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "value",
) -> DataFrame:
    """``(x, y, value, direction)`` with the D8 code of the steepest
    positive drop (0 = pit/flat/isolated)."""
    base = cells.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y"),
        F.col(value_col).cast("double").alias("value"),
    ).where(F.col("value").isNotNull() & ~F.isnan("value"))

    # each cell mails z to the 8 surrounding positions; the tag is the
    # code the RECEIVER at (x - dx, y - dy) uses to point back here
    offs = F.array(*[
        F.struct(F.lit(code).alias("code"), F.lit(dx).alias("dx"),
                 F.lit(dy).alias("dy"), F.lit(dist).alias("dist"))
        for code, dx, dy, dist in D8
    ])
    msgs = (
        base.withColumn("_o", F.explode(offs))
        .select(
            (F.col("x") - F.col("_o.dx")).alias("rx"),
            (F.col("y") - F.col("_o.dy")).alias("ry"),
            F.col("_o.code").alias("code"), F.col("_o.dist").alias("dist"),
            F.col("value").alias("nz"),
        )
    )
    best = (
        msgs.join(base, (F.col("rx") == F.col("x"))
                  & (F.col("ry") == F.col("y")))
        .select(
            "x", "y",
            F.struct(
                ((F.col("value") - F.col("nz")) / F.col("dist")).alias("d"),
                (-F.col("code")).alias("nc"),
            ).alias("_b"),
        )
        .groupBy("x", "y")
        .agg(F.max("_b").alias("_b"))
        .select(
            "x", "y",
            F.when(F.col("_b.d") > 0, -F.col("_b.nc"))
            .otherwise(F.lit(0)).alias("direction"),
        )
    )
    return (
        base.join(best, ["x", "y"], "left")
        .select("x", "y", "value",
                F.coalesce("direction", F.lit(0)).alias("direction"))
    )


def flow_accumulation(
    flowdir: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    dir_col: str = "direction",
    max_iters: int = 64,
) -> DataFrame:
    """``(x, y, acc)``: upstream-cell count per cell (self excluded) —
    acc(c) = |{s : c lies on s's drainage path}|, computed as the
    TRANSITIVE CLOSURE of the one-out-edge forest by pointer doubling:
    round k holds every (source, ancestor-within-2^k-steps) pair, so
    convergence takes O(log drainage-depth) rounds (2 jobs each)
    instead of Kahn peeling's one round PER level (~5 jobs each; with
    the entry's fd checkpoint the q_flow slot measured 4.6 s Kahn ->
    3.1 s doubling at sf0.1 — fixed per-round stage overhead at toy
    scale, the round REDUCTION is what matters on a cluster).
    Closure volume is cells x depth pairs — the same rows the Kahn
    variant shuffles SPREAD OVER depth rounds, paid here in log-depth
    barriers, which is the better trade both locally (fixed per-job
    overhead) and on a cluster (scheduling barriers).  The fixpoint
    test is the monotone pair count (join-free convergence, the CC
    idiom); a cycle (impossible for D8 over a real field) never
    stabilizes and hits the ``max_iters`` raise."""
    fd = flowdir.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y"),
        F.col(dir_col).alias("direction"),
    )
    reach = (
        fd.where(F.col("direction") > 0)
        .select(
            F.col("x").alias("sx"), F.col("y").alias("sy"),
            (F.col("x") + _code_to(0)).alias("tx"),
            (F.col("y") + _code_to(1)).alias("ty"),
        )
        .localCheckpoint()
    )
    prev = reach.count()
    for _ in range(max_iters):
        if prev == 0:
            break
        hop = reach.select(
            F.col("sx").alias("hsx"), F.col("sy").alias("hsy"),
            F.col("tx").alias("htx"), F.col("ty").alias("hty"),
        )
        stepped = (
            reach.join(hop, (F.col("tx") == F.col("hsx"))
                       & (F.col("ty") == F.col("hsy")))
            .select("sx", "sy",
                    F.col("htx").alias("tx"), F.col("hty").alias("ty"))
        )
        reach = reach.unionByName(stepped).distinct().localCheckpoint()
        n = reach.count()
        if n == prev:
            break
        prev = n
    else:
        raise ValueError(
            f"flow_accumulation: closure not stable after max_iters="
            f"{max_iters} doubling rounds (cycle in flow graph — D8 "
            "over a real elevation cannot cycle)")
    counts = reach.groupBy(
        F.col("tx").alias("x"), F.col("ty").alias("y")
    ).agg(F.count(F.lit(1)).alias("_a"))
    return (
        fd.join(counts, ["x", "y"], "left")
        .select("x", "y", F.coalesce("_a", F.lit(0)).cast("long")
                .alias("acc"))
    )


_HUGE = 1.0e18


def fill_depressions(
    cells: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "value",
    max_iters: int = 256,
) -> DataFrame:
    """Planchon & Darboux (2001) depression filling — the standard
    DEM preprocessing before flow routing (a raw surface's spurious
    pits truncate every drainage path at the first noise dimple):

        W <- z on BORDER cells (any cell with < 8 present neighbors
             — water can leave the domain there), +inf elsewhere;
        iterate  W(c) <- max(z(c), min over neighbors W(n))

    The operator converges to the filled surface: every interior
    depression rises exactly to its lowest pour point (rim saddle),
    slopes are untouched.  Monotone from above, so the fixpoint test
    is exact (no tolerance): a round that lowers nothing is the
    answer.

    Plan per round: the same 8-offset literal mail pass as
    flow_direction (ONE cell-scale exchange; the neighbor-min
    aggregate and the join-back share the (x, y) partitioning) +
    a changed-count scalar; localCheckpoint lineage cuts.  Round
    count is the depth of the deepest nested depression in CELLS
    (water-level steps propagate one ring per round) — a property of
    the field, independent of corpus size.

    Returns ``(x, y, value, filled)``."""
    base = cells.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y"),
        F.col(value_col).cast("double").alias("value"),
    ).where(F.col("value").isNotNull() & ~F.isnan("value")) \
        .localCheckpoint()

    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for _, dx, dy, _ in D8
    ])

    def neighbor_min(w: DataFrame) -> DataFrame:
        """(x, y, nmin) over PRESENT neighbors of each present cell."""
        return (
            w.withColumn("_o", F.explode(offs))
            .select(
                (F.col("x") + F.col("_o.dx")).alias("x"),
                (F.col("y") + F.col("_o.dy")).alias("y"),
                F.col("w").alias("_nw"),
            )
            .groupBy("x", "y")
            .agg(F.min("_nw").alias("nmin"), F.count(F.lit(1)).alias("deg"))
        )

    deg = neighbor_min(base.select("x", "y", F.col("value").alias("w"))) \
        .select("x", "y", "deg")
    w = (
        base.join(deg, ["x", "y"], "left")
        .select(
            "x", "y", "value",
            F.when(F.coalesce("deg", F.lit(0)) < 8, F.col("value"))
            .otherwise(F.lit(_HUGE)).alias("w"),
        )
        .localCheckpoint()
    )
    for _ in range(max_iters):
        nm = neighbor_min(w.select("x", "y", "w"))
        w2 = (
            w.join(nm.select("x", "y", "nmin"), ["x", "y"], "left")
            .select(
                "x", "y", "value",
                F.greatest(
                    F.col("value"),
                    F.least(F.col("w"),
                            F.coalesce("nmin", F.lit(_HUGE))),
                ).alias("w"),
                F.col("w").alias("_prev"),
            )
            .localCheckpoint()
        )
        changed = w2.where(F.col("w") != F.col("_prev")).isEmpty()
        w = w2.select("x", "y", "value", "w")
        if changed:
            return w.select("x", "y", "value", F.col("w").alias("filled"))
    raise ValueError(
        f"fill_depressions: no fixpoint in max_iters={max_iters} rounds "
        "(depression nesting deeper than the budget)")


def strahler_order(
    flowdir: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    dir_col: str = "direction",
    max_iters: int = 256,
) -> DataFrame:
    """``(x, y, order)`` — Strahler stream order over the D8 forest:
    headwater cells (no inflow) are order 1; a cell fed by k inflows
    whose maximum order is m has order m+1 if >= 2 inflows carry m,
    else m.  Callers normally pass the STREAM subset (cells with
    ``flow_accumulation >= threshold``); edges leaving the subset are
    simply absent, matching ESRI's stream-raster convention.

    Same Kahn peeling as :func:`flow_accumulation`, but the carried
    state is ``(max_in, cnt_at_max)`` merged incrementally as inflow
    batches finalize across rounds — the merge is associative and
    commutative, so arrival order doesn't matter."""
    fd = flowdir.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y"),
        F.col(dir_col).alias("direction"),
    )
    present = fd.select("x", "y")
    edges = (
        fd.where(F.col("direction") > 0)
        .select(
            F.col("x").alias("sx"), F.col("y").alias("sy"),
            (F.col("x") + _code_to(0)).alias("tx"),
            (F.col("y") + _code_to(1)).alias("ty"),
        )
        # drop edges leaving the (possibly thresholded) subset
        .join(present.select(F.col("x").alias("tx"), F.col("y").alias("ty")),
              ["tx", "ty"], "left_semi")
        .localCheckpoint()
    )
    active = fd.select(
        "x", "y",
        F.lit(0).cast("int").alias("mx_in"),
        F.lit(0).cast("long").alias("cnt_mx"),
    ).localCheckpoint()
    pending = edges
    done: list[DataFrame] = []

    def _finish(parts: list[DataFrame], like: DataFrame) -> DataFrame:
        if not parts:
            out = like
        else:
            out = reduce(lambda a, b: a.unionByName(b), parts)
        order = (
            F.when(F.col("cnt_mx") >= 2, F.col("mx_in") + 1)
            .otherwise(F.greatest(F.col("mx_in"), F.lit(1)))
        )
        return out.select("x", "y", order.alias("order"))

    for _ in range(max_iters):
        targets = pending.select(
            F.col("tx").alias("x"), F.col("ty").alias("y"))
        ready = active.join(targets, ["x", "y"], "left_anti") \
            .localCheckpoint()
        if ready.isEmpty():
            if active.isEmpty():
                return _finish(done, active)
            raise ValueError("strahler_order: cycle in flow graph")
        done.append(ready)
        r_order = (
            F.when(F.col("cnt_mx") >= 2, F.col("mx_in") + 1)
            .otherwise(F.greatest(F.col("mx_in"), F.lit(1)))
        )
        # batch (max, count-at-max): the arriving orders are tiny per
        # target (<= 8 inflows), counted exactly via a self-joined max
        contrib = (
            ready.select("x", "y", r_order.alias("o"))
            .join(pending, (F.col("x") == F.col("sx"))
                  & (F.col("y") == F.col("sy")))
            .select(F.col("tx").alias("px"), F.col("ty").alias("py"),
                    F.col("o"))
        )
        pushed = (
            contrib.groupBy("px", "py", "o")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("px", "py")
            .agg(F.max("o").alias("b_mx"),
                 F.max_by("c", "o").alias("b_cnt"))
        )
        merged_mx = F.greatest(F.col("mx_in"),
                               F.coalesce(F.col("b_mx"), F.lit(0)))
        merged_cnt = (
            F.when(F.coalesce(F.col("b_mx"), F.lit(0)) > F.col("mx_in"),
                   F.coalesce(F.col("b_cnt"), F.lit(0)))
            .when(F.coalesce(F.col("b_mx"), F.lit(0)) < F.col("mx_in"),
                  F.col("cnt_mx"))
            .otherwise(F.col("cnt_mx")
                       + F.coalesce(F.col("b_cnt"), F.lit(0)))
        )
        active = (
            active.join(ready.select("x", "y"), ["x", "y"], "left_anti")
            .join(pushed, (F.col("x") == F.col("px"))
                  & (F.col("y") == F.col("py")), "left")
            .select("x", "y", merged_mx.alias("mx_in"),
                    merged_cnt.alias("cnt_mx"))
            .localCheckpoint()
        )
        pending = pending.join(
            ready.select(F.col("x").alias("sx"), F.col("y").alias("sy")),
            ["sx", "sy"], "left_anti",
        ).localCheckpoint()
    raise ValueError(
        f"strahler_order: depth exceeds max_iters={max_iters}")


def watershed(
    flowdir: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    dir_col: str = "direction",
    max_iters: int = 64,
) -> DataFrame:
    """``(x, y, basin_x, basin_y)`` — every cell labeled by the
    TERMINAL cell (pit / flat, ``direction = 0``) its D8 path drains
    to: the drainage-basin partition (ESRI Watershed with every sink
    as a pour point).

    Pointer doubling on the functional forest: each round replaces
    every cell's pointer with its pointer's pointer, so the followed
    distance doubles — O(log drainage-depth) rounds (the CC /
    regions.py shortcutting trick), each ONE self-join on the cell
    key plus a changed-count aggregate.  Roots point to themselves,
    so doubling is a no-op at the fixpoint and the changed count
    hitting zero is an exact convergence test."""
    fd = flowdir.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y"),
        F.col(dir_col).alias("direction"),
    )
    ptr = fd.select(
        "x", "y",
        (F.col("x") + _code_to(0)).alias("nx"),
        (F.col("y") + _code_to(1)).alias("ny"),
    ).localCheckpoint()
    for _ in range(max_iters):
        m = ptr.select(
            F.col("x").alias("mx"), F.col("y").alias("my"),
            F.col("nx").alias("mnx"), F.col("ny").alias("mny"),
        )
        stepped = (
            ptr.join(m, (F.col("nx") == F.col("mx"))
                     & (F.col("ny") == F.col("my")))
            .select("x", "y",
                    F.col("mnx").alias("nx2"), F.col("mny").alias("ny2"),
                    "nx", "ny")
            .localCheckpoint()
        )
        changed = stepped.where(
            (F.col("nx2") != F.col("nx")) | (F.col("ny2") != F.col("ny"))
        ).isEmpty()
        ptr = stepped.select(
            "x", "y", F.col("nx2").alias("nx"), F.col("ny2").alias("ny"))
        if changed:
            return ptr.select(
                "x", "y",
                F.col("nx").alias("basin_x"), F.col("ny").alias("basin_y"))
    raise ValueError(
        f"watershed: no convergence in max_iters={max_iters} doubling "
        "rounds (drainage depth > 2^max_iters is impossible — corrupt "
        "direction field)")


def d8_values_sql() -> str:
    """``(code, dx, dy, dist)`` VALUES rows for an ANSI-SQL twin —
    dist literals via repr, so both engines divide identical bits."""
    return ", ".join(
        f"({code}, {dx}, {dy}, CAST({dist!r} AS DOUBLE))"
        for code, dx, dy, dist in D8
    )


def d8_case_sql(delta: int, dir_col: str = "direction") -> str:
    """CASE ladder ``direction -> dx`` (delta=0) / ``dy`` (delta=1)."""
    arms = " ".join(
        f"WHEN {code} THEN {(dx, dy)[delta]}" for code, dx, dy, _ in D8
    )
    return f"CASE {dir_col} {arms} ELSE 0 END"


