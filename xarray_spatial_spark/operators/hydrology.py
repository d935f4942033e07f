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


def _flow_accumulation_kahn(
    fd: DataFrame, max_iters: int,
) -> DataFrame:
    """Kahn count-pushing accumulation: peel indegree-0 cells level by
    level, each finalized cell pushing ``acc + 1`` to its downstream
    neighbor.  One round PER drainage level, but total shuffled volume
    is O(edges) — every edge carries exactly one (already aggregated)
    count — which is what makes deep (DEM-shaped) fields tractable
    where the closure materializes O(cells x depth) pairs."""
    e = (
        fd.where(F.col("direction") > 0)
        .select(
            "x", "y",
            (F.col("x") + _code_to(0)).alias("tx"),
            (F.col("y") + _code_to(1)).alias("ty"),
        )
        .localCheckpoint()
    )
    indeg = e.groupBy(
        F.col("tx").alias("x"), F.col("ty").alias("y")
    ).agg(F.count(F.lit(1)).alias("_in"))
    nodes = (
        fd.select("x", "y")
        .join(indeg, ["x", "y"], "left")
        .select("x", "y", F.lit(0).cast("long").alias("acc"),
                F.coalesce("_in", F.lit(0)).alias("_in"))
        .localCheckpoint()
    )
    done = None  # union of finalized (x, y, acc)
    for it in range(max_iters):
        frontier = nodes.where(F.col("_in") == 0).select("x", "y", "acc")
        rest = nodes.where(F.col("_in") > 0)
        done = frontier if done is None else done.unionByName(frontier)
        if rest.isEmpty():
            return done.select("x", "y", F.col("acc").cast("long")
                               .alias("acc"))
        push = (
            frontier.join(e, ["x", "y"])
            .groupBy(F.col("tx").alias("x"), F.col("ty").alias("y"))
            .agg(F.sum(F.col("acc") + 1).alias("_add"),
                 F.count(F.lit(1)).alias("_n"))
        )
        nodes = (
            rest.join(push, ["x", "y"], "left")
            .select(
                "x", "y",
                (F.col("acc") + F.coalesce("_add", F.lit(0))).alias("acc"),
                (F.col("_in") - F.coalesce("_n", F.lit(0))).alias("_in"),
            )
            .localCheckpoint()
        )
        # compact the finalized union every 32 levels: each member is
        # already a checkpointed block, so only PLAN width grows
        # between compactions — a per-level eager checkpoint would
        # re-materialize O(cells) rows per level (O(cells x depth)
        # total), the exact volume this path exists to avoid
        if it % 32 == 31:
            done = done.localCheckpoint()
    raise ValueError(
        f"flow_accumulation: Kahn peeling not finished after max_iters="
        f"{max_iters} levels (cycle in flow graph — D8 over a real "
        "elevation cannot cycle)")


def flow_accumulation(
    flowdir: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    dir_col: str = "direction",
    max_iters: int = 64,
    pair_budget: float = 8.0,
) -> DataFrame:
    """``(x, y, acc)``: upstream-cell count per cell (self excluded) —
    acc(c) = |{s : c lies on s's drainage path}| — DEPTH-ADAPTIVE:

    Shallow fields (noise-dominated web count grids, drainage depth
    2-4) run the TRANSITIVE CLOSURE by pointer doubling: round k holds
    every (source, ancestor-within-2^k-steps) pair, so convergence is
    O(log depth) rounds of 2 jobs.  The closure materializes
    O(cells x depth) pairs — NOT the same volume as Kahn peeling,
    which pushes one aggregated count per edge for O(edges) total; at
    depth 2-4 the constant-factor trade favors the closure (fewer
    barriers), on a DEM (depth O(grid width)) it is a scale-killer.

    The dispatch needs no a-priori depth: doubling's own convergence
    counter IS the pair count, so when the closure grows past
    ``pair_budget`` x the edge count before stabilizing (depth >
    ~pair_budget), the operator abandons it (having paid <= budgeted
    volume) and restarts as Kahn count-pushing
    (:func:`_flow_accumulation_kahn`) — one round per drainage level,
    O(edges) total volume.  Both paths are exact; equality is
    pytest-pinned on random and deep-synthetic fields."""
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
    n_edges = reach.count()
    budget = float(pair_budget) * max(n_edges, 1)
    prev = n_edges
    stable = prev == 0
    for _ in range(max_iters):
        if stable or prev == 0:
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
            stable = True
            break
        if n > budget:
            # deep field: the closure is past its volume budget and
            # still growing — switch to the O(edges) Kahn path
            return _flow_accumulation_kahn(
                fd, max_iters=max(max_iters, 1 << 20))
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

    Plan per round: cells explode onto their 3x3 TILE keys (tile =
    ``tile`` cells square; expansion ~1 + 4/tile) and one grouped
    Arrow kernel per tile iterates the monotone update to its LOCAL
    fixpoint on a dense numpy array, halo water levels held fixed.
    Water-level information therefore propagates a whole TILE per
    round instead of one ring: round count is the pour-path length in
    TILES (basin radius / tile), not in cells — the property that
    keeps real DEM basins (radius O(grid width)) to a handful of
    rounds where the ring-step fixpoint needed thousands.  Any
    chaotic-relaxation order of the monotone update converges to the
    SAME filled surface, and the fixpoint test stays exact (a round
    that lowers nothing is the answer), so the tiling changes cost
    only, never the result.

    Returns ``(x, y, value, filled)``."""
    import numpy as np
    import pandas as pd

    T = 256  # tile edge in cells; bounds kernel memory at (T+2)^2 doubles
    base = cells.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y"),
        F.col(value_col).cast("double").alias("value"),
    ).where(F.col("value").isNotNull() & ~F.isnan("value")) \
        .localCheckpoint()

    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for _, dx, dy, _ in D8
    ])

    # border seed (W <- z where any of the 8 neighbors is absent):
    # one mail pass, as before — the loop below only LOWERS W
    nbr = (
        base.withColumn("_o", F.explode(offs))
        .select(
            (F.col("x") + F.col("_o.dx")).alias("x"),
            (F.col("y") + F.col("_o.dy")).alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    w = (
        base.join(nbr, ["x", "y"], "left")
        .select(
            "x", "y", "value",
            F.when(F.coalesce("deg", F.lit(0)) < 8, F.col("value"))
            .otherwise(F.lit(_HUGE)).alias("w"),
        )
        .localCheckpoint()
    )

    toffs = F.array(*[
        F.struct(F.lit(d).alias("dx"), F.lit(e).alias("dy"))
        for d in (-1, 0, 1) for e in (-1, 0, 1)
    ])

    def _tile_fix(pdf: pd.DataFrame) -> pd.DataFrame:
        # dense (T+2)^2 patch: own cells update, halo ring is a fixed
        # boundary; iterate W <- max(z, min(W, min over present
        # neighbors W)) to the LOCAL exact fixpoint
        tx0 = int(pdf["_tx"].iloc[0]) * T
        ty0 = int(pdf["_ty"].iloc[0]) * T
        xs = pdf["x"].to_numpy(np.int64)
        ys = pdf["y"].to_numpy(np.int64)
        lx = xs - tx0 + 1
        ly = ys - ty0 + 1
        own = (lx >= 1) & (lx <= T) & (ly >= 1) & (ly <= T)
        H = T + 2
        W = np.full((H, H), np.inf)
        Z = np.full((H, H), np.inf)
        W[ly, lx] = pdf["w"].to_numpy()
        Z[ly, lx] = pdf["value"].to_numpy()
        # absent cells stay +inf in W -> they never win a neighbor min
        # via Z below; mask them out of the neighbor field entirely
        P = np.full((H, H), np.inf)
        oy, ox = ly[own], lx[own]
        while True:
            P[1:-1, 1:-1] = np.inf
            P[ly, lx] = W[ly, lx]
            nm = np.minimum.reduce([
                P[:-2, :-2], P[:-2, 1:-1], P[:-2, 2:],
                P[1:-1, :-2], P[1:-1, 2:],
                P[2:, :-2], P[2:, 1:-1], P[2:, 2:],
            ])
            newW = np.maximum(Z[1:-1, 1:-1],
                              np.minimum(W[1:-1, 1:-1], nm))
            # only own cells move; halo stays the caller's boundary
            cur = W[oy, ox]
            nxt = newW[oy - 1, ox - 1]
            if np.array_equal(cur, nxt):
                break
            W[oy, ox] = nxt
        return pd.DataFrame({
            "x": xs[own], "y": ys[own], "value": Z[oy, ox],
            "w": W[oy, ox], "_prev": pdf["w"].to_numpy()[own],
        })

    for _ in range(max_iters):
        tiled = (
            w.withColumn("_o", F.explode(toffs))
            .select(
                "x", "y", "value", "w",
                F.floor((F.col("x") + F.col("_o.dx")) / F.lit(T))
                .cast("long").alias("_tx"),
                F.floor((F.col("y") + F.col("_o.dy")) / F.lit(T))
                .cast("long").alias("_ty"),
            )
            .distinct()
        )
        w2 = tiled.groupBy("_tx", "_ty").applyInPandas(
            _tile_fix,
            schema="x long, y long, value double, w double, _prev double",
        ).localCheckpoint()
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
    commutative, so arrival order doesn't matter.  Readiness is a
    REMAINING-INDEGREE counter decremented as inflow batches arrive
    (the :func:`_flow_accumulation_kahn` idiom) rather than an
    anti-join against a shrinking pending-edge table: one state
    checkpoint per level instead of three (ready/active/pending)."""
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
    indeg = edges.groupBy(
        F.col("tx").alias("x"), F.col("ty").alias("y")
    ).agg(F.count(F.lit(1)).alias("_in"))
    state = (
        fd.select("x", "y")
        .join(indeg, ["x", "y"], "left")
        .select(
            "x", "y",
            F.lit(0).cast("int").alias("mx_in"),
            F.lit(0).cast("long").alias("cnt_mx"),
            F.coalesce("_in", F.lit(0)).alias("_in"),
        )
        .localCheckpoint()
    )
    done: list[DataFrame] = []
    r_order = (
        F.when(F.col("cnt_mx") >= 2, F.col("mx_in") + 1)
        .otherwise(F.greatest(F.col("mx_in"), F.lit(1)))
    )

    for _ in range(max_iters):
        ready = state.where(F.col("_in") == 0)
        rest = state.where(F.col("_in") > 0)
        done.append(ready.select("x", "y", r_order.alias("order")))
        if rest.isEmpty():
            return reduce(lambda a, b: a.unionByName(b), done)
        # batch (max, count-at-max, total): arriving orders per target
        # are tiny (<= 8 inflows); count-at-max via the grouped max
        pushed = (
            ready.select("x", "y", r_order.alias("o"))
            .join(edges, (F.col("x") == F.col("sx"))
                  & (F.col("y") == F.col("sy")))
            .groupBy(F.col("tx").alias("px"), F.col("ty").alias("py"),
                     F.col("o"))
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("px", "py")
            .agg(F.max("o").alias("b_mx"),
                 F.max_by("c", "o").alias("b_cnt"),
                 F.sum("c").alias("b_tot"))
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
        nxt = (
            rest.join(pushed, (F.col("x") == F.col("px"))
                      & (F.col("y") == F.col("py")), "left")
            .select("x", "y", merged_mx.alias("mx_in"),
                    merged_cnt.alias("cnt_mx"),
                    (F.col("_in") - F.coalesce("b_tot", F.lit(0)))
                    .alias("_in"))
            .localCheckpoint()
        )
        state = nxt
    # a cycle (impossible for D8) leaves _in > 0 nodes that never
    # become ready; it surfaces here as depth exhaustion
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


