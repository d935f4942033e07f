"""Global spatial autocorrelation + sparse-raster KDE smoothing.

The reference ends at per-cell statistics (zonal, focal, hotspots —
xrspatial/zonal.py, xrspatial/focal.py); this module adds the CORPUS-
level spatial questions a web-scale table invites: "are page
properties spatially clustered at all?" (Moran's I / Geary's C over
the occupied cell grid) and "what does the density surface look
like?" (Gaussian KDE over cell counts — the sparse-raster twin of
``convolve_2d``, which needs a dense tile).

Design for 10^12 docs:

- Everything here runs over the AGGREGATED cell grid (cells ≪ docs;
  a z12 world grid is ≤ 16.7M cells no matter how many pages land in
  it), so the expensive exchange is the upstream groupBy the caller
  already paid for tile assignment.
- Neighbor discovery is ONE equi-join: each occupied cell explodes a
  LITERAL offset array (8 cells for queen, 4 for rook, (2r+1)^2-1
  for KDE) and joins back on the shifted (x, y) key.  No spatial
  index, no BroadcastNestedLoopJoin — the grid IS the index.
- The global reduction is two chained hash aggregates (per-cell
  partials, then one row); the scalar mean/variance pre-pass rides a
  broadcast 1-row crossJoin (the engine's standard scalar attach,
  functions/text.py tf-idf pattern).
- KDE kernel weights are computed ONCE driver-side and shipped as
  literals inside the offset structs — no exp() in the hot path, and
  any ANSI oracle can replay the identical constants.

Formulas are the classical ones (Moran 1950; Geary 1954; Cliff & Ord
1981 normality moments), with binary contiguity weights over cells
that actually exist in the frame (island cells contribute nothing).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _offsets(contiguity: str) -> list[tuple[int, int]]:
    if contiguity == "queen":
        return [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if (dx, dy) != (0, 0)]
    if contiguity == "rook":
        return [(-1, 0), (1, 0), (0, -1), (0, 1)]
    raise ValueError(f"contiguity must be 'queen' or 'rook', got {contiguity!r}")


def neighbor_values(
    cells: DataFrame,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
    value_col: str = "value",
    contiguity: str = "queen",
) -> DataFrame:
    """Ordered neighbor pairs over the occupied-cell grid:
    (x, y, v, v_nb) — one row per (cell, existing neighbor).  One
    exchange: the shifted-key equi-join."""
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in _offsets(contiguity)
    ])
    left = (
        cells.select(
            F.col(x_col).alias("_x"),
            F.col(y_col).alias("_y"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .withColumn("_o", F.explode(offs))
        .select(
            "_x", "_y", "_v",
            (F.col("_x") + F.col("_o.dx")).alias("_nx"),
            (F.col("_y") + F.col("_o.dy")).alias("_ny"),
        )
    )
    right = cells.select(
        F.col(x_col).alias("_nx"),
        F.col(y_col).alias("_ny"),
        F.col(value_col).cast("double").alias("_vn"),
    )
    return left.join(right, ["_nx", "_ny"]).select("_x", "_y", "_v", "_vn")


def global_autocorrelation(
    cells: DataFrame,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
    value_col: str = "value",
    contiguity: str = "queen",
) -> DataFrame:
    """Global Moran's I and Geary's C over an occupied cell grid, as a
    ONE-row DataFrame:

    ``(n, s0, mean, m2, morans_i, expected_i, z_i, gearys_c)``

    - ``morans_i``  = (n / S0) * sum_ij w_ij (x_i - xbar)(x_j - xbar) / m2
    - ``gearys_c``  = (n - 1) * sum_ij w_ij (x_i - x_j)^2 / (2 S0 m2)
    - ``z_i``       = (I - E[I]) / sqrt(Var[I]) under the normality
      assumption (Cliff & Ord 1981), with S1 = 2 S0 and
      S2 = 4 * sum_i deg_i^2 for symmetric binary weights.

    Returns NULL statistics when the field is constant (m2 = 0) or
    there are no adjacent occupied cells (S0 = 0).

    Plan: one scalar aggregate over cells (count/mean/m2, broadcast
    1-row attach), one shifted-key equi-join for neighbor pairs, then
    groupBy(cell) partials -> one global row.  Total: two exchanges
    of cell-scale data and a broadcast."""
    base = cells.select(
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
        F.col(value_col).cast("double").alias("_v"),
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_v").alias("_mean"),
        # m2 via the one-pass identity sum(v^2) - n*mean^2 would lose
        # precision on large offsets; sum((v - mean)^2) needs mean
        # first, so compute it the numerically-safe way from the same
        # scalars: var_pop * n == m2 exactly in Spark's two-pass agg
        (F.var_pop("_v") * F.count(F.lit(1))).alias("_m2"),
    )
    pairs = neighbor_values(base, "_x", "_y", "_v", contiguity)
    # per-cell partials: degree, sum of neighbor values, sum of
    # squared differences — everything the global moments need
    per_cell = pairs.groupBy("_x", "_y", "_v").agg(
        F.count(F.lit(1)).cast("double").alias("_deg"),
        F.sum("_vn").alias("_sum_vn"),
        F.sum((F.col("_v") - F.col("_vn")) * (F.col("_v") - F.col("_vn"))).alias(
            "_sum_d2"
        ),
    )
    # mean-free pair partials, so an EMPTY pair set (all-island grid)
    # still yields a well-formed zero row after coalesce:
    #   sum_ij w_ij (x_i - xbar)(x_j - xbar)
    #     = A - xbar*(B + C) + xbar^2 * S0
    #   with A = sum_i v_i * sum_vn_i, B = sum_i v_i * deg_i,
    #        C = sum_i sum_vn_i
    z = F.lit(0.0)
    pair_glob = per_cell.agg(
        F.coalesce(F.sum("_deg"), z).alias("_s0"),
        F.coalesce(F.sum(F.col("_v") * F.col("_sum_vn")), z).alias("_a"),
        F.coalesce(F.sum(F.col("_v") * F.col("_deg")), z).alias("_b"),
        F.coalesce(F.sum("_sum_vn"), z).alias("_c"),
        F.coalesce(F.sum("_sum_d2"), z).alias("_num_c"),
        F.coalesce(F.sum(F.col("_deg") * F.col("_deg")), z).alias("_sum_deg2"),
    )
    glob = pair_glob.crossJoin(F.broadcast(stats)).select(
        "*",
        (
            F.col("_a")
            - F.col("_mean") * (F.col("_b") + F.col("_c"))
            + F.col("_mean") * F.col("_mean") * F.col("_s0")
        ).alias("_num_i"),
    )
    n = F.col("_n")
    s0 = F.col("_s0")
    m2 = F.col("_m2")
    ok = (m2 > 0) & (s0 > 0) & (n > 1)
    i_stat = F.when(ok, n / s0 * F.col("_num_i") / m2)
    e_i = F.when(n > 1, F.lit(-1.0) / (n - 1))
    s1 = 2.0 * s0
    s2 = 4.0 * F.col("_sum_deg2")
    var_i = F.when(
        ok & (n > 2),
        (n * n * s1 - n * s2 + 3.0 * s0 * s0) / (s0 * s0 * (n * n - 1)) - e_i * e_i,
    )
    return glob.select(
        n.cast("long").alias("n"),
        s0.cast("long").alias("s0"),
        F.col("_mean").alias("mean"),
        m2.alias("m2"),
        i_stat.alias("morans_i"),
        e_i.alias("expected_i"),
        F.when(ok & (var_i > 0), (i_stat - e_i) / F.sqrt(var_i)).alias("z_i"),
        F.when(ok, (n - 1) * F.col("_num_c") / (2.0 * s0 * m2)).alias("gearys_c"),
    )


def kde_weights(radius: int, sigma: float) -> list[tuple[int, int, float]]:
    """The literal (dx, dy, weight) table for a truncated Gaussian
    kernel — computed driver-side once, shipped as constants, and
    directly replayable by any ANSI-SQL oracle."""
    if radius < 1:
        raise ValueError("radius must be >= 1")
    return [
        (dx, dy, math.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma)))
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)
    ]


def kde_smooth(
    cells: DataFrame,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
    value_col: str = "value",
    radius: int = 2,
    sigma: float = 1.5,
    out_col: str = "density",
) -> DataFrame:
    """Gaussian kernel density over a SPARSE cell grid: each occupied
    cell scatters its mass to every cell within Chebyshev ``radius``
    (including itself), weights precomputed as literals.  Output rows
    are every cell that receives mass (occupied cells AND their
    halos), so the heatmap has the soft edges a renderer expects.

    This is ``convolve_2d`` for the sparse case: the dense operator
    (operators/convolution.py) wants a materialized tile; here the
    occupied cells ARE the data and one exploded equi-... rather,
    one explode + groupBy reshuffle of cells x kernel_size rows does
    the whole convolution.  kernel_size is a constant (25 at r=2), so
    the exchange is O(cells), never O(docs)."""
    offs = F.array(*[
        F.struct(
            F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(w).alias("w")
        )
        for dx, dy, w in kde_weights(radius, sigma)
    ])
    return (
        cells.select(
            F.col(x_col).alias("_x"),
            F.col(y_col).alias("_y"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .withColumn("_o", F.explode(offs))
        .groupBy(
            (F.col("_x") + F.col("_o.dx")).alias(x_col),
            (F.col("_y") + F.col("_o.dy")).alias(y_col),
        )
        .agg(F.sum(F.col("_v") * F.col("_o.w")).alias(out_col))
    )
