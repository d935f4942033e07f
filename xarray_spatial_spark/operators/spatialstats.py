"""Spatial statistics over the occupied cell grid and point sets.

The reference ends at per-cell statistics (zonal, focal, hotspots —
xrspatial/zonal.py, xrspatial/focal.py); this module adds the CORPUS-
level spatial questions a web-scale table invites:

- "is anything spatially clustered at all?" — global Moran's I /
  Geary's C (``global_autocorrelation``);
- "WHERE is it clustered?" — local Moran's I / LISA (``local_moran``),
  the inferential sibling of the reference's hotspots;
- "AT WHAT SCALE does spatial dependence act?" — the empirical
  semivariogram (``empirical_variogram``) and Ripley's K/L
  (``ripley_k``);
- "what does the density surface look like?" — Gaussian KDE over cell
  counts (``kde_smooth``, the sparse-raster twin of ``convolve_2d``);
- "fill a raster from scattered measurements" — IDW interpolation
  (``idw_interpolate``), the vector -> raster bridge.

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


def local_moran(
    cells: DataFrame,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
    value_col: str = "value",
    contiguity: str = "queen",
) -> DataFrame:
    """Local Moran's I (LISA, Anselin 1995) per occupied cell:

    ``(x, y, value, deg, lag, local_i, expected_i, z_i, quadrant)``

    - ``local_i``   = (z_i / m2) * sum_j w_ij z_j  with z_i = x_i - xbar
      and m2 = sum_k z_k^2 / n (population second moment);
    - ``expected_i``= -deg_i / (n - 1) and ``z_i`` uses the Anselin
      randomization moments with binary weights (sum_j w_ij^2 = deg_i,
      sum_{k!=h} w_ik w_ih = deg_i^2 - deg_i, b2 = m4 / m2^2);
    - ``quadrant``  = 'HH'/'LL'/'HL'/'LH' from the signs of z_i and the
      spatial lag — NULL for island cells (deg = 0), whose local_i is 0
      and z-score undefined.

    The global statistic (``global_autocorrelation``) answers "is the
    field clustered at all"; this answers WHERE — the per-cell hotspot/
    coldspot map (reference analog: xrspatial/focal.py:hotspots, which
    z-scores a focal mean; LISA is the inferential version).

    Plan: the same shifted-key equi-join as the global statistic, one
    per-cell aggregate, and ONE broadcast scalar attach carrying
    (n, mean, m2, b2).  Exchanges are cell-scale only."""
    base = cells.select(
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
        F.col(value_col).cast("double").alias("_v"),
    )
    # one scalar pass carries everything, b2 included: Spark's
    # kurtosis() is the population excess g2 = m4/m2^2 - 3, so
    # b2 = kurtosis + 3 rides the same aggregate as mean/m2
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_v").alias("_mean"),
        (F.var_pop("_v") * F.count(F.lit(1))).alias("_m2s"),
        (F.kurtosis("_v") + F.lit(3.0)).alias("_b2"),
    )
    pairs = neighbor_values(base, "_x", "_y", "_v", contiguity)
    per_cell = pairs.groupBy("_x", "_y").agg(
        F.count(F.lit(1)).cast("double").alias("_deg"),
        F.sum("_vn").alias("_sum_vn"),
    )
    joined = (
        base.join(per_cell, ["_x", "_y"], "left")
        .select(
            "_x", "_y", "_v",
            F.coalesce(F.col("_deg"), F.lit(0.0)).alias("_deg"),
            F.coalesce(F.col("_sum_vn"), F.lit(0.0)).alias("_sum_vn"),
        )
        .crossJoin(F.broadcast(stats))
    )
    n = F.col("_n")
    m2 = F.col("_m2s") / n
    z = F.col("_v") - F.col("_mean")
    lag_z = F.col("_sum_vn") - F.col("_deg") * F.col("_mean")
    deg = F.col("_deg")
    ok = (F.col("_m2s") > 0) & (deg > 0) & (n > 2)
    local_i = F.when(F.col("_m2s") > 0, z / m2 * lag_z).otherwise(F.lit(None))
    e_i = F.when(deg > 0, -deg / (n - 1.0))
    b2c = F.col("_b2")
    var_i = (
        deg * (n - b2c) / (n - 1.0)
        + (deg * deg - deg) * (2.0 * b2c - n) / ((n - 1.0) * (n - 2.0))
        - (deg * deg) / ((n - 1.0) * (n - 1.0))
    )
    quadrant = F.when(
        deg > 0,
        F.when((z >= 0) & (lag_z >= 0), F.lit("HH"))
        .when((z < 0) & (lag_z < 0), F.lit("LL"))
        .when(z >= 0, F.lit("HL"))
        .otherwise(F.lit("LH")),
    )
    return joined.select(
        F.col("_x").alias(x_col),
        F.col("_y").alias(y_col),
        F.col("_v").alias(value_col),
        deg.cast("int").alias("deg"),
        lag_z.alias("lag"),
        local_i.alias("local_i"),
        e_i.alias("expected_i"),
        F.when(ok & (var_i > 0), (local_i - e_i) / F.sqrt(var_i)).alias("z_i"),
        quadrant.alias("quadrant"),
    )


def point_pairs(
    points: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    value_col: str | None = None,
    max_dist: float = 1.0,
) -> DataFrame:
    """Unordered point pairs within ``max_dist``: one row per pair with
    ``(id_a, id_b, d2)`` (+ ``v_a, v_b`` when ``value_col`` given),
    ``id_a < id_b``, ``0 < sqrt(d2) <= max_dist``.

    Same 3x3 eps-grid equi-join as operators/dbscan.neighbor_pairs —
    grid cell size = max_dist, so any qualifying pair is at most one
    cell apart and each unordered pair is produced exactly once (the
    id_a < id_b gate).  The exchange is pairs-shaped,
    O(n * avg density within max_dist); exact pair statistics ARE that
    big.  For corpus-scale variograms sample points first (the
    standard geostatistics practice) — the estimator is unbiased under
    uniform sampling."""
    if max_dist <= 0:
        raise ValueError("max_dist must be > 0")
    cols = [
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    ]
    if value_col is not None:
        cols.append(F.col(value_col).cast("double").alias("_v"))
    pts = points.select(*cols)
    keyed = pts.withColumn(
        "_cx", F.floor(F.col("_x") / F.lit(float(max_dist)))
    ).withColumn("_cy", F.floor(F.col("_y") / F.lit(float(max_dist))))
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    ])
    lsel = [
        F.col("_id").alias("_aid"),
        F.col("_x").alias("_ax"),
        F.col("_y").alias("_ay"),
        (F.col("_cx") + F.col("_o.dx")).alias("_cx"),
        (F.col("_cy") + F.col("_o.dy")).alias("_cy"),
    ]
    rsel = [
        F.col("_id").alias("_bid"),
        F.col("_x").alias("_bx"),
        F.col("_y").alias("_by"),
        "_cx", "_cy",
    ]
    if value_col is not None:
        lsel.insert(3, F.col("_v").alias("_av"))
        rsel.insert(3, F.col("_v").alias("_bv"))
    left = keyed.withColumn("_o", F.explode(offs)).select(*lsel)
    right = keyed.select(*rsel)
    dx = F.col("_ax") - F.col("_bx")
    dy = F.col("_ay") - F.col("_by")
    d2 = dx * dx + dy * dy
    out = [
        F.col("_aid").alias("id_a"),
        F.col("_bid").alias("id_b"),
        d2.alias("d2"),
    ]
    if value_col is not None:
        out += [F.col("_av").alias("v_a"), F.col("_bv").alias("v_b")]
    return (
        left.join(right, ["_cx", "_cy"])
        .where(
            (F.col("_aid") < F.col("_bid"))
            & (d2 > 0)
            & (d2 <= F.lit(float(max_dist) * float(max_dist)))
        )
        .select(*out)
    )


def _halo_blocks(
    points: DataFrame,
    max_dist: float,
    cols: list,
    mult: int = 1,
):
    """(left, right) frames keyed by a grid cell of size
    ``mult * max_dist`` for a cogrouped pair kernel: ``right`` holds
    each cell's own points, ``left`` holds every point exploded onto
    its 3x3 neighbor cells.  A cogrouped applyInPandas over
    (_cx, _cy) then sees, for every cell, all points that can be
    within ``max_dist`` of its own points — the same coverage as the
    pair equi-join, but the O(pairs) distance work runs as numpy
    block matrices inside the kernel instead of materializing pair
    rows through an exchange.

    ``mult`` trades per-group Python/Arrow invocation overhead
    against in-kernel block size: any cell size >= max_dist keeps 3x3
    coverage complete, and every kernel predicate (distance cutoffs,
    id ordering) is cell-size-independent, so results are identical
    for any mult >= 1.  Use mult > 1 ONLY when max_dist is small
    relative to the point extent (dbscan's eps grid: sf0.1 spent 2x
    its round-start time on per-group fixed cost over ~n single-point
    groups; mult=4 cut it 9.6 -> 3.8 s with sf1.0 flat).  When
    max_dist already covers a large domain fraction (variogram/ripley
    radii), bigger cells inflate the halo block area ~mult^2 and the
    kernel goes quadratic — measured 1.5 -> 40 s at sf1.0 — so the
    statistics kernels stay at mult=1."""
    md = float(max_dist) * max(1, int(mult))
    keyed = points.select(*cols).withColumn(
        "_cx", F.floor(F.col("_x") / F.lit(md))
    ).withColumn("_cy", F.floor(F.col("_y") / F.lit(md)))
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    ])
    left = keyed.withColumn("_o", F.explode(offs)).select(
        *keyed.columns[:-2],
        (F.col("_cx") + F.col("_o.dx")).alias("_cx"),
        (F.col("_cy") + F.col("_o.dy")).alias("_cy"),
    )
    # the right side gets DISTINCT column names: both cogroup sides
    # share the scan lineage, and Spark's attribute dedup on a
    # self-cogroup with identical names silently hands the kernel a
    # key-only frame for some groups (observed on Spark 4.1)
    right = keyed.select(
        *[F.col(c).alias("_r" + c.lstrip("_")) for c in keyed.columns[:-2]],
        "_cx", "_cy",
    )
    return left, right


def empirical_variogram(
    points: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "value",
    bin_width: float = 1.0,
    n_bins: int = 10,
) -> DataFrame:
    """Empirical (Matheron) semivariogram over planar points:

    ``(bin, h_lo, h_hi, n_pairs, gamma)`` with
    gamma(h) = sum_{pairs in bin} (v_i - v_j)^2 / (2 * n_pairs),
    bin = floor(dist / bin_width) over 0 < dist <= bin_width * n_bins.

    The foundation of kriging / spatial-scale analysis: the range
    where gamma plateaus is the distance beyond which page properties
    stop being spatially related — the principled way to pick zoom
    levels and KDE bandwidths for the rest of this module.

    Plan: ``point_pairs`` at max_dist = bin_width * n_bins (one
    grid equi-join), then ONE hash aggregate of pairs -> n_bins rows.
    When the value column is integer-derived, (v_i - v_j)^2 sums are
    exact in float64, so gamma is bit-identical across engines."""
    import numpy as np
    import pandas as pd

    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    max_dist = float(bin_width) * n_bins
    bw = float(bin_width)
    md2 = max_dist * max_dist
    cols = [
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
        F.col(value_col).cast("double").alias("_v"),
    ]
    left, right = _halo_blocks(points, max_dist, cols)

    # per-cell numpy kernel: the same pairs the 3x3 equi-join would
    # materialize (id_a < id_b, 0 < d <= max_dist), but distances and
    # (v_i - v_j)^2 run as chunked block matrices and only per-bin
    # partials (count, sum) leave the kernel.  Sums of integer-derived
    # values in float64 are exact below 2^53 regardless of order, so
    # gamma is unchanged bit-for-bit.
    def _kern(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(lpdf) or not len(rpdf):
            return pd.DataFrame({"bin": np.array([], np.int32),
                                 "_n": np.array([], np.int64),
                                 "_s": np.array([], np.float64)})
        rid = rpdf["_rid"].to_numpy()
        rx = rpdf["_rx"].to_numpy()
        ry = rpdf["_ry"].to_numpy()
        rv = rpdf["_rv"].to_numpy()
        cnt = np.zeros(n_bins, dtype=np.int64)
        ssum = np.zeros(n_bins, dtype=np.float64)
        for lo in range(0, len(lpdf), 4096):
            blk = lpdf.iloc[lo: lo + 4096]
            aid = blk["_id"].to_numpy()[:, None]
            ax = blk["_x"].to_numpy()[:, None]
            ay = blk["_y"].to_numpy()[:, None]
            av = blk["_v"].to_numpy()[:, None]
            dx = ax - rx[None, :]
            dy = ay - ry[None, :]
            d2 = dx * dx + dy * dy
            m = (aid < rid[None, :]) & (d2 > 0) & (d2 <= md2)
            if not m.any():
                continue
            b = np.minimum(
                np.floor(np.sqrt(d2[m]) / bw), n_bins - 1
            ).astype(np.int64)
            dv = (av - rv[None, :])[m]
            np.add.at(cnt, b, 1)
            np.add.at(ssum, b, dv * dv)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"bin": nz.astype(np.int32),
                             "_n": cnt[nz], "_s": ssum[nz]})

    partials = (
        left.groupBy("_cx", "_cy")
        .cogroup(right.groupBy("_cx", "_cy"))
        .applyInPandas(_kern, schema="bin int, _n long, _s double")
    )
    return (
        partials.groupBy("bin")
        .agg(
            F.sum("_n").alias("n_pairs"),
            (F.sum("_s") / (2.0 * F.sum("_n"))).alias("gamma"),
        )
        .select(
            "bin",
            (F.col("bin") * float(bin_width)).alias("h_lo"),
            ((F.col("bin") + 1) * float(bin_width)).alias("h_hi"),
            "n_pairs",
            "gamma",
        )
    )


def ripley_k(
    points: DataFrame,
    radii: list[float],
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    area: float = 1.0,
) -> DataFrame:
    """Ripley's K and L functions (no edge correction) at the given
    radii: ``(r, n_pairs, k, l)`` with

    K(r) = area * 2 * #{unordered pairs with dist <= r} / (n * (n-1))
    L(r) = sqrt(K(r) / pi)       (L(r) - r > 0  <=>  clustered at r)

    The point-pattern scale diagnostic: where DBSCAN answers "which
    points cluster", K answers "AT WHAT SCALES does the whole pattern
    cluster vs disperse".  No edge correction is applied (at web scale
    the window is the whole world and boundary effects vanish); for
    small windows compare against the uncorrected CSR expectation
    K(r) = pi r^2 of a simulated uniform pattern rather than the
    closed form.

    Plan: ``point_pairs`` once at max(radii), then ONE aggregate with
    a conditional count per radius (radii are literals) and a
    broadcast n attach.  Pair counts are integers, so K/L replay
    bit-identically in any engine."""
    import numpy as np
    import pandas as pd

    if not radii or any(r <= 0 for r in radii):
        raise ValueError("radii must be non-empty and positive")
    rs = sorted(float(r) for r in radii)
    cols = [
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    ]
    left, right = _halo_blocks(points, rs[-1], cols)
    r2s = np.array([r * r for r in rs])

    # per-cell numpy pair counting (see empirical_variogram): integer
    # counts per literal radius leave the kernel, nothing else.
    def _kern(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        out = np.zeros(len(rs), dtype=np.int64)
        if len(lpdf) and len(rpdf):
            rid = rpdf["_rid"].to_numpy()
            rx = rpdf["_rx"].to_numpy()
            ry = rpdf["_ry"].to_numpy()
            for lo in range(0, len(lpdf), 4096):
                blk = lpdf.iloc[lo: lo + 4096]
                dx = blk["_x"].to_numpy()[:, None] - rx[None, :]
                dy = blk["_y"].to_numpy()[:, None] - ry[None, :]
                d2 = dx * dx + dy * dy
                m = (blk["_id"].to_numpy()[:, None] < rid[None, :]) & (d2 > 0)
                d2m = d2[m]
                for i in range(len(rs)):
                    out[i] += int((d2m <= r2s[i]).sum())
        return pd.DataFrame({f"_c{i}": [out[i]] for i in range(len(rs))})

    schema = ", ".join(f"_c{i} long" for i in range(len(rs)))
    partials = (
        left.groupBy("_cx", "_cy")
        .cogroup(right.groupBy("_cx", "_cy"))
        .applyInPandas(_kern, schema=schema)
    )
    counts = partials.agg(*[
        F.coalesce(F.sum(f"_c{i}"), F.lit(0)).alias(f"_c{i}")
        for i in range(len(rs))
    ])
    n_row = points.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    wide = counts.crossJoin(F.broadcast(n_row))
    per_r = [
        wide.select(
            F.lit(r).alias("r"),
            F.col(f"_c{i}").cast("long").alias("n_pairs"),
            (
                F.lit(float(area)) * 2.0 * F.col(f"_c{i}")
                / (F.col("_n") * (F.col("_n") - 1.0))
            ).alias("k"),
        )
        for i, r in enumerate(rs)
    ]
    out = per_r[0]
    for df in per_r[1:]:
        out = out.unionByName(df)
    return out.select("r", "n_pairs", "k", F.sqrt(F.col("k") / math.pi).alias("l"))


def cross_ripley_k(
    points_a: DataFrame,
    points_b: DataFrame,
    radii: list[float],
    x_col: str = "x",
    y_col: str = "y",
    area: float = 1.0,
) -> DataFrame:
    """Bivariate (cross) Ripley's K — the spatial-COLOCATION
    diagnostic between two point populations (e.g. two languages'
    pages): ``(r, n_pairs, k)`` with

    K_ab(r) = area * #{(a, b): dist(a, b) <= r} / (n_a * n_b)

    K_ab above the CSR-independence expectation pi r^2 means the two
    populations co-locate at scale r; below means they avoid each
    other.  Coincident coordinates (d = 0) COUNT — distinct
    populations legitimately share locations.

    Plan: one 3x3 grid equi-join between A (offset-exploded) and B
    (keyed) at cell size max(radii) — every qualifying cross pair
    exactly once — then one conditional-count aggregate per literal
    radius and a broadcast (n_a, n_b) attach.  Counts are integers:
    any engine replays K bit-for-bit."""
    if not radii or any(r <= 0 for r in radii):
        raise ValueError("radii must be non-empty and positive")
    rs = sorted(float(r) for r in radii)
    md = rs[-1]
    a = points_a.select(
        F.col(x_col).cast("double").alias("_ax"),
        F.col(y_col).cast("double").alias("_ay"),
    ).withColumn("_cx", F.floor(F.col("_ax") / F.lit(md))).withColumn(
        "_cy", F.floor(F.col("_ay") / F.lit(md))
    )
    b = points_b.select(
        F.col(x_col).cast("double").alias("_bx"),
        F.col(y_col).cast("double").alias("_by"),
    ).withColumn("_cx", F.floor(F.col("_bx") / F.lit(md))).withColumn(
        "_cy", F.floor(F.col("_by") / F.lit(md))
    )
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    ])
    a_x = a.withColumn("_o", F.explode(offs)).select(
        "_ax", "_ay",
        (F.col("_cx") + F.col("_o.dx")).alias("_cx"),
        (F.col("_cy") + F.col("_o.dy")).alias("_cy"),
    )
    import numpy as np
    import pandas as pd

    r2s = np.array([r * r for r in rs])

    # per-cell numpy cross counting (see empirical_variogram's kernel):
    # d = 0 counts, no id gate — every qualifying (a, b) exactly once.
    def _kern(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        out = np.zeros(len(rs), dtype=np.int64)
        if len(lpdf) and len(rpdf):
            rx = rpdf["_bx"].to_numpy()
            ry = rpdf["_by"].to_numpy()
            for lo in range(0, len(lpdf), 4096):
                blk = lpdf.iloc[lo: lo + 4096]
                ddx = blk["_ax"].to_numpy()[:, None] - rx[None, :]
                ddy = blk["_ay"].to_numpy()[:, None] - ry[None, :]
                dd2 = (ddx * ddx + ddy * ddy).ravel()
                for i in range(len(rs)):
                    out[i] += int((dd2 <= r2s[i]).sum())
        return pd.DataFrame({f"_c{i}": [out[i]] for i in range(len(rs))})

    schema = ", ".join(f"_c{i} long" for i in range(len(rs)))
    partials = (
        a_x.groupBy("_cx", "_cy")
        .cogroup(b.groupBy("_cx", "_cy"))
        .applyInPandas(_kern, schema=schema)
    )
    counts = partials.agg(*[
        F.coalesce(F.sum(f"_c{i}"), F.lit(0)).alias(f"_c{i}")
        for i in range(len(rs))
    ])
    na = points_a.agg(F.count(F.lit(1)).cast("double").alias("_na"))
    nb = points_b.agg(F.count(F.lit(1)).cast("double").alias("_nb"))
    wide = counts.crossJoin(F.broadcast(na)).crossJoin(F.broadcast(nb))
    per_r = [
        wide.select(
            F.lit(r).alias("r"),
            F.col(f"_c{i}").cast("long").alias("n_pairs"),
            (
                F.lit(float(area)) * F.col(f"_c{i}")
                / (F.col("_na") * F.col("_nb"))
            ).alias("k"),
        )
        for i, r in enumerate(rs)
    ]
    out = per_r[0]
    for df in per_r[1:]:
        out = out.unionByName(df)
    return out


def idw_interpolate(
    known: DataFrame,
    targets: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "value",
    power: float = 2.0,
    radius: float = 1.0,
) -> DataFrame:
    """Inverse-distance-weighted interpolation: predict ``value`` at
    each target from known points within ``radius``:

    ``(x, y, n_neighbors, predicted)`` — predicted = NULL when no
    known point is in range; an exact-coordinate hit (d = 0) takes
    the known value directly (the classical IDW convention; averaged
    when several known points share the coordinate).

    The vector -> raster bridge the reference lacks: scattered point
    measurements become a dense surface that the raster operators
    (slope, focal, classify) can then consume.

    Plan: bucket BOTH frames into a radius-sized grid, one 3x3
    shifted-key equi-join (targets explode the offsets), then one
    groupBy(target).  Exchange is candidate-pair-shaped; the grid IS
    the spatial index, no nested-loop join."""
    if radius <= 0:
        raise ValueError("radius must be > 0")
    r = float(radius)
    tgt = targets.select(
        F.col(x_col).cast("double").alias("_tx"),
        F.col(y_col).cast("double").alias("_ty"),
    ).withColumn("_cx", F.floor(F.col("_tx") / F.lit(r))).withColumn(
        "_cy", F.floor(F.col("_ty") / F.lit(r))
    )
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    ])
    tgt_x = tgt.withColumn("_o", F.explode(offs)).select(
        "_tx", "_ty",
        (F.col("_cx") + F.col("_o.dx")).alias("_cx"),
        (F.col("_cy") + F.col("_o.dy")).alias("_cy"),
    )
    src = known.select(
        F.col(x_col).cast("double").alias("_kx"),
        F.col(y_col).cast("double").alias("_ky"),
        F.col(value_col).cast("double").alias("_kv"),
    ).withColumn("_cx", F.floor(F.col("_kx") / F.lit(r))).withColumn(
        "_cy", F.floor(F.col("_ky") / F.lit(r))
    )
    dx = F.col("_tx") - F.col("_kx")
    dy = F.col("_ty") - F.col("_ky")
    d2 = dx * dx + dy * dy
    cand = (
        tgt_x.join(src, ["_cx", "_cy"])
        .where(d2 <= F.lit(r * r))
        .select("_tx", "_ty", "_kv", d2.alias("_d2"))
    )
    w = F.pow(F.col("_d2"), F.lit(-float(power) / 2.0))
    agg = cand.groupBy("_tx", "_ty").agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        F.sum(F.when(F.col("_d2") == 0, 1)).alias("_nhit"),
        F.avg(F.when(F.col("_d2") == 0, F.col("_kv"))).alias("_vhit"),
        F.sum(F.when(F.col("_d2") > 0, w * F.col("_kv"))).alias("_wv"),
        F.sum(F.when(F.col("_d2") > 0, w)).alias("_w"),
    )
    pred = F.when(F.col("_nhit") > 0, F.col("_vhit")).otherwise(
        F.col("_wv") / F.col("_w")
    )
    return (
        tgt.select("_tx", "_ty")
        .join(agg, ["_tx", "_ty"], "left")
        .select(
            F.col("_tx").alias(x_col),
            F.col("_ty").alias(y_col),
            F.coalesce(F.col("n_neighbors"), F.lit(0)).cast("int").alias(
                "n_neighbors"
            ),
            pred.alias("predicted"),
        )
    )


def variogram_fit(
    variogram: DataFrame,
    model: str = "spherical",
) -> dict:
    """Weighted-least-squares fit of a ``spherical`` or ``exponential``
    model to an ``empirical_variogram`` output, returning
    ``{"model", "nugget", "sill", "range"}``.

    gamma_sph(h) = nugget + psill * (1.5 h/a - 0.5 (h/a)^3), h < a
                   nugget + psill,                           h >= a
    gamma_exp(h) = nugget + psill * (1 - exp(-3 h / a))

    The empirical variogram is BINS-scale (tens of rows), so the fit
    is driver-side by construction: collect the bins, grid-search the
    range over the bin midpoints x a refinement grid, and solve the
    (nugget, psill) linear WLS (weights = n_pairs) in closed form per
    candidate range — the standard gstat-style profile fit, no
    iterative optimizer, fully deterministic."""
    if model not in ("spherical", "exponential"):
        raise ValueError("model must be 'spherical' or 'exponential'")
    import numpy as np

    rows = variogram.select("h_lo", "h_hi", "n_pairs", "gamma").collect()
    if not rows:
        raise ValueError("empty variogram")
    h = np.array([(r["h_lo"] + r["h_hi"]) / 2.0 for r in rows])
    g = np.array([float(r["gamma"]) for r in rows])
    w = np.array([float(r["n_pairs"]) for r in rows])
    hmax = float(h.max())

    def basis(a: float) -> np.ndarray:
        if model == "spherical":
            u = np.minimum(h / a, 1.0)
            return 1.5 * u - 0.5 * u**3
        return 1.0 - np.exp(-3.0 * h / a)

    best = None
    for a in np.linspace(hmax / 20.0, 2.0 * hmax, 80):
        b = basis(float(a))
        # WLS for gamma ~ c0 + c1 * b  (2x2 normal equations)
        sw, swb = w.sum(), (w * b).sum()
        swbb, swg, swbg = (w * b * b).sum(), (w * g).sum(), (w * b * g).sum()
        det = sw * swbb - swb * swb
        if det <= 0:
            continue
        c0 = (swbb * swg - swb * swbg) / det
        c1 = (sw * swbg - swb * swg) / det
        c0, c1 = max(c0, 0.0), max(c1, 0.0)
        sse = float((w * (g - c0 - c1 * b) ** 2).sum())
        if best is None or sse < best[0]:
            best = (sse, c0, c1, float(a))
    _, nugget, psill, rng = best
    return {
        "model": model,
        "nugget": nugget,
        "sill": nugget + psill,
        "range": rng,
    }


def ordinary_krige(
    known: DataFrame,
    targets: DataFrame,
    params: dict,
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "value",
    radius: float = 1.0,
    k: int = 12,
) -> DataFrame:
    """Local ordinary kriging: predict ``value`` (+ kriging variance)
    at each target from its ``k`` nearest known points within
    ``radius``, under a fitted variogram model (``variogram_fit``
    output or a hand-built dict):

    ``(x, y, n_neighbors, predicted, variance)``

    Solves the standard OK system per target —
    ``[[Gamma, 1], [1^T, 0]] [w, mu] = [gamma0, 1]`` — which makes the
    predictor EXACT at known points (a target on a known coordinate
    gets that value back with zero variance).

    Distributed shape: candidates come from the same radius-grid 3x3
    equi-join as ``idw_interpolate``; per-target top-k is one window
    over candidates (deterministic d2-then-coordinate tie-break); the
    k x k solves batch through ONE applyInPandas stage (k is a small
    constant, so each solve is O(k^3) driver-free numpy).  Exchange =
    candidates + one (target)-keyed shuffle; nothing is corpus-scale.
    """
    import numpy as np  # noqa: F401  (executor-side import below)

    from pyspark.sql import Window

    if radius <= 0 or k < 1:
        raise ValueError("radius must be > 0 and k >= 1")
    r = float(radius)
    model = params["model"]
    nugget = float(params["nugget"])
    sill = float(params["sill"])
    rng = float(params["range"])
    tgt = targets.select(
        F.col(x_col).cast("double").alias("_tx"),
        F.col(y_col).cast("double").alias("_ty"),
    ).withColumn("_cx", F.floor(F.col("_tx") / F.lit(r))).withColumn(
        "_cy", F.floor(F.col("_ty") / F.lit(r))
    )
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    ])
    tgt_x = tgt.withColumn("_o", F.explode(offs)).select(
        "_tx", "_ty",
        (F.col("_cx") + F.col("_o.dx")).alias("_cx"),
        (F.col("_cy") + F.col("_o.dy")).alias("_cy"),
    )
    src = known.select(
        F.col(x_col).cast("double").alias("_kx"),
        F.col(y_col).cast("double").alias("_ky"),
        F.col(value_col).cast("double").alias("_kv"),
    ).withColumn("_cx", F.floor(F.col("_kx") / F.lit(r))).withColumn(
        "_cy", F.floor(F.col("_ky") / F.lit(r))
    )
    dxc = F.col("_tx") - F.col("_kx")
    dyc = F.col("_ty") - F.col("_ky")
    d2 = dxc * dxc + dyc * dyc
    cand = (
        tgt_x.join(src, ["_cx", "_cy"])
        .where(d2 <= F.lit(r * r))
        .select("_tx", "_ty", "_kx", "_ky", "_kv", d2.alias("_d2"))
    )
    wnd = Window.partitionBy("_tx", "_ty").orderBy("_d2", "_kx", "_ky")
    top = cand.withColumn("_rn", F.row_number().over(wnd)).where(
        F.col("_rn") <= k
    )
    gathered = top.groupBy("_tx", "_ty").agg(
        F.collect_list(F.struct("_kx", "_ky", "_kv", "_d2")).alias("_nb")
    )

    out_schema = (
        "_tx double, _ty double, n_neighbors int, "
        "predicted double, variance double"
    )

    def _solve(pdf_iter):
        import numpy as np
        import pandas as pd

        def gamma_of(h):
            # gamma(0) = 0 BY DEFINITION (the nugget is the h->0+
            # limit) — this is what makes the predictor exact at
            # known coordinates
            if model == "spherical":
                u = np.minimum(h / rng, 1.0)
                g = nugget + (sill - nugget) * (1.5 * u - 0.5 * u**3)
            else:
                g = nugget + (sill - nugget) * (1.0 - np.exp(-3.0 * h / rng))
            return np.where(h == 0.0, 0.0, g)

        for pdf in pdf_iter:
            rows = []
            for _, row in pdf.iterrows():
                nb = sorted(row["_nb"], key=lambda s: (s["_d2"], s["_kx"], s["_ky"]))
                m = len(nb)
                xs = np.array([s["_kx"] for s in nb])
                ys = np.array([s["_ky"] for s in nb])
                vs = np.array([s["_kv"] for s in nb])
                dd = np.sqrt(
                    (xs[:, None] - xs[None, :]) ** 2
                    + (ys[:, None] - ys[None, :]) ** 2
                )
                A = np.empty((m + 1, m + 1))
                A[:m, :m] = gamma_of(dd)
                np.fill_diagonal(A[:m, :m], 0.0)
                A[m, :m] = 1.0
                A[:m, m] = 1.0
                A[m, m] = 0.0
                g0 = gamma_of(
                    np.sqrt((xs - row["_tx"]) ** 2 + (ys - row["_ty"]) ** 2)
                )
                b = np.append(g0, 1.0)
                try:
                    sol = np.linalg.solve(A, b)
                except np.linalg.LinAlgError:
                    # duplicate known coordinates make A singular —
                    # fall back to the pseudo-inverse (same predictor
                    # on the consistent system)
                    sol = np.linalg.lstsq(A, b, rcond=None)[0]
                wgt, mu = sol[:m], sol[m]
                pred = float(wgt @ vs)
                var = float(max(wgt @ g0 + mu, 0.0))
                rows.append(
                    (row["_tx"], row["_ty"], m, pred, var)
                )
            yield pd.DataFrame(
                rows,
                columns=["_tx", "_ty", "n_neighbors", "predicted", "variance"],
            )

    solved = gathered.mapInPandas(_solve, out_schema)
    return (
        tgt.select("_tx", "_ty")
        .join(solved, ["_tx", "_ty"], "left")
        .select(
            F.col("_tx").alias(x_col),
            F.col("_ty").alias(y_col),
            F.coalesce(F.col("n_neighbors"), F.lit(0)).cast("int").alias(
                "n_neighbors"
            ),
            F.col("predicted"),
            F.col("variance"),
        )
    )


def mann_kendall_trend(
    cube: DataFrame,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
    t_col: str = "t",
    value_col: str = "value",
    alpha_z: float = 1.959963984540054,
) -> DataFrame:
    """Per-cell Mann-Kendall monotonic-trend test + Theil-Sen slope
    over a space-time cube (the ESRI "emerging hot spot" trend core):

    ``(x, y, n_periods, s, z, slope, trend)``

    - ``s``     = sum_{i<j} sign(v_j - v_i) over the cell's time
      series (exact integer);
    - ``z``     = the tie-corrected normal approximation
      (Var[S] = [T(T-1)(2T+5) - sum_g t_g(t_g-1)(2t_g+5)] / 18, with
      the +-1 continuity correction; NULL when T < 3 or Var = 0);
    - ``slope`` = Theil-Sen median of pairwise slopes
      (v_j - v_i)/(t_j - t_i) — the robust trend magnitude;
    - ``trend`` = 'increasing' / 'decreasing' / 'none' at ``alpha_z``
      (default two-sided 5%).

    Distributed shape: the time dimension is BOUNDED (callers bucket
    to days/weeks — T is tens, never corpus-scale), so the per-cell
    pair explosion is T^2/2 rows per cell via one (cell)-keyed
    self-join; everything else is two hash aggregates.  The exchange
    is cells x T^2 — independent of document count.

    Nondeterminism note: S and the tie groups are exact integers, so
    the statistic replays bit-identically in any engine; the median
    interpolates (a+b)/2 on identical doubles."""
    base = cube.select(
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
        F.col(t_col).cast("long").alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    )
    a = base.select("_x", "_y", F.col("_t").alias("_ti"), F.col("_v").alias("_vi"))
    b = base.select("_x", "_y", F.col("_t").alias("_tj"), F.col("_v").alias("_vj"))
    pairs = a.join(b, ["_x", "_y"]).where(F.col("_ti") < F.col("_tj"))
    pair_agg = pairs.groupBy("_x", "_y").agg(
        F.sum(F.signum(F.col("_vj") - F.col("_vi"))).alias("_s"),
        F.expr(
            "percentile((_vj - _vi) / CAST(_tj - _ti AS DOUBLE), 0.5)"
        ).alias("_slope"),
    )
    # tie correction: group sizes of equal VALUES within the cell
    ties = (
        base.groupBy("_x", "_y", "_v")
        .agg(F.count(F.lit(1)).cast("double").alias("_tg"))
        .groupBy("_x", "_y")
        .agg(
            F.sum("_tg").alias("_n"),
            F.sum(
                F.col("_tg") * (F.col("_tg") - 1) * (2 * F.col("_tg") + 5)
            ).alias("_tie_sum"),
        )
    )
    n = F.col("_n")
    var_s = (n * (n - 1) * (2 * n + 5) - F.col("_tie_sum")) / 18.0
    s = F.col("_s")
    z = F.when(
        (n >= 3) & (var_s > 0),
        F.when(s > 0, (s - 1) / F.sqrt(var_s))
        .when(s < 0, (s + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0)),
    )
    trend = F.when(z.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(z > alpha_z, F.lit("increasing"))
        .when(z < -alpha_z, F.lit("decreasing"))
        .otherwise(F.lit("none"))
    )
    return (
        ties.join(pair_agg, ["_x", "_y"], "left")
        .select(
            F.col("_x").alias(x_col),
            F.col("_y").alias(y_col),
            n.cast("int").alias("n_periods"),
            F.coalesce(s, F.lit(0.0)).cast("long").alias("s"),
            z.alias("z"),
            F.col("_slope").alias("slope"),
            trend.alias("trend"),
        )
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

def getis_ord(
    cells: DataFrame,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
    value_col: str = "value",
    contiguity: str = "queen",
) -> DataFrame:
    """Getis-Ord Gi* hot-spot statistic per occupied cell (Ord & Getis
    1995), the classic "Hot Spot Analysis" z-score:

    ``(x, y, value, deg, wi, gi_star)``

    - ``wi``       = deg_i + 1 (binary contiguity weights WITH self —
      the * variant; the plain Gi excludes self);
    - ``gi_star``  = (sum_{j in N(i) u {i}} x_j - xbar * W_i)
      / (S * sqrt((n * W_i - W_i^2) / (n - 1)))
      with S^2 = sum x^2 / n - xbar^2 (population variance).

    NULL when the field is constant (S = 0), n <= 1, or W_i = n (the
    denominator degenerates when a cell neighbors every other cell).

    ``local_moran`` answers "is this cell like its neighbors"; Gi*
    answers "is the local SUM high or low" — the two standard local
    statistics disagree exactly on cold cells inside hot neighborhoods,
    which is why both exist.  Reference analog: xrspatial/focal.py's
    hotspots z-scores a focal mean against the GLOBAL std; Gi* is the
    inferential version with per-cell variance under randomization.

    Plan: identical shape to ``local_moran`` — one scalar aggregate
    (broadcast 1-row attach), one shifted-key equi-join, one per-cell
    aggregate.  Exchanges are cell-scale only."""
    base = cells.select(
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
        F.col(value_col).cast("double").alias("_v"),
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_v").alias("_mean"),
        F.var_pop("_v").alias("_varp"),
    )
    pairs = neighbor_values(base, "_x", "_y", "_v", contiguity)
    per_cell = pairs.groupBy("_x", "_y").agg(
        F.count(F.lit(1)).cast("double").alias("_deg"),
        F.sum("_vn").alias("_sum_vn"),
    )
    joined = (
        base.join(per_cell, ["_x", "_y"], "left")
        .select(
            "_x", "_y", "_v",
            F.coalesce(F.col("_deg"), F.lit(0.0)).alias("_deg"),
            F.coalesce(F.col("_sum_vn"), F.lit(0.0)).alias("_sum_vn"),
        )
        .crossJoin(F.broadcast(stats))
    )
    n = F.col("_n")
    wi = F.col("_deg") + 1.0
    gsum = F.col("_sum_vn") + F.col("_v")
    s = F.sqrt(F.col("_varp"))
    denom2 = (n * wi - wi * wi) / (n - 1.0)
    ok = (F.col("_varp") > 0) & (n > 1) & (denom2 > 0)
    gi = F.when(ok, (gsum - F.col("_mean") * wi) / (s * F.sqrt(denom2)))
    return joined.select(
        F.col("_x").alias(x_col),
        F.col("_y").alias(y_col),
        F.col("_v").alias(value_col),
        F.col("_deg").cast("int").alias("deg"),
        wi.cast("int").alias("wi"),
        gi.alias("gi_star"),
    )


def join_counts(
    cells: DataFrame,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
    value_col: str = "value",
    contiguity: str = "queen",
    p: float | None = None,
) -> DataFrame:
    """Join-count statistics for a BINARY cell grid (Cliff & Ord 1981
    ch. 1): the categorical sibling of Moran's I.  One row:

    ``(n, n1, joins, bb, bw, ww, p, e_bb, e_bw, e_ww, var_bw, z_bw)``

    - ``joins``  = unordered adjacent pairs; ``bb``/``bw``/``ww`` the
      exact black-black / discordant / white-white counts among them;
    - expectations under FREE (binomial) sampling with success
      probability ``p`` (estimated as n1/n when not given — the
      standard caveat: the test is exact for known p, approximate for
      estimated p): E[BB] = J p^2, E[WW] = J q^2, E[BW] = 2 J p q;
    - ``var_bw`` from first principles rather than a looked-up recipe:
      BW = sum_e Z_e over joins e, E[Z_e Z_f] is 2pq on the diagonal,
      pq for joins sharing a vertex (condition on the shared cell:
      p q^2 + q p^2 = pq), and 4 p^2 q^2 for disjoint joins, so with
      t = sum_i C(deg_i, 2) shared-vertex pairs:
      Var[BW] = 2Jpq + 2 (t pq + (C(J,2) - t) 4 p^2 q^2) - (2Jpq)^2.
      (Pinned EXACTLY against full 2^n enumeration in tests.)
    - ``z_bw`` < 0 means fewer discordant joins than chance — spatial
      clustering of the binary attribute.

    The counts are exact integers, so a SQL oracle replays them
    bit-for-bit; the moments are rational functions of integers.

    Plan: one shifted-key equi-join, one per-cell degree aggregate,
    two global 1-row reductions.  Cell-scale exchanges only."""
    base = cells.select(
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
        (F.col(value_col).cast("double") != 0).cast("double").alias("_v"),
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_v").alias("_n1"),
    )
    pairs = neighbor_values(base, "_x", "_y", "_v", contiguity)
    per_cell = pairs.groupBy("_x", "_y").agg(
        F.count(F.lit(1)).cast("double").alias("_deg")
    )
    z = F.lit(0.0)
    pair_glob = pairs.agg(
        F.coalesce(F.count(F.lit(1)).cast("double"), z).alias("_s0"),
        F.coalesce(F.sum(F.col("_v") * F.col("_vn")), z).alias("_bb2"),
        F.coalesce(
            F.sum(F.col("_v") + F.col("_vn") - 2.0 * F.col("_v") * F.col("_vn")), z
        ).alias("_bw2"),
    )
    deg_glob = per_cell.agg(
        F.coalesce(F.sum(F.col("_deg") * (F.col("_deg") - 1.0)) / 2.0, z).alias("_t")
    )
    glob = (
        pair_glob.crossJoin(F.broadcast(deg_glob)).crossJoin(F.broadcast(stats))
    )
    n = F.col("_n")
    m = F.col("_s0") / 2.0
    bb = F.col("_bb2") / 2.0
    bw = F.col("_bw2") / 2.0
    ww = m - bb - bw
    pp = F.lit(float(p)) if p is not None else F.col("_n1") / n
    qq = 1.0 - pp
    e_bb = m * pp * pp
    e_ww = m * qq * qq
    e_bw = 2.0 * m * pp * qq
    t = F.col("_t")
    join_pairs = m * (m - 1.0) / 2.0
    e_bw_sq = (
        2.0 * m * pp * qq
        + 2.0 * (t * pp * qq + (join_pairs - t) * 4.0 * pp * pp * qq * qq)
    )
    var_bw = e_bw_sq - e_bw * e_bw
    ok = (m > 0) & (var_bw > 0)
    return glob.select(
        n.cast("long").alias("n"),
        F.col("_n1").cast("long").alias("n1"),
        m.cast("long").alias("joins"),
        bb.cast("long").alias("bb"),
        bw.cast("long").alias("bw"),
        ww.cast("long").alias("ww"),
        pp.alias("p"),
        F.when(m > 0, e_bb).alias("e_bb"),
        F.when(m > 0, e_bw).alias("e_bw"),
        F.when(m > 0, e_ww).alias("e_ww"),
        F.when(ok, var_bw).alias("var_bw"),
        F.when(ok, (bw - e_bw) / F.sqrt(var_bw)).alias("z_bw"),
    )


def centrography(
    points: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    weight_col: str | None = None,
) -> DataFrame:
    """Centrographic summary of a point population (the ESRI "Measuring
    Geographic Distributions" toolbox: Mean Center, Standard Distance,
    Standard Deviational Ellipse — Yuill 1971).  ONE row:

    ``(n, w_sum, mean_x, mean_y, std_distance, sigma_x, sigma_y,
    theta)``

    - ``mean_x/y``      = weighted mean center;
    - ``std_distance``  = sqrt(Sxx + Syy) with Sxx/Syy/Sxy the weighted
      POPULATION central second moments — the radius of the standard
      distance circle;
    - ``sigma_x/y``     = sqrt(2 * lambda_1/2) of the 2x2 moment matrix
      (the ESRI sqrt(2) convention, so the ellipse covers ~63% of a
      bivariate normal); ``sigma_y`` is the minor axis;
    - ``theta``         = 0.5 * atan2(2 Sxy, Sxx - Syy), the major-axis
      orientation in radians from +x, in (-pi/2, pi/2].

    Moments use the one-pass identity sum(w x^2)/W - mean^2 — exact
    enough on coordinate ranges (|x| <= 360), and the SAME expression
    an ANSI oracle replays; outputs should be cast float32 by callers
    comparing cross-engine (sum merge order differs at the 16th digit).

    Plan: ONE scalar aggregate (6 sums), driver-free closed forms.
    This is the cheapest statistic in the module — a single reduce."""
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    agg = points.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(w).alias("_w"),
        F.sum(w * x).alias("_wx"),
        F.sum(w * y).alias("_wy"),
        F.sum(w * x * x).alias("_wxx"),
        F.sum(w * y * y).alias("_wyy"),
        F.sum(w * x * y).alias("_wxy"),
    )
    ws = F.col("_w")
    mx = F.col("_wx") / ws
    my = F.col("_wy") / ws
    sxx = F.col("_wxx") / ws - mx * mx
    syy = F.col("_wyy") / ws - my * my
    sxy = F.col("_wxy") / ws - mx * my
    tr = sxx + syy
    det_rad = F.sqrt(
        (sxx - syy) * (sxx - syy) / 4.0 + sxy * sxy
    )
    lam1 = tr / 2.0 + det_rad
    lam2 = tr / 2.0 - det_rad
    ok = ws > 0
    return agg.select(
        F.col("n"),
        ws.alias("w_sum"),
        F.when(ok, mx).alias("mean_x"),
        F.when(ok, my).alias("mean_y"),
        F.when(ok, F.sqrt(F.greatest(tr, F.lit(0.0)))).alias("std_distance"),
        F.when(ok, F.sqrt(2.0 * F.greatest(lam1, F.lit(0.0)))).alias("sigma_x"),
        F.when(ok, F.sqrt(2.0 * F.greatest(lam2, F.lit(0.0)))).alias("sigma_y"),
        F.when(ok, F.atan2(2.0 * sxy, sxx - syy) / 2.0).alias("theta"),
    )


def tpi_landform(
    cells: DataFrame,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
    value_col: str = "value",
    radius: int = 2,
    flat_eps: float = 1.0,
) -> DataFrame:
    """Topographic Position Index + Weiss (2001) 6-class landform per
    occupied cell:

    ``(x, y, value, tpi, max_drop, landform)``

    - ``tpi``      = z - mean(z over PRESENT neighbors within
      Chebyshev ``radius``, self excluded) — positive above the
      neighborhood, negative below;
    - ``max_drop`` = max |z - z_n| over the 8 ADJACENT present
      neighbors (the slope proxy gating 'flat' vs 'mid_slope');
    - ``landform`` classes on the TPI z-score t = tpi / sd(tpi):
      ridge (t > 1), upper_slope (0.5 < t <= 1), mid_slope
      (|t| <= 0.5, max_drop > flat_eps), flat (|t| <= 0.5,
      max_drop <= flat_eps), lower_slope (-1 <= t < -0.5),
      valley (t < -1); cells with NO neighbor in the disk are
      'isolated' (tpi NULL).

    Plan: ONE literal-offset mail pass emits both statistics (each
    cell explodes to its (2r+1)^2 - 1 disk positions, tagged adj for
    the |dx|,|dy| <= 1 ring), one receiver aggregate computes the
    disk mean AND the adjacent max-|drop| together, the global
    sd(tpi) rides a 1-row broadcast attach — two cell-scale
    exchanges + a scalar, no Python, no window.

    Cross-engine determinism (the perplexity_buckets convention):
    ``tpi`` and ``sd`` round to 6 dp BEFORE the threshold ladder in
    both this plan and the SQL twin, so a 16th-digit aggregation-
    order wobble cannot flip a class across engines.  On integer-
    derived fields the disk mean is exact (integer sum / count).
    """
    if radius < 1:
        raise ValueError("radius must be >= 1")
    base = cells.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y"),
        F.col(value_col).cast("double").alias("value"),
    ).where(F.col("value").isNotNull() & ~F.isnan("value"))

    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(1 if max(abs(dx), abs(dy)) <= 1 else 0).alias("adj"))
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)
        if (dx, dy) != (0, 0)
    ])
    nb = (
        base.withColumn("_o", F.explode(offs))
        .select(
            (F.col("x") + F.col("_o.dx")).alias("rx"),
            (F.col("y") + F.col("_o.dy")).alias("ry"),
            F.col("_o.adj").alias("adj"),
            F.col("value").alias("nz"),
        )
        .groupBy(F.col("rx").alias("x"), F.col("ry").alias("y"))
        .agg(
            F.avg("nz").alias("_nb_mean"),
            F.max(F.when(F.col("adj") == 1, F.col("nz"))).alias("_adj_max"),
            F.min(F.when(F.col("adj") == 1, F.col("nz"))).alias("_adj_min"),
        )
    )
    j = base.join(nb, ["x", "y"], "left")
    tpi = F.round(F.col("value") - F.col("_nb_mean"), 6)
    max_drop = F.greatest(
        F.abs(F.col("value") - F.coalesce("_adj_max", F.col("value"))),
        F.abs(F.col("value") - F.coalesce("_adj_min", F.col("value"))),
    )
    scored = j.select(
        "x", "y", "value", tpi.alias("tpi"), max_drop.alias("max_drop"))
    sd = scored.agg(F.round(F.stddev_pop("tpi"), 6).alias("_sd"))
    out = scored.crossJoin(F.broadcast(sd))
    t = F.col("tpi") / F.col("_sd")
    cls = (
        F.when(F.col("tpi").isNull(), F.lit("isolated"))
        .when(F.col("_sd") == 0, F.lit("flat"))
        .when(t > 1.0, F.lit("ridge"))
        .when(t > 0.5, F.lit("upper_slope"))
        .when(t >= -0.5,
              F.when(F.col("max_drop") > F.lit(float(flat_eps)),
                     F.lit("mid_slope")).otherwise(F.lit("flat")))
        .when(t >= -1.0, F.lit("lower_slope"))
        .otherwise(F.lit("valley"))
    )
    return out.select(
        "x", "y", "value", "tpi", "max_drop", cls.alias("landform"))
