"""Classification family — global-statistic pre-pass + per-cell binning.

Reference semantics: xrspatial/classify.py.  Every classifier is a
two-phase plan:

  job 1: tiny aggregate over the finite values (min/max, percentiles,
         mean/std, distinct gaps, or a bounded sample for Jenks) ->
         a handful of bin edges on the driver (the reference does the
         same eager pre-pass, e.g. classify.py:843-866, 960-966);
  job 2: a pure `when`-ladder Column expression applying right-closed
         bins (val <= bins[0] -> class 0, bins[i-1] < val <= bins[i]
         -> class i, beyond last bin or non-finite -> NULL), matching
         `_cpu_bin` classify.py:152-187.

Job 2 is whole-stage-codegen'd JVM work — no Python anywhere in the
per-cell path, so classification throughput is scan-bound at any
scale.  Bin counts are tiny (k <= ~10) so the ladder stays well under
codegen limits.

NULL plays the reference's NaN; ±inf was mapped to NULL on ingest
(the reference filters non-finite identically, classify.py:164).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared binning expression (classify.py:152-204 semantics)
# ---------------------------------------------------------------------------


def bin_expr(value: Column, bins: Sequence[float], new_values: Sequence[float]) -> Column:
    if len(bins) != len(new_values):
        raise ValueError("bins and new_values must have equal length")
    expr = None
    for b, v in zip(bins, new_values):
        cond = value <= F.lit(float(b))
        expr = F.when(cond, F.lit(float(v))) if expr is None else expr.when(cond, F.lit(float(v)))
    # > last bin or NULL -> NULL (reference emits NaN, classify.py:183-185)
    return expr.otherwise(F.lit(None))


def reclassify(
    raster: DataFrame,
    bins: Sequence[float],
    new_values: Sequence[float],
    value_col: str = "value",
    out_col: str | None = None,
) -> DataFrame:
    """Map right-closed bins to new values (classify.py:274-393)."""
    return raster.withColumn(
        out_col or value_col, bin_expr(F.col(value_col), bins, new_values)
    )


def binary(
    raster: DataFrame,
    values: Iterable[float],
    value_col: str = "value",
    out_col: str | None = None,
) -> DataFrame:
    """1 if value in set, 0 if finite, NULL otherwise (classify.py:31-149)."""
    c = F.col(value_col)
    expr = (
        F.when(c.isin(list(values)), F.lit(1.0))
        .when(c.isNotNull(), F.lit(0.0))
        .otherwise(F.lit(None))
    )
    return raster.withColumn(out_col or value_col, expr)


# ---------------------------------------------------------------------------
# bin-edge pre-passes (each: one small aggregate -> driver scalars)
# ---------------------------------------------------------------------------


def _classify_with(raster, bins, value_col, out_col):
    return reclassify(raster, bins, list(range(len(bins))), value_col, out_col)


def fused_breaks(
    raster: DataFrame,
    specs: Sequence[tuple[str, str, dict]],
    value_col: str = "value",
) -> dict[str, list[float]]:
    """Bin edges for SEVERAL stat-driven classifiers from ONE
    aggregation job.

    ``specs`` is a list of (name, method, kwargs) with method one of
    quantile / equal_interval / std_mean / percentiles / box_plot.
    Every percentile fraction any spec needs rides one exact
    `F.percentile` array; min/max/mean/stddev ride alongside — so a
    dashboard running all five classifiers pays one tiny global pass
    instead of five (each separate pass is a full fixed-cost job:
    ~5x the pre-pass latency at bench scale for identical numbers).
    The per-method edge formulas are exactly the single-classifier
    ones (same exact percentile, same interpolation)."""
    fracs: list[float] = []
    slices: dict[str, tuple[int, int]] = {}
    for name, method, kw in specs:
        if method == "quantile":
            k = kw.get("k", 4)
            w = 100.0 / k
            ps = [min(w * i, 100.0) / 100.0 for i in range(1, k + 1)]
        elif method == "percentiles":
            ps = [p / 100.0 for p in kw.get("pct", (1, 10, 50, 90, 99))]
        elif method == "box_plot":
            ps = [0.25, 0.5, 0.75]
        elif method in ("equal_interval", "std_mean"):
            ps = []
        else:
            raise ValueError(f"unknown classify method {method!r}")
        slices[name] = (len(fracs), len(fracs) + len(ps))
        fracs.extend(ps)

    aggs = [
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("mx"),
        F.avg(value_col).alias("m"),
        F.stddev_pop(value_col).alias("s"),
    ]
    if fracs:
        aggs.insert(0, F.percentile(
            F.col(value_col), F.array([F.lit(p) for p in fracs])).alias("q"))
    row = raster.agg(*aggs).collect()[0]

    out: dict[str, list[float]] = {}
    for name, method, kw in specs:
        a, b = slices[name]
        q = [float(v) for v in row["q"][a:b]] if b > a else []
        if method == "quantile":
            out[name] = sorted(set(q))
        elif method == "equal_interval":
            lo, hi = float(row["lo"]), float(row["mx"])
            k = kw.get("k", 5)
            width = (hi - lo) / k
            cuts = np.arange(lo + width, hi + width, width)[:k]
            cuts[-1] = hi
            out[name] = cuts.tolist()
        elif method == "std_mean":
            m, s, mx = float(row["m"]), float(row["s"]), float(row["mx"])
            out[name] = sorted(set([m - 2 * s, m - s, m + s, m + 2 * s, mx]))
        elif method == "percentiles":
            out[name] = sorted(set(q + [float(row["mx"])]))
        else:  # box_plot
            q1, q2, q3 = q
            hinge = kw.get("hinge", 1.5)
            iqr = q3 - q1
            out[name] = sorted(set(
                [q1 - hinge * iqr, q1, q2, q3, q3 + hinge * iqr,
                 float(row["mx"])]))
    return out


def quantile(
    raster: DataFrame, k: int = 4, value_col: str = "value", out_col: str | None = None
) -> DataFrame:
    """k equal-count classes (classify.py:396-505). Uses Spark's exact
    `percentile` (same linear interpolation as numpy) — the reference
    itself warns that dask's approximate percentile deviates
    (classify.py:453-456); we take the exact path for golden parity."""
    bins = fused_breaks(raster, [("x", "quantile", {"k": k})], value_col)["x"]
    return _classify_with(raster, bins, value_col, out_col)


def equal_interval(
    raster: DataFrame, k: int = 5, value_col: str = "value", out_col: str | None = None
) -> DataFrame:
    """k equal-width bins from min/max (classify.py:837-940)."""
    bins = fused_breaks(
        raster, [("x", "equal_interval", {"k": k})], value_col)["x"]
    return _classify_with(raster, bins, value_col, out_col)


def std_mean(
    raster: DataFrame, value_col: str = "value", out_col: str | None = None
) -> DataFrame:
    """Bins at mean±1σ, ±2σ, max (classify.py:943-1010; σ = population
    std, numpy nanstd)."""
    bins = fused_breaks(raster, [("x", "std_mean", {})], value_col)["x"]
    return _classify_with(raster, bins, value_col, out_col)


def percentiles(
    raster: DataFrame,
    pct: Sequence[float] = (1, 10, 50, 90, 99),
    value_col: str = "value",
    out_col: str | None = None,
) -> DataFrame:
    """Classes from percentile breakpoints + max (classify.py:1110-1188)."""
    bins = fused_breaks(
        raster, [("x", "percentiles", {"pct": pct})], value_col)["x"]
    return _classify_with(raster, bins, value_col, out_col)


def box_plot(
    raster: DataFrame,
    hinge: float = 1.5,
    value_col: str = "value",
    out_col: str | None = None,
) -> DataFrame:
    """Bins at Q1-h*IQR, Q1, Q2, Q3, Q3+h*IQR, max (classify.py:1286-1386)."""
    bins = fused_breaks(
        raster, [("x", "box_plot", {"hinge": hinge})], value_col)["x"]
    return _classify_with(raster, bins, value_col, out_col)


def head_tail_breaks(
    raster: DataFrame, value_col: str = "value", out_col: str | None = None
) -> DataFrame:
    """Iterative mean-split of the heavy tail until head > 40%
    (classify.py:1013-1107) — a driver loop of shrinking aggregates,
    mirroring the reference's dask loop (:1044-1063)."""
    bins: list[float] = []
    df = raster.filter(F.col(value_col).isNotNull())
    total_row = df.agg(
        F.avg(value_col).alias("m"), F.max(value_col).alias("mx"), F.count(value_col).alias("n")
    ).collect()[0]
    mx, n = float(total_row["mx"]), int(total_row["n"])
    mean_v = float(total_row["m"])
    while n > 1:
        bins.append(mean_v)
        head = df.filter(F.col(value_col) > mean_v)
        r = head.agg(F.avg(value_col).alias("m"), F.count(value_col).alias("n")).collect()[0]
        hn = int(r["n"])
        if hn == 0 or hn / n > 0.40:
            break
        df, n, mean_v = head, hn, float(r["m"])
    if not bins:
        bins = [mean_v]
    bins.append(mx)
    bins = sorted(set(bins))
    return _classify_with(raster, bins, value_col, out_col)


def maximum_breaks(
    raster: DataFrame, k: int = 5, value_col: str = "value", out_col: str | None = None
) -> DataFrame:
    """Midpoints of the k-1 largest gaps between sorted distinct values
    (classify.py:1191-1283).  distinct() shrinks the data before the
    driver sees it; gap-finding over the distinct set is a lead() diff,
    computed here in numpy after collecting the (small) distinct set."""
    uv = np.sort(
        np.array(
            [
                r[0]
                for r in raster.select(value_col).filter(
                    F.col(value_col).isNotNull()
                ).distinct().collect()
            ],
            dtype=np.float64,
        )
    )
    if len(uv) < k:
        bins = uv
    else:
        diffs = np.diff(uv)
        n_gaps = min(k - 1, len(diffs))
        top = np.sort(np.argsort(diffs, kind="stable")[-n_gaps:])
        bins = np.append((uv[top] + uv[top + 1]) / 2.0, float(uv[-1]))
    return _classify_with(raster, bins.tolist(), value_col, out_col)


# ---------------------------------------------------------------------------
# natural breaks (Jenks) — bounded sample -> driver DP -> binning expr
# ---------------------------------------------------------------------------


def _jenks_bins(sample: np.ndarray, k: int) -> np.ndarray:
    """Fisher-Jenks optimal 1-D classification (own implementation of
    the classic O(n^2 k) dynamic program, numpy-vectorized over the
    lower-limit axis).  Semantics match reference classify.py:508-564:
    right-closed classes minimizing within-class variance; ties broken
    toward the smallest lower class limit."""
    data = np.sort(sample.astype(np.float64))
    n = len(data)
    s = np.concatenate([[0.0], np.cumsum(data)])
    q = np.concatenate([[0.0], np.cumsum(data * data)])

    def seg_var(i: np.ndarray, l: int) -> np.ndarray:
        # variance*w of segment data[i-1 .. l-1] (1-based i..l)
        w = l - i + 1
        ss = s[l] - s[i - 1]
        qq = q[l] - q[i - 1]
        return qq - ss * ss / w

    INF = np.inf
    varc = np.full((n + 1, k + 1), INF)
    lower = np.zeros((n + 1, k + 1), dtype=np.int64)
    varc[0, 0] = 0.0
    i_all = np.arange(1, n + 1)
    for l in range(1, n + 1):
        iv = i_all[:l]
        sv = seg_var(iv, l)
        varc[l, 1] = sv[0]  # single class: whole prefix
        lower[l, 1] = 1
        for j in range(2, min(k, l) + 1):
            cand = sv + varc[iv - 1, j - 1]
            best = int(np.argmin(cand))  # first min -> smallest lower limit
            varc[l, j] = cand[best]
            lower[l, j] = iv[best]
    # back-trace class upper edges
    bins = np.empty(k, dtype=np.float64)
    bins[-1] = data[-1]
    l = n
    for j in range(k, 1, -1):
        i = lower[l, j]
        bins[j - 2] = data[i - 2]
        l = i - 1
    return bins


def natural_breaks(
    raster: DataFrame,
    num_sample: int | None = 20000,
    k: int = 5,
    value_col: str = "value",
    out_col: str | None = None,
) -> DataFrame:
    """Jenks natural breaks (classify.py:508-834): fit on a bounded
    sample, classify everything with the resulting bins.

    Sampling: when the finite data exceeds ``num_sample`` we take a
    deterministic hash-ordered sample (orderBy xxhash64 + limit) —
    same spirit as the reference's seeded RandomState(1234567890)
    shuffle (classify.py:602), but reproducible under any partitioning;
    exact bit-parity with numpy's shuffle is impossible distributed, so
    below the threshold (tests, goldens) no sampling happens and bins
    match exactly."""
    vals = raster.select(value_col).filter(F.col(value_col).isNotNull())
    n = vals.count()
    if num_sample is not None and num_sample < n:
        sample_df = (
            vals.orderBy(F.xxhash64(value_col, F.monotonically_increasing_id()))
            .limit(num_sample)
        )
    else:
        sample_df = vals
    sample = np.array([r[0] for r in sample_df.collect()], dtype=np.float64)
    max_data = float(vals.agg(F.max(value_col)).collect()[0][0])
    uv = np.unique(sample)
    if len(uv) < k:
        bins = uv
    else:
        bins = _jenks_bins(sample, k)
        bins[-1] = max_data
    return _classify_with(raster, bins.tolist(), value_col, out_col)
