"""Column profiling — the data-quality summary a lake table ships with
(the deequ / whylogs role): per-column counts, null rates, moments,
quantiles, and distinct counts, computed in a FIXED number of jobs no
matter how many columns are profiled.

Job shape (3 jobs total, column-count-independent):

1. moments — every column's (count, nulls, min, max, sum, sum of
   squares) stacked into ONE aggregate row (pure Catalyst; a wide
   table costs one pass);
2. NDV — every column's HyperLogLog registers stacked as
   (column, register, rho) triples into one two-level aggregate
   (sketch.py's pure-Catalyst extraction; exchange bounded by
   columns x 2^p);
3. quantiles — values stack as (column, value) pairs and run through
   the grouped KLL (sketch.kll_group_quantiles keyed on the column
   TAG), so the exchange carries columns x ~3k compactor floats,
   never values.

The exact half (count/nulls/min/max/mean/std) is SQL-replicable and
rides a DuckDB oracle; the sketched half (quantiles, ndv) carries the
sketches' pinned error bands.

Reference: no reference analog — training-data-pipeline extension
(SURVEY.md §2 addenda), composing the sketch tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "profile_exact", "profile_correlations"]


def profile_exact(df: DataFrame, columns: list[str]) -> DataFrame:
    """The exact half of the profile as a DataFrame — one row per
    column: (column, n_rows, n_nulls, min, max, mean, std), from ONE
    stacked aggregate over one scan (std is the population form
    sqrt(E[x^2] - E[x]^2), clamped at 0 against rounding).  All
    metrics are plain SQL — this is the oracle-checked surface."""
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"profile columns not in frame: {missing}")
    aggs = []
    for c in columns:
        v = F.col(c).cast("double")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.isnull(v).cast("long")).alias(f"{c}__nulls"),
            F.min(v).alias(f"{c}__min"),
            F.max(v).alias(f"{c}__max"),
            F.sum(v).alias(f"{c}__sum"),
            F.sum(v * v).alias(f"{c}__sum2"),
        ]
    row = df.agg(*aggs)
    parts = None
    for c in columns:
        n = F.col(f"{c}__rows") - F.col(f"{c}__nulls")
        mean = F.col(f"{c}__sum") / n
        var = F.col(f"{c}__sum2") / n - mean * mean
        one = row.select(
            F.lit(c).alias("column"),
            F.col(f"{c}__rows").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__min").alias("min"),
            F.col(f"{c}__max").alias("max"),
            mean.alias("mean"),
            F.sqrt(F.greatest(var, F.lit(0.0))).alias("std"),
        )
        parts = one if parts is None else parts.unionByName(one)
    return parts


def profile_columns(
    df: DataFrame,
    columns: list[str],
    qs: tuple = (0.25, 0.5, 0.75, 0.99),
    hll_p: int = 14,
    kll_k: int = 256,
) -> dict:
    """Full profile -> {column: {metric: value}} with exact moments
    plus KLL quantiles (``q25``-style keys) and HLL distinct counts.
    Three jobs regardless of len(columns); driver memory is
    columns x (6 scalars + sketch summaries)."""
    from xarray_spatial_spark.functions.sketch import (
        _hll_idx_rho, _check_hll_p, kll_group_quantiles)

    _check_hll_p(hll_p)
    exact = {r["column"]: dict(
        n_rows=r["n_rows"], n_nulls=r["n_nulls"], min=r["min"],
        max=r["max"], mean=r["mean"], std=r["std"],
    ) for r in profile_exact(df, columns).collect()}

    # job 2: stacked NDV registers (the collect_table_stats shape)
    stacked = None
    for c in columns:
        idx, rho = _hll_idx_rho(F.xxhash64(F.col(c)), hll_p)
        part = df.filter(F.col(c).isNotNull()).select(
            F.lit(c).alias("_col"), idx.alias("_i"), rho.alias("_r"))
        stacked = part if stacked is None else stacked.unionByName(part)
    m = 1 << hll_p
    from xarray_spatial_spark.functions.sketch import _hll_alpha

    g = (stacked.groupBy("_col", "_i").agg(F.max("_r").alias("_r"))
         .groupBy("_col").agg(
             F.sum(F.pow(F.lit(2.0), -F.col("_r"))).alias("_s"),
             F.count(F.lit(1)).alias("_occ")))
    raw = F.lit(_hll_alpha(m) * m * m) / (
        F.col("_s") + (F.lit(m) - F.col("_occ")).cast("double"))
    vz = (F.lit(m) - F.col("_occ")).cast("double")
    est = F.when((raw <= F.lit(2.5 * m)) & (vz > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / vz)).otherwise(raw)
    for r in g.select("_col", est.alias("_ndv")).collect():
        exact[r["_col"]]["ndv"] = r["_ndv"]

    # job 3: stacked values -> grouped KLL quantiles keyed on the tag
    vals = None
    for c in columns:
        part = df.select(F.lit(c).alias("_col"),
                         F.col(c).cast("double").alias("_v"))
        vals = part if vals is None else vals.unionByName(part)
    qrows = kll_group_quantiles(vals, "_col", "_v", list(qs), k=kll_k)
    for r in qrows.collect():
        exact[r["_col"]][f"q{int(round(r['q'] * 100))}"] = r["value"]
    return exact


def profile_correlations(df: DataFrame, columns: list[str]) -> DataFrame:
    """Exact Pearson correlation for every column pair, ONE stacked
    aggregate over one scan (d*(d+1)/2 + 2d running sums — the same
    sufficient-statistics trick as similarity.pca_train, kept
    driver-free).  Rows with a NULL in EITHER column of a pair are
    excluded from that pair (pairwise deletion).  Returns
    (col_a, col_b, n, corr) for a < b; a zero-variance side yields
    NULL corr."""
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"profile columns not in frame: {missing}")
    pairs = [(a, b) for i, a in enumerate(columns)
             for b in columns[i + 1:]]
    aggs = []
    for a, b in pairs:
        x = F.col(a).cast("double")
        y = F.col(b).cast("double")
        both = x.isNotNull() & y.isNotNull()
        xm = F.when(both, x)
        ym = F.when(both, y)
        tag = f"{a}__{b}"
        aggs += [
            F.count(xm).alias(f"{tag}__n"),
            F.sum(xm).alias(f"{tag}__sx"),
            F.sum(ym).alias(f"{tag}__sy"),
            F.sum(xm * xm).alias(f"{tag}__sxx"),
            F.sum(ym * ym).alias(f"{tag}__syy"),
            F.sum(xm * ym).alias(f"{tag}__sxy"),
        ]
    row = df.agg(*aggs)
    parts = None
    for a, b in pairs:
        t = f"{a}__{b}"
        n = F.col(f"{t}__n").cast("double")
        cov = F.col(f"{t}__sxy") / n - (F.col(f"{t}__sx") / n) * (F.col(f"{t}__sy") / n)
        vx = F.col(f"{t}__sxx") / n - (F.col(f"{t}__sx") / n) * (F.col(f"{t}__sx") / n)
        vy = F.col(f"{t}__syy") / n - (F.col(f"{t}__sy") / n) * (F.col(f"{t}__sy") / n)
        corr = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
        one = row.select(
            F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
            F.col(f"{t}__n").alias("n"), corr.alias("corr"))
        parts = one if parts is None else parts.unionByName(one)
    return parts
