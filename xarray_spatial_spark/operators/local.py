"""Local / cell-stats family — multi-variable per-cell ops, Catalyst-native.

Reference semantics: xrspatial/local.py.  The reference iterates
python tuples per cell (its slowest module); here each op is a single
array expression over the band columns — whole-stage codegen, no
Python, no shuffle (except `combine`, which needs one tiny distinct).

NaN rule: the reference's per-cell loops emit NaN when ANY variable in
the combination is NaN (local.py:133-136, 231-234, ...).  With NULL as
nodata we guard explicitly, because unlike NaN arithmetic, array_max
et al. would skip NULLs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _arr(cols: Sequence[str]) -> Column:
    return F.array(*[F.col(c) for c in cols])


def _any_null(cols: Sequence[str]) -> Column:
    cond = F.col(cols[0]).isNull()
    for c in cols[1:]:
        cond = cond | F.col(c).isNull()
    return cond


def _guarded(cols: Sequence[str], expr: Column) -> Column:
    return F.when(_any_null(cols), F.lit(None)).otherwise(expr)


def cell_stats_expr(cols: Sequence[str], func: str = "sum") -> Column:
    """max/mean/median/min/std/sum across variables per cell
    (local.py:6-13, 16-79; plain np.max etc — NaN poisons)."""
    arr = _arr(cols)
    n = len(cols)
    if func == "max":
        e = F.array_max(arr)
    elif func == "min":
        e = F.array_min(arr)
    elif func == "sum":
        e = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)
    elif func == "mean":
        e = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x) / F.lit(float(n))
    elif func == "median":
        s = F.array_sort(arr)
        if n % 2 == 1:
            e = F.element_at(s, (n + 1) // 2)
        else:
            e = (F.element_at(s, n // 2) + F.element_at(s, n // 2 + 1)) / 2.0
    elif func == "std":
        mean = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x) / F.lit(float(n))
        msq = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x) / F.lit(float(n))
        e = F.sqrt(msq - mean * mean)
    else:
        raise ValueError(f"unsupported func {func!r}")
    return _guarded(cols, e)


def cell_stats(df: DataFrame, cols: Sequence[str], func: str = "sum",
               out_col: str = "cell_stats") -> DataFrame:
    return df.withColumn(out_col, cell_stats_expr(cols, func))


def combine(df: DataFrame, cols: Sequence[str], out_col: str = "combine",
            order_col: str | None = None) -> DataFrame:
    """Unique id per distinct cross-variable combination (local.py:82-164).

    The reference numbers combinations by first appearance in row-major
    scan order; we reproduce that exactly by ranking distinct combos on
    their minimum position (``order_col``, default ``y * 2^32 + x``).
    The distinct set is small by construction (it's a categorical
    product), so the rank window over it is cheap and the join back is
    a broadcast."""
    order = (
        F.col(order_col)
        if order_col
        else F.col("y").cast("long") * F.lit(1 << 32) + F.col("x").cast("long")
    )
    from xarray_spatial_spark.plans.ranks import global_row_number

    valid = df.filter(~_any_null(cols))
    combos = valid.groupBy(*cols).agg(F.min(order).alias("_first_pos"))
    # two-phase distributed rank: no single-partition window even with
    # millions of distinct combos
    ranked = (
        global_row_number(combos, "_first_pos", out_col)
        .withColumn(out_col, F.col(out_col).cast("double"))
        .drop("_first_pos")
    )
    return df.join(F.broadcast(ranked), list(cols), "left")


def _freq(df, ref_col, cols, cmp, out_col):
    arr = _arr(cols)
    ref = F.col(ref_col)
    count = F.aggregate(
        arr, F.lit(0.0), lambda a, x: a + cmp(ref, x).cast("double")
    )
    guard = _any_null(list(cols) + [ref_col])
    return df.withColumn(out_col, F.when(guard, F.lit(None)).otherwise(count))


def lesser_frequency(df, ref_col, cols, out_col="lesser_frequency"):
    """Count of variables the reference value EXCEEDS (local.py:167-247:
    ``if ref > item: count += 1``)."""
    return _freq(df, ref_col, cols, lambda r, x: r > x, out_col)


def equal_frequency(df, ref_col, cols, out_col="equal_frequency"):
    return _freq(df, ref_col, cols, lambda r, x: r == x, out_col)


def greater_frequency(df, ref_col, cols, out_col="greater_frequency"):
    return _freq(df, ref_col, cols, lambda r, x: r < x, out_col)


def lowest_position(df, cols, out_col="lowest_position"):
    """1-based index of the min variable, first on ties (local.py:416-478)."""
    arr = _arr(cols)
    e = F.array_position(arr, F.array_min(arr)).cast("double")
    return df.withColumn(out_col, _guarded(cols, e))


def highest_position(df, cols, out_col="highest_position"):
    arr = _arr(cols)
    e = F.array_position(arr, F.array_max(arr)).cast("double")
    return df.withColumn(out_col, _guarded(cols, e))


def popularity(df, ref_col, cols, out_col="popularity"):
    """n-th smallest DISTINCT value across variables, NULL when all
    values are distinct — faithful to the reference implementation
    (local.py:546-633: ``sorted(Counter(comb).keys())`` indexing),
    including its quirks (all-distinct -> NaN; single unique -> that
    value regardless of ref)."""
    arr = _arr(cols)
    distinct = F.array_sort(F.array_distinct(arr))
    nd = F.size(distinct)
    ref_i = F.col(ref_col).cast("int")
    e = (
        F.when(nd >= len(cols), F.lit(None))
        .when(nd == 1, F.element_at(distinct, 1))
        .when(ref_i > nd, F.lit(None))
        .when(ref_i < 1, F.lit(None))
        .otherwise(F.element_at(distinct, ref_i))
    )
    return df.withColumn(
        out_col, F.when(_any_null(list(cols) + [ref_col]), F.lit(None)).otherwise(e)
    )


def rank(df, ref_col, cols, out_col="rank"):
    """ref-th smallest value across variables (local.py:636-716)."""
    arr = _arr(cols)
    s = F.array_sort(arr)
    ref_i = F.col(ref_col).cast("int")
    e = (
        F.when((ref_i > len(cols)) | (ref_i < 1), F.lit(None))
        .otherwise(F.element_at(s, ref_i))
    )
    return df.withColumn(
        out_col, F.when(_any_null(list(cols) + [ref_col]), F.lit(None)).otherwise(e)
    )
