"""Distributed global ranking — no single-partition windows.

``Window.orderBy(col)`` with no partitionBy moves EVERY row to one
task (Spark's own WindowExec warning); fine for hundreds of rows,
fatal for the millions of distinct regions/combos a 100-TB raster
can produce.  ``global_row_number`` is the standard two-phase plan:

1. range-repartition on the order column (partition i holds ranks
   strictly below partition i+1),
2. per-partition row_number (parallel),
3. a per-partition count collect (one tiny job, <= #partitions rows)
   turned into broadcast offsets.

Total: two small shuffles of the ranked set + an O(#partitions)
driver collect, instead of one O(N) single-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = INCLUSIVE prefix sum of ``value_col`` in
    ``order_col`` order — the distributed scan primitive (sequence
    packing, offset assignment, quota cuts).  Same two-phase plan as
    :func:`global_row_number`: range partition, per-partition window
    cumsum (parallel), per-partition totals collected (<= #partitions
    rows) into broadcast offsets.  Pass a unique ``order_col`` for a
    deterministic total order."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(n, order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("_pid").orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # local feeds TWO consumers (totals collect + final join): persist
    # so both see ONE materialized range partitioning — re-executed
    # range sampling may draw different boundaries, silently skewing
    # the offsets
    local = parts.withColumn("_cs", F.sum(value_col).over(w)).persist()
    totals = local.groupBy("_pid").agg(F.sum(value_col).alias("_tot")).collect()
    offsets, acc = [], 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((int(row["_pid"]), acc))
        acc += int(row["_tot"])
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    off_df = spark.createDataFrame(offsets, schema="_pid int, _off long")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.col("_cs") + F.col("_off"))
        .drop("_pid", "_cs", "_off")
    )


def global_row_number(
    df: DataFrame,
    order_col: str,
    out_col: str,
    zero_based: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = global row number of ``df`` ordered by
    ``order_col`` (ties broken arbitrarily but deterministically by
    range partitioning; pass a unique order column for a total
    order).  Runs fully parallel — see module docstring."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(n, order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    local = parts.withColumn(
        "_rn", F.row_number().over(Window.partitionBy("_pid").orderBy(order_col))
    ).persist()  # two consumers; boundaries must match (see global_cumsum)
    counts = local.groupBy("_pid").agg(F.max("_rn").alias("_cnt")).collect()
    base = 1 if not zero_based else 0
    offsets, acc = [], base - 1
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((int(row["_pid"]), acc))
        acc += int(row["_cnt"])
    if not offsets:  # empty input
        return df.withColumn(out_col, F.lit(None).cast("long"))
    off_df = spark.createDataFrame(offsets, schema="_pid int, _off long")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.col("_rn") + F.col("_off"))
        .drop("_pid", "_rn", "_off")
    )
