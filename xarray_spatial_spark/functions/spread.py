"""Scan-parallelism guard for CPU-heavy narrow passes.

A parquet file is splittable only at row-group boundaries; a
single-row-group file scans as ONE task no matter how many cores the
session has, and every narrow operation downstream of that scan (a
pandas-UDF signature pass, a regex-heavy projection) inherits the
single partition.  For CPU-bound per-row work that is a 1/N-cores
slowdown bought to avoid a shuffle of a few MB of projected columns.

``spread`` repartitions a DataFrame up to the session's default
parallelism ONLY when its current partitioning is below it — at real
scale (many files / row groups) the scan already yields >= cores
partitions and this is a no-op, so the helper is scale-adaptive
rather than a local-mode constant (guide: make partitioning derive
from input, not a tuned constant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_rows_per_slice: int = 1) -> DataFrame:
    """Round-robin repartition ``df`` to the session default
    parallelism when it currently has fewer partitions.  Use directly
    upstream of CPU-heavy per-row work (pandas UDF passes, regex
    projections); the exchange carries only the projected columns."""
    sc = df.sparkSession.sparkContext
    want = sc.defaultParallelism
    if want > 1 and df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
