"""Raster resampling — the reference's `canvas_like` (utils.py:374-442,
datashader Canvas.raster re-gridding) as cell-id re-resolution.

- ``downsample``: children -> parent aggregation (groupBy on the
  coarser pixel, mean/max/min/sum/first) — one partial-agg shuffle.
- ``upsample``: parent -> children replication (explode factor^2 rows
  per cell, nearest-neighbor assignment).

Factor-of-k re-gridding covers the engine's tiling needs (zoom-level
moves are always power-of-two); arbitrary-extent regridding composes
from crop + resample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGGS = {
    "mean": F.avg,
    "max": F.max,
    "min": F.min,
    "sum": F.sum,
    "first": F.first,
}


def downsample(
    raster: DataFrame,
    factor: int,
    agg: str = "mean",
    value_col: str = "value",
) -> DataFrame:
    """Aggregate factor x factor blocks into one output cell."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    return (
        raster.groupBy(
            F.floor(F.col("y") / factor).cast("int").alias("y"),
            F.floor(F.col("x") / factor).cast("int").alias("x"),
        )
        .agg(_AGGS[agg](value_col).alias(value_col))
    )


def upsample(
    raster: DataFrame,
    factor: int,
    value_col: str = "value",
) -> DataFrame:
    """Nearest-neighbor: replicate each cell into factor x factor."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    offs = F.sequence(F.lit(0), F.lit(factor - 1))
    return (
        raster.withColumn("_dy", F.explode(offs))
        .withColumn("_dx", F.explode(offs))
        .select(
            (F.col("y") * factor + F.col("_dy")).cast("int").alias("y"),
            (F.col("x") * factor + F.col("_dx")).cast("int").alias("x"),
            value_col,
        )
    )
