"""Bump-field generator (reference xrspatial/bump.py:12-96).

Centers are sampled on the driver (seeded, matching the reference's
``np.random.uniform``); the scatter-add of each bump's spread
neighborhood is a distributed join: bump centers explode to their
affected cells, then a groupBy(y, x) sum accumulates overlaps —
the Spark form of the reference's nested accumulation loop.

Reference quirk (bump.py:23-28): the spread contribution is
``out[y, x] * (d2 / s)`` — proportional to squared distance and read
from the PARTIALLY ACCUMULATED center, making the result depend on
bump iteration order.  Order-dependence cannot survive a distributed
sum, so this implementation uses the bump's own height ``z * d2/s``
— identical whenever centers don't collide, deterministic always.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bump(
    spark: SparkSession,
    width: int,
    height: int,
    count: int | None = None,
    height_func: Callable[[np.ndarray, np.ndarray], np.ndarray] | None = None,
    spread: int = 1,
    seed: int = 5,
) -> DataFrame:
    """Long-form bump field over a width x height grid."""
    if count is None:
        count = width // 3
    if height_func is None:
        height_func = lambda x, y: np.ones(len(x))  # noqa: E731

    rng = np.random.RandomState(seed)
    locs_x = rng.uniform(0, width, count).astype(int)
    locs_y = rng.uniform(0, height, count).astype(int)
    z = np.asarray(height_func(locs_x, locs_y), dtype=np.float64)

    s = spread * spread
    rows = {"y": list(locs_y), "x": list(locs_x), "v": list(z)}
    if s > 0:
        for cx, cy, cz in zip(locs_x, locs_y, z):
            for nx in range(max(cx - spread, 0), min(cx + spread, width)):
                for ny in range(max(cy - spread, 0), min(cy + spread, height)):
                    d2 = (nx - cx) ** 2 + (ny - cy) ** 2
                    if 0 < d2 <= s:
                        rows["y"].append(ny)
                        rows["x"].append(nx)
                        rows["v"].append(cz * (d2 / s))
    centers = spark.createDataFrame(
        pd.DataFrame(rows), schema="y int, x int, v double"
    )
    grid = spark.range(height * width).select(
        (F.col("id") / width).cast("int").alias("y"),
        (F.col("id") % width).cast("int").alias("x"),
    )
    return grid.join(
        centers.groupBy("y", "x").agg(F.sum("v").alias("value")), ["y", "x"], "left"
    ).na.fill({"value": 0.0})
