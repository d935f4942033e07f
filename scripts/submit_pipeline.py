"""spark-submit entry point for the headline pipeline (north rule:
"run via spark-submit --py-files on a multi-executor cluster").

Usage:
    python scripts/make_pyfiles_zip.py /tmp/xss_pyfiles.zip
    spark-submit --master local[8] --py-files /tmp/xss_pyfiles.zip \
        scripts/submit_pipeline.py --docs 1000000 [--sf-dir DIR]

On a real cluster, swap --master for the cluster manager; the package
arrives on executors through --py-files exactly as it does here.
Prints one JSON line with rows/sec and the per-tile row count.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    args = ap.parse_args()

    # spark-submit provides the session; --py-files provides the package
    spark = SparkSession.builder.appName("xss-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from xarray_spatial_spark.operators.pip import pip_join_expr
    from xarray_spatial_spark.operators.proximity import nearest_expr
    from xarray_spatial_spark.operators.tiling import assign_cells
    from xarray_spatial_spark.sources.documents import documents

    import numpy as np

    rng = np.random.default_rng(99)
    polys = {}
    for i, (cx, cy) in enumerate(
        [(-100, 45), (-60, -15), (15, 50), (80, 25), (135, -25)], start=1
    ):
        w, h = float(rng.uniform(8, 25)), float(rng.uniform(6, 18))
        polys[i] = np.array(
            [[cx - w, cy - h], [cx + w, cy - h], [cx + w, cy + h], [cx - w, cy + h]]
        ) + 0.00005
    cities = [
        (float(rng.uniform(-180, 180)), float(rng.uniform(-60, 70)), float(i))
        for i in range(16)
    ]

    t0 = time.time()
    docs = documents(spark, args.docs, skew=True).select(
        "doc_id", "lon", "lat", F.length("text").alias("n_chars")
    )
    tiled = assign_cells(docs, zoom=12, tile_zoom=5)
    zoned = pip_join_expr(tiled, polys)
    alloc = nearest_expr(zoned, cities, metric="GREAT_CIRCLE")
    rows = (
        alloc.groupBy("tile_id")
        .agg(F.count(F.lit(1)).alias("n"), F.count("zone").alias("in_zones"))
        .count()
    )
    sec = time.time() - t0
    print(
        json.dumps(
            {"docs": args.docs, "tiles": rows, "sec": round(sec, 2),
             "docs_per_sec": round(args.docs / sec, 1)}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
