"""Host CPU-delivery probe backing BENCH/BASELINE.md's audit.

Runs the headline 1B-row pipeline at local[32] and reports, per timed
rep, wall seconds plus the driver JVM's accumulated cpu-seconds from
/proc (utime+stime of the java child) — effective cores = cpu/wall.
A host that overcommits its physical cores shows effective cores well
under the vCPU count while per-rep cpu-WORK also inflates (shared
cache/bandwidth contention); both signatures appeared in round 4
(25-27/32 cores, +35-40% cpu-work vs local[8]) and motivated the
4 -> 16 gate pair.

Usage: python scripts/cpu_delivery_probe.py [--cpus 32] [--reps 4]
       (expects the bench_scaling slim table cached in BENCH_CACHE)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import _cities40, _world_polygons, jvm_cpu_seconds  # noqa: E402
from xarray_spatial_spark import get_spark  # noqa: E402
from xarray_spatial_spark.operators.pip import pip_join_expr  # noqa: E402
from xarray_spatial_spark.operators.proximity import nearest_expr  # noqa: E402
from xarray_spatial_spark.operators.tiling import assign_cells  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--docs", type=int, default=1_000_000_000)
    args = ap.parse_args()
    path = os.path.join(os.environ.get("BENCH_CACHE", "/tmp/xss_bench_cache"),
                        f"docs_slim_{args.docs}")
    spark = get_spark("cpu-probe", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    geo = spark.read.parquet(path)
    tiled = assign_cells(geo, zoom=12, tile_zoom=5)
    zoned = pip_join_expr(tiled, _world_polygons())
    alloc = nearest_expr(zoned, _cities40(), metric="GREAT_CIRCLE")
    df = alloc.groupBy("tile_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars"),
        F.count("zone").alias("n_in_zones"),
        F.approx_count_distinct("cell_id").alias("n_cells"),
        F.avg("nearest_dist").alias("avg_city_dist"),
        F.count_distinct("nearest_payload").alias("n_cities"))
    df.count()  # warm
    for rep in range(args.reps):
        c0, t0 = jvm_cpu_seconds(), time.time()
        df.count()
        wall = time.time() - t0
        cpu = jvm_cpu_seconds() - c0
        print(f"rep {rep}: wall={wall:.2f}s jvm_cpu={cpu:.1f}s "
              f"eff_cores={cpu / wall:.1f}/{args.cpus}")
    spark.stop()


if __name__ == "__main__":
    main()
