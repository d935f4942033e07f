"""Per-slot isolation bench (guide §1.4) — NOT the driver contract.

Times individual entry.queries() slots with the noop sink, labels jobs,
and can dump .explain("formatted") plans to plans/r06/.

Usage:
    python bench_extra.py slot [slot ...]            # time slots
    python bench_extra.py --plan before slot [...]   # also write plans/r06/<slot>_before.txt
    python bench_extra.py --all                      # every bench slot

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
     SPARK_GRAFT_CPUS (default 32), BENCH_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry
from xarray_spatial_spark import get_spark


def main() -> None:
    args = sys.argv[1:]
    plan_tag = None
    if args and args[0] == "--plan":
        plan_tag = args[1]
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    qs = entry.queries()
    if args == ["--all"]:
        import bench
        names = list(bench.BENCH_QUERIES)
    else:
        names = args
    for n in names:
        if n not in qs:
            raise SystemExit(f"unknown slot: {n}")

    spark = get_spark("bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    # page-cache warm, mirroring bench.py
    for t in ("documents", "events", "embeddings", "lineitem"):
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode(
                "overwrite").format("noop").save()
        except Exception:
            pass

    out: dict[str, float] = {}
    for _ in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"slot:{name}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            out[name] = round(min(out.get(name, float("inf")), dt), 3)
            spark.sparkContext.setJobDescription(None)

    if plan_tag:
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(f"plans/r06/{name}_{plan_tag}.txt", "w") as f:
                f.write(p)

    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "queries": out,
                      "total": round(sum(out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
