"""Checkpointed stage manifests — per-partition lineage + resumability
(north rule: "resumable from checkpoint with per-partition lineage +
metrics").

Every pipeline stage writes its output parquet *partitioned by
tile_id* (or any key column) alongside a ``_manifest.json`` recording:

- the stage's input fingerprint (hash of upstream manifest + params),
- per-partition lineage rows (tile_id, row_count, content hash),
- wall-clock + row metrics.

``run_stage`` skips recomputation when a manifest exists whose
fingerprint matches — the idempotent-resume contract.  Content hashes
are order-insensitive (bit_xor of per-row xxhash64 — commutative,
overflow-free under ANSI arithmetic), so they are stable under any
partitioning/parallelism.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_manifest.json"


def content_hash_by(df: DataFrame, key: str) -> DataFrame:
    """(key, row_count, content_hash) per partition key — an
    order-insensitive fingerprint of every row's full contents."""
    row_hash = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("row_count"),
        F.bit_xor(row_hash).alias("content_hash"),
    )


def fingerprint(params: dict, upstream: list[str] | None = None) -> str:
    blob = json.dumps({"params": params, "upstream": upstream or []}, sort_keys=True)
    import hashlib

    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def manifest_path(stage_dir: str | Path) -> Path:
    return Path(stage_dir) / MANIFEST_NAME


def is_satisfied(stage_dir: str | Path, fp: str) -> bool:
    p = manifest_path(stage_dir)
    if not p.exists():
        return False
    try:
        m = json.loads(p.read_text())
    except json.JSONDecodeError:
        return False
    return m.get("fingerprint") == fp and m.get("status") == "complete"


def run_stage(
    spark: SparkSession,
    stage_dir: str | Path,
    build: "callable[[], DataFrame]",
    key: str,
    params: dict | None = None,
    upstream: list[str] | None = None,
) -> DataFrame:
    """Execute (or resume) one pipeline stage.

    If the stage's manifest matches the fingerprint, read the existing
    parquet and skip the compute.  Otherwise run ``build()``, write
    parquet partitioned by ``key``, then atomically write the manifest
    (write-then-rename, so a crash mid-stage is never 'complete' and
    reruns recompute)."""
    stage_dir = Path(stage_dir)
    fp = fingerprint(params or {}, upstream)
    data_dir = stage_dir / "data"
    if is_satisfied(stage_dir, fp):
        return spark.read.parquet(str(data_dir))

    t0 = time.time()
    df = build()
    df.write.mode("overwrite").partitionBy(key).parquet(str(data_dir))
    out = spark.read.parquet(str(data_dir))
    lineage = [r.asDict() for r in content_hash_by(out, key).collect()]
    manifest = {
        "fingerprint": fp,
        "status": "complete",
        "key": key,
        "params": params or {},
        "upstream": upstream or [],
        "metrics": {
            "wall_seconds": round(time.time() - t0, 3),
            "partitions": len(lineage),
            "rows": int(sum(r["row_count"] for r in lineage)),
        },
        "lineage": lineage,
    }
    tmp = manifest_path(stage_dir).with_suffix(".tmp")
    stage_dir.mkdir(parents=True, exist_ok=True)
    tmp.write_text(json.dumps(manifest, indent=1, default=int))
    tmp.replace(manifest_path(stage_dir))
    return out


def verify_lineage(spark: SparkSession, stage_dir: str | Path) -> bool:
    """Recompute per-partition content hashes of the stored output and
    compare with the manifest — corruption / partial-write detector."""
    stage_dir = Path(stage_dir)
    m = json.loads(manifest_path(stage_dir).read_text())
    df = spark.read.parquet(str(stage_dir / "data"))
    got = {
        r[m["key"]]: (r["row_count"], r["content_hash"])
        for r in content_hash_by(df, m["key"]).collect()
    }
    want = {
        r[m["key"]]: (r["row_count"], r["content_hash"]) for r in m["lineage"]
    }
    return got == want
