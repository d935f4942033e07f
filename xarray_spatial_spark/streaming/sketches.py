"""Streaming maintenance of the durable sketch artifacts.

The batch tier builds Bloom filters (URL-seen) and Count-Min sketches
(host/token frequency) as lake artifacts (dedup.py:bloom_save,
sketch.py:cms_save).  A continuous ingest wants the same artifacts to
stay current WITHOUT replaying history: both sketches are mergeable
(Bloom: bit-or; CM: elementwise sum — exactly the sketch of the
concatenated streams), so each micro-batch builds its delta sketch and
folds it in, and the updated artifact is rewritten atomically.

``foreachBatch`` is the right surface: the per-batch DataFrame runs
the SAME distributed bounded-collect build as the batch path (exchange
bounded by occupied cells/words, never rows), the fold is a driver-side
numpy op on KB..GB-scale arrays, and the save inherits the batch-id
idempotence contract — a replayed micro-batch re-merges identical
deltas, which is a no-op for Bloom (bit-or idempotent) and is skipped
for CM via the recorded last batch id (sums are NOT idempotent).
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame

from xarray_spatial_spark.functions import sketch as sk
from xarray_spatial_spark.functions.dedup import (
    bloom_build, bloom_load, bloom_merge, bloom_save,
)

__all__ = ["bloom_sink", "cms_sink", "hll_sink", "kll_sink", "kmv_sink"]


def _last_batch(path: str) -> int:
    meta = path + ".batch"
    if os.path.exists(meta):
        with open(meta) as fh:
            return json.load(fh)["batch_id"]
    return -1


def _record_batch(path: str, batch_id: int) -> None:
    tmp = path + ".batch.tmp"
    with open(tmp, "w") as fh:
        json.dump({"batch_id": int(batch_id)}, fh)
    os.replace(tmp, path + ".batch")


def bloom_sink(col: str, path: str, n_bits: int, k: int = 7):
    """foreachBatch callback maintaining a Bloom artifact at ``path``:
    builds the micro-batch's delta filter distributed, ORs it into the
    stored bitmap, rewrites atomically.  Bit-or is idempotent, so
    replayed batches are harmless; geometry is pinned by the artifact
    (mismatch raises rather than silently corrupting)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        delta = bloom_build(batch_df, col, n_bits, k)
        if os.path.exists(path):
            prev, k_prev = bloom_load(path)
            if k_prev != k:
                raise ValueError(f"bloom artifact k={k_prev} != sink k={k}")
            delta = bloom_merge(prev, delta)
        tmp = path + ".tmp"
        bloom_save(delta, k, tmp)
        os.replace(tmp, path)
        _record_batch(path, batch_id)

    return _sink


def cms_sink(col: str, path: str, w: int, d: int = 5):
    """foreachBatch callback maintaining a Count-Min artifact at
    ``path``.  CM merge is a SUM, not idempotent — the sink records
    the last applied batch id next to the artifact and skips replays,
    giving exactly-once counts under streaming restarts."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_batch(path):
            return
        delta = sk.cms_build(batch_df, col, w, d)
        if os.path.exists(path):
            prev = sk.cms_load(path)
            if prev.shape != (d, w):
                raise ValueError(
                    f"cms artifact shape {prev.shape} != sink ({d}, {w})")
            delta = sk.cms_merge(prev, delta)
        tmp = path + ".tmp"
        sk.cms_save(np.ascontiguousarray(delta), tmp)
        os.replace(tmp, path)
        _record_batch(path, batch_id)

    return _sink


def hll_sink(col: str, path: str, p: int = 14):
    """foreachBatch callback maintaining a HyperLogLog artifact at
    ``path`` (distinct urls/hosts seen across ALL micro-batches).
    Register merge is elementwise MAX — idempotent like Bloom's
    bit-or, so replayed batches are harmless and no batch-id ledger is
    needed; the batch id is still recorded for observability.  The
    per-batch build's driver collect is bounded by 2^p registers."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        delta = sk.hll_build(batch_df, col, p)
        if os.path.exists(path):
            prev = sk.hll_load(path)
            if prev.size != delta.size:
                raise ValueError(
                    f"hll artifact has {prev.size} registers, sink expects "
                    f"{delta.size}")
            delta = sk.hll_merge(prev, delta)
        tmp = path + ".tmp"
        sk.hll_save(delta, tmp)
        os.replace(tmp, path)
        _record_batch(path, batch_id)

    return _sink


def kll_sink(col: str, path: str, k: int = 200):
    """foreachBatch callback maintaining a KLL quantile artifact at
    ``path`` (length/score distribution across ALL micro-batches).
    KLL merge ADDS weight — not idempotent — so like Count-Min the
    sink records the last applied batch id and skips replays."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_batch(path):
            return
        delta = sk.kll_build(batch_df, col, k)
        if os.path.exists(path):
            prev = sk.kll_load(path)
            if prev.k != k:
                raise ValueError(f"kll artifact k={prev.k} != sink k={k}")
            delta = sk.kll_merge(prev, delta)
        tmp = path + ".tmp"
        sk.kll_save(delta, tmp)
        os.replace(tmp, path)
        _record_batch(path, batch_id)

    return _sink


def kmv_sink(col: str, path: str, k: int = 1024):
    """foreachBatch callback maintaining a KMV (theta) artifact at
    ``path`` — the distinct-url sample whose set algebra
    (sketch.kmv_union / kmv_intersection) compares crawls WITHOUT
    joins.  Min-k merge is idempotent and commutative (re-merging a
    replayed batch's minima is a no-op), so like Bloom and HLL no
    batch ledger is needed; the id is recorded for observability."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        delta = sk.kmv_build(batch_df, col, k)
        if os.path.exists(path):
            prev, k_prev = sk.kmv_load(path)
            if k_prev != k:
                raise ValueError(f"kmv artifact k={k_prev} != sink k={k}")
            delta = sk.kmv_union(prev, delta, k)
        tmp = path + ".tmp"
        sk.kmv_save(delta, k, tmp)
        os.replace(tmp, path)
        _record_batch(path, batch_id)

    return _sink
