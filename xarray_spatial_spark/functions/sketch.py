"""Frequency sketches: exact distributed heavy hitters and Count-Min.

Two passes at corpus scale, both with hard guarantees:

- :func:`heavy_hitters` — EXACT top-k frequent values in two jobs
  with bounded memory everywhere.  Pass 1 runs a batched Space-Saving
  summary per partition (Metwally et al. 2005: ``m`` counters that
  OVERESTIMATE and never empty — unlike a batched Misra-Gries
  decrement, which on near-uniform data can wipe every counter and
  return nothing; the invariant is that any value ABSENT from a
  partition's summary has partition frequency <= that partition's
  final min counter).  Pass 2 recounts ONLY the candidate values
  exactly (a broadcast semi-join then a hash aggregate over matching
  rows), so every returned count is exact.  The result also carries a
  per-run certificate: a value absent from EVERY summary has global
  frequency <= sum over partitions of the min-counter bounds, so when
  the k-th recounted count exceeds that sum the top-k is PROVABLY
  exact, not heuristically so.  Driver memory is bounded by
  partitions x m candidate rows, never by distinct values.

- :func:`cms_build` / :func:`cms_estimate` — a mergeable Count-Min
  sketch (Cormode & Muthukrishnan 2005) as a durable artifact, the
  frequency analog of the Bloom filter in dedup.py: answer "how often
  did this token/host/URL occur across ALL previous crawls" without
  keeping the full count table.  Estimates NEVER undercount; each
  overcounts by at most eps*N with probability >= 1-delta.  Counts
  are linear, so :func:`cms_merge` (elementwise sum) is EXACTLY the
  sketch of the concatenated streams.

Scale split mirrors dedup.py's Bloom build: value hashing stays
JVM-side (one xxhash64 inside codegen); row indices are splitmix64
remixes of that single 8-byte hash, vectorized in numpy; the build
aggregates sparse per-cell partials (exchange rows bounded by
OCCUPIED SKETCH CELLS, never by n); probes are Arrow-batched
pandas_udfs against a broadcast array.

Reference: the xarray-spatial repo has no sketch tier; this is part
of the training-data-pipeline extension (SURVEY.md §2 addenda).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .dedup import _splitmix64

__all__ = [
    "heavy_hitters",
    "cms_params",
    "cms_build",
    "cms_estimate",
    "cms_merge",
    "cms_save",
    "cms_load",
]


# ---------------------------------------------------------------------------
# Exact heavy hitters: per-partition Space-Saving + exact recount
# ---------------------------------------------------------------------------


def _ss_batched(counts: dict, vc: pd.Series, m: int) -> bool:
    """Fold one batch's value_counts into a Space-Saving summary of at
    most ``m`` counters, in place; returns True if the fold evicted.

    Batched arrival rule: every batch key enters (or grows) at
    ``min_before + c`` where ``min_before`` is the pre-batch minimum
    (0 under capacity); then only the top ``m`` counters survive,
    deterministic ties by key.  This preserves both Space-Saving
    invariants — counter(x) >= freq(x) for present keys (a new key y
    had freq_before(y) <= min_before, so min_before + c covers it)
    and freq(y) <= current-min for absent keys (evictees satisfy
    est <= new min; every surviving counter >= min_before, so the min
    never decreases).  Unlike a batched Misra-Gries decrement this
    can never empty the summary."""
    min_before = min(counts.values()) if len(counts) >= m else 0
    for key, c in vc.items():
        counts[key] = counts.get(key, min_before) + int(c)
    if len(counts) <= m:
        return False
    s = pd.Series(counts).sort_index().sort_values(
        ascending=False, kind="mergesort")
    counts.clear()
    counts.update(s.iloc[:m].to_dict())
    return True


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    m: int | None = None,
) -> DataFrame:
    """Exact top-``k`` most frequent values of ``col`` in two jobs.

    Returns a <=k-row DataFrame ``(col, cnt, guaranteed)`` ordered by
    (cnt desc, value asc).  Every ``cnt`` is an EXACT count (pass 2
    recounts candidates against the raw rows).  ``guaranteed`` is one
    certificate value on every row: True iff the k-th count exceeds
    the sum of per-partition absent-key bounds (each partition's
    final min counter when it ever evicted, else 0 — a value missing
    from EVERY summary can occur at most that often), in which case
    no value outside the candidate set can belong to the true top-k.
    On near-uniform data with a small ``m`` the flag goes False —
    counts are still exact, only the claim "nothing heavier was
    missed" is withdrawn; raise ``m`` to restore it.

    ``m`` defaults to max(64, 8k) counters per partition; driver
    candidate memory is partitions x m rows, independent of distinct
    values, so a 100-TB corpus with billions of distinct hosts costs
    the same driver footprint as the sf0.01 test table.
    """
    if m is None:
        m = max(64, 8 * k)
    if m < k:
        raise ValueError(f"m={m} must be >= k={k}")
    spark = df.sparkSession
    vals = df.select(F.col(col).cast("string").alias("_v")).na.drop()

    def _partials(batches):
        counts: dict = {}
        n_rows = 0
        evicted = False
        for pdf in batches:
            if not len(pdf):
                continue
            n_rows += len(pdf)
            evicted |= _ss_batched(counts, pdf["_v"].value_counts(), m)
        bound = min(counts.values()) if evicted else 0
        out_v = list(counts.keys()) + [None]
        out_c = list(counts.values()) + [n_rows]
        out_b = [0] * (len(out_v) - 1) + [bound]
        yield pd.DataFrame({"_v": pd.array(out_v, dtype="string"),
                            "_est": np.asarray(out_c, dtype=np.int64),
                            "_bound": np.asarray(out_b, dtype=np.int64)})

    summary = vals.mapInPandas(
        _partials, schema="_v string, _est long, _bound long").collect()
    absent_bound = sum(r["_bound"] for r in summary if r["_v"] is None)
    candidates = sorted({r["_v"] for r in summary if r["_v"] is not None})
    if not candidates or k <= 0:
        return spark.createDataFrame([], f"{col} string, cnt long, guaranteed boolean")

    cand_df = spark.createDataFrame([(c,) for c in candidates], ["_v"])
    exact = (
        vals.join(F.broadcast(cand_df), "_v")
        .groupBy("_v").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("_v").asc())
        .limit(k)
        .collect()
    )
    # Certificate: a value absent from every partition summary has
    # global frequency <= absent_bound (Space-Saving min-counter bound
    # summed over partitions; 0 for partitions that never evicted —
    # there, absence means frequency 0).  Ties at the k-th count are
    # safe too: an absent value's frequency is <= absent_bound,
    # STRICTLY below a clearing cnt_k, and candidate ties break
    # deterministically by value.
    guaranteed = (len(exact) == len(candidates) and absent_bound == 0) or (
        len(exact) == k and exact[-1]["cnt"] > absent_bound)
    rows = [(r["_v"], r["cnt"], bool(guaranteed)) for r in exact]
    return spark.createDataFrame(rows, f"{col} string, cnt long, guaranteed boolean")


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def cms_params(eps: float = 0.001, delta: float = 0.01) -> tuple[int, int]:
    """Optimal (width, depth): w = ceil(e/eps), d = ceil(ln 1/delta).
    Additive error <= eps*N with probability >= 1-delta; memory is
    8*w*d bytes (e.g. eps=1e-6, delta=1e-3 -> ~150 MB — a frequency
    table for a trillion-token stream in one broadcast)."""
    if not (0 < eps < 1 and 0 < delta < 1):
        raise ValueError("eps and delta must be in (0, 1)")
    w = max(8, math.ceil(math.e / eps))
    d = max(1, math.ceil(math.log(1.0 / delta)))
    return w, d


def _cms_cols(h: np.ndarray, w: int, d: int) -> np.ndarray:
    """(n,) uint64 hashes -> (n, d) column indices: row i uses the
    Kirsch-Mitzenmacher double hash h1 + i*h2 mod w (pairwise
    independence per row is all CM needs)."""
    h1 = _splitmix64(h)
    h2 = _splitmix64(h1) | np.uint64(1)
    i = np.arange(d, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(w)


def cms_build(df: DataFrame, col: str, w: int, d: int = 5) -> np.ndarray:
    """Distributed build -> (d, w) int64 count matrix.  Each Arrow
    batch accumulates its increments into a dense local matrix, emits
    only OCCUPIED cells as sparse (cell, cnt) partials, and one
    map-side-combined sum aggregation merges tasks — the driver
    collect is bounded by d*w cells, independent of row count."""
    hashed = df.select(F.xxhash64(F.col(col)).alias("_h")).na.drop()

    def _partial(batches):
        dense = np.zeros(d * w, np.int64)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            h = pdf["_h"].to_numpy().astype(np.int64).view(np.uint64)
            cols = _cms_cols(h, w, d)
            flat = (np.arange(d, dtype=np.uint64)[None, :] * np.uint64(w)
                    + cols).ravel().astype(np.int64)
            np.add.at(dense, flat, 1)
        if any_rows:
            occ = np.nonzero(dense)[0]
            yield pd.DataFrame({"cell": occ, "cnt": dense[occ]})

    sparse = hashed.mapInPandas(_partial, schema="cell long, cnt long")
    rows = sparse.groupBy("cell").agg(F.sum("cnt").alias("cnt")).collect()
    sketch = np.zeros(d * w, np.int64)
    for r in rows:
        sketch[r["cell"]] = r["cnt"]
    return sketch.reshape(d, w)


def cms_estimate(spark, sketch: np.ndarray, col: Column | str) -> Column:
    """Long Column: estimated occurrence count of each value in the
    stream the sketch was built over.  Never undercounts; overcounts
    by <= eps*N w.p. >= 1-delta.  One broadcast per sketch; the probe
    is a vectorized min over the d rows."""
    from pyspark.sql.functions import pandas_udf

    d, w = sketch.shape
    bc = spark.sparkContext.broadcast(np.ascontiguousarray(sketch))

    @pandas_udf("long")
    def _probe(h: pd.Series) -> pd.Series:
        sk = bc.value
        hv = h.to_numpy().astype(np.int64).view(np.uint64)
        if not len(hv):
            return pd.Series([], dtype=np.int64)
        cols = _cms_cols(hv, w, d)
        est = sk[np.arange(d)[None, :], cols].min(axis=1)
        return pd.Series(est)

    return _probe(F.xxhash64(col if isinstance(col, Column) else F.col(col)))


def cms_merge(*sketches: np.ndarray) -> np.ndarray:
    """Sum sketches built with the SAME (d, w) — counts are linear,
    so the merge is EXACTLY the sketch of the concatenated inputs
    (unlike Bloom merge, not even the error compounds: eps applies to
    the merged N)."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    shapes = {s.shape for s in sketches}
    if len(shapes) != 1:
        raise ValueError(f"mismatched sketch shapes: {sorted(shapes)}")
    out = sketches[0].copy()
    for s in sketches[1:]:
        out += s
    return out


def cms_save(sketch: np.ndarray, path: str) -> None:
    """Persist as a one-column parquet of cells with (d, w) in the
    file metadata — same durable-artifact contract as bloom_save (the
    cross-snapshot frequency state lives in the lake next to the data
    it summarizes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d, w = sketch.shape
    table = pa.table({"cnt": pa.array(sketch.ravel(), pa.int64())})
    table = table.replace_schema_metadata(
        {b"cms_d": str(int(d)).encode(), b"cms_w": str(int(w)).encode()})
    pq.write_table(table, path)


def cms_load(path: str) -> np.ndarray:
    """Load a :func:`cms_save` artifact -> (d, w) int64 matrix."""
    import pyarrow.parquet as pq

    table = pq.read_table(path, columns=["cnt"])
    meta = table.schema.metadata or {}
    if b"cms_d" not in meta:
        raise ValueError(f"{path} is not a cms_save artifact")
    d, w = int(meta[b"cms_d"]), int(meta[b"cms_w"])
    return table["cnt"].to_numpy().astype(np.int64).reshape(d, w)
