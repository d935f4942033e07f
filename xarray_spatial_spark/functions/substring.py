"""Exact substring deduplication — remove corpus-repeated spans.

The ExactSubstr operation of Lee et al. 2022 ("Deduplicating Training
Data Makes Language Models Better"): find every maximal span of at
least ``min_len`` characters that occurs two or more times anywhere in
the corpus (across documents OR within one), and cut those spans out
before training.  Memorization studies trace verbatim LM output
overwhelmingly to such repeats (boilerplate, licenses, mirrored
articles), and near-dup methods (minhash/simhash over whole docs,
functions/dedup.py) miss them when the surrounding document differs.

Position-level semantics, chosen because it is both the paper's
fixed-length-window formulation and expressible in ANSI SQL for the
DuckDB oracle: a character position is *duplicated* iff it is covered
by some length-``min_len`` gram whose exact text occurs >= 2 times in
the corpus (counting occurrences, not documents, so an intra-document
repeat qualifies).  Duplicated positions merge into maximal spans.
Any substring of length >= min_len occurring twice has every one of
its L-grams occurring twice, so this is exactly "union of repeated
substrings of length >= min_len".

Two physical strategies, identical results (equality is pytest-pinned
on planted and random corpora):

- **exact** — every position's L-gram rolling hash is emitted as one
  row; one map-side-combined count by hash; occurrences of hashes
  with count >= 2 come back to their documents.  Shuffle ~= 16 bytes
  per corpus character: the right plan up to the TB range, same
  constant class as the paper's single-node suffix array (8 bytes per
  byte) but distributed.
- **anchored** — the 100-TB plan.  Classic winnowing (Schleimer,
  Wilkerson & Aiken 2003) over k-grams (k = min_len//2, window
  w = min_len-k+1) selects ~2n/w anchor fingerprints per document;
  only anchors whose hash occurs >= 2 times expand into candidate
  L-gram positions (the w positions ending at the anchor), and only
  candidates are hashed/counted.  Exactness is preserved, not
  approximated: every occurrence of a duplicated L-gram contains one
  full window of k-gram starts, whose rightmost-minimum selection
  depends only on the (identical) content, so the SAME anchor k-gram
  is selected at EVERY occurrence; its hash therefore counts >= 2,
  every true occurrence becomes a candidate, and false candidates die
  at the count>=2 filter.  Shuffle ~= corpus_chars/w anchor rows plus
  work proportional to the duplicated volume — on a mostly-unique
  crawl, ~3% of the exact mode's bytes at min_len=50.

``anchored=None`` auto-dispatches on optimizer plan size (the
repo-wide pattern: plans/joins.py, tiled halo strategies).

Hashing: 64-bit polynomial over code points with an odd base, uint64
wraparound (deterministic content function — equal grams hash equal;
accidental collision odds are n_grams^2 / 2^65, ~1e-9 at 10^5 grams
and still ~3e-4 at a 10^9-gram shard; a collision can only ADD a
false span, never lose one, and the per-shard rate is documented
rather than silently wrong).

Reference parity: the reference engine has no corpus-dedup tier; this
extends SURVEY §2's LLM-data components alongside functions/dedup.py
(minhash xrspatial has no analog of either).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = np.uint64(1099511628211)  # odd 64-bit polynomial base (FNV prime)


def _powers(length: int) -> np.ndarray:
    """[B^(L-1), B^(L-2), ..., B, 1] mod 2^64."""
    p = np.empty(length, dtype=np.uint64)
    p[-1] = np.uint64(1)
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        for i in range(length - 2, -1, -1):
            p[i] = p[i + 1] * _B
    return p


def _gram_hashes(codes: np.ndarray, length: int, powers: np.ndarray,
                 out_positions: np.ndarray | None = None) -> np.ndarray:
    """Rolling L-gram hashes at every (or ``out_positions``) start.

    Chunked so the materialized (positions x L) uint64 window matrix
    stays under ~16 MB however long one document is."""
    n = codes.shape[0] - length + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    if out_positions is None:
        starts = None
        total = n
    else:
        starts = out_positions
        total = starts.shape[0]
    out = np.empty(total, dtype=np.uint64)
    step = max(1, (1 << 21) // length)  # 2M cells -> 16 MB window tmp
    from numpy.lib.stride_tricks import sliding_window_view

    if starts is None:
        win = sliding_window_view(codes, length)
        for lo in range(0, n, step):
            hi = min(n, lo + step)
            out[lo:hi] = (win[lo:hi].astype(np.uint64) * powers).sum(axis=1)
    else:
        win = sliding_window_view(codes, length)
        for lo in range(0, total, step):
            hi = min(total, lo + step)
            out[lo:hi] = (
                win[starts[lo:hi]].astype(np.uint64) * powers
            ).sum(axis=1)
    return out


def _winnow(kh: np.ndarray, w: int) -> np.ndarray:
    """Classic winnowing: for each window of ``w`` consecutive k-gram
    hashes select the RIGHTMOST minimum; return the sorted unique
    selected indices.  Rightmost-min is the tie rule whose selection
    inside a window depends only on the window's hash sequence — the
    property the anchored mode's exactness proof needs (robust
    winnowing is history-dependent and would break it)."""
    m = kh.shape[0]
    if m == 0:
        return np.empty(0, dtype=np.int64)
    if m <= w:
        return np.array([m - 1 - int(np.argmin(kh[::-1]))], dtype=np.int64)
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(kh, w)
    # rightmost argmin = w-1 - argmin of the reversed window
    idx = (w - 1) - np.argmin(win[:, ::-1], axis=1)
    sel = idx + np.arange(win.shape[0], dtype=np.int64)
    return np.unique(sel)


def _codes(text: str) -> np.ndarray:
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def _plan_bytes(df: DataFrame) -> int:
    raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    return raw if isinstance(raw, int) else int(raw.toString())


def duplicated_positions(
    df: DataFrame,
    min_len: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    anchored: bool | None = None,
) -> DataFrame:
    """(id, pos) for every 0-based L-gram start whose exact text
    occurs >= 2 times in the corpus.  See the module docstring for
    the exact/anchored strategies; results are identical."""
    if min_len < 4:
        raise ValueError("min_len must be >= 4")
    if anchored is None:
        # measured (BENCH/substr_scale.json): on a 665M-char
        # mostly-unique corpus anchored is 8.8x faster (60.7 s vs
        # 534.1 s at local[32]) with bit-identical spans — its extra
        # fixed jobs only win below ~tens of MB, so dispatch exact
        # only for small inputs (or corpora known to be mostly
        # duplicated, where callers should pass anchored=False)
        anchored = _plan_bytes(df) > (64 << 20)
    L = min_len
    powers = _powers(L)
    base = df.select(F.col(id_col).alias("_id"),
                     F.col(text_col).alias("_t"))

    if not anchored:
        def _emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, poss, hs = [], [], []
                for did, t in zip(pdf["_id"], pdf["_t"].fillna("")):
                    h = _gram_hashes(_codes(t), L, powers)
                    if not h.shape[0]:
                        continue
                    ids.append(np.full(h.shape[0], did, dtype=np.int64))
                    poss.append(np.arange(h.shape[0], dtype=np.int32))
                    hs.append(h.astype(np.int64))
                if not ids:
                    continue
                yield pd.DataFrame({
                    "_id": np.concatenate(ids),
                    "pos": np.concatenate(poss),
                    "h": np.concatenate(hs),
                })

        # the emission feeds both the count and the join-back side —
        # persist the 20-byte rows once instead of re-running the
        # Arrow hash pass per consumer (dedup.py's signature pattern)
        occ = base.mapInPandas(
            _emit, schema="_id long, pos int, h long").persist()
        cnt = (occ.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
               .filter(F.col("c") >= 2).select("h"))
        return (occ.join(cnt, "h")
                .select(F.col("_id").alias(id_col), "pos"))

    # --- anchored: winnow -> matched anchors -> candidate L-grams ---
    k = max(2, L // 2)
    w = L - k + 1
    kpow = _powers(k)

    def _anchors(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, poss, hs = [], [], []
            for did, t in zip(pdf["_id"], pdf["_t"].fillna("")):
                codes = _codes(t)
                if codes.shape[0] < L:
                    continue
                kh = _gram_hashes(codes, k, kpow)
                sel = _winnow(kh, w)
                ids.append(np.full(sel.shape[0], did, dtype=np.int64))
                poss.append(sel.astype(np.int32))
                hs.append(kh[sel].astype(np.int64))
            if not ids:
                continue
            yield pd.DataFrame({
                "_id": np.concatenate(ids),
                "apos": np.concatenate(poss),
                "ah": np.concatenate(hs),
            })

    # two consumers (count + join-back): persist the winnowed rows
    anch = base.mapInPandas(
        _anchors, schema="_id long, apos int, ah long").persist()
    acnt = (anch.groupBy("ah").agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= 2).select("ah"))
    matched = (anch.join(acnt, "ah")
               .groupBy("_id").agg(F.collect_list("apos").alias("aposs")))
    # docs with no matched anchor cannot hold a duplicated L-gram
    # (winnowing guarantee) — the inner join prunes them before any
    # text is re-read
    cand_src = base.join(matched, "_id")

    def _cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, poss, hs = [], [], []
            for did, t, ap in zip(pdf["_id"], pdf["_t"].fillna(""),
                                  pdf["aposs"]):
                codes = _codes(t)
                n = codes.shape[0] - L + 1
                if n <= 0:
                    continue
                ap = np.asarray(ap, dtype=np.int64)
                # an L-gram at p contains k-gram window [p, p+w);
                # its guaranteed shared anchor q sits in that window,
                # so candidates for anchor q are p in [q-w+1, q]
                lo = np.maximum(ap - w + 1, 0)
                hi = np.minimum(ap, n - 1)
                keep = lo <= hi
                lo, hi = lo[keep], hi[keep]
                if not lo.shape[0]:
                    continue
                # union of [lo, hi] ranges without building per-range
                # arrays: diff-array over positions
                mark = np.zeros(n + 1, dtype=np.int32)
                np.add.at(mark, lo, 1)
                np.add.at(mark, hi + 1, -1)
                cps = np.flatnonzero(np.cumsum(mark[:-1]) > 0)
                h = _gram_hashes(codes, L, powers, out_positions=cps)
                ids.append(np.full(cps.shape[0], did, dtype=np.int64))
                poss.append(cps.astype(np.int32))
                hs.append(h.astype(np.int64))
            if not ids:
                continue
            yield pd.DataFrame({
                "_id": np.concatenate(ids),
                "pos": np.concatenate(poss),
                "h": np.concatenate(hs),
            })

    cand = cand_src.mapInPandas(
        _cands, schema="_id long, pos int, h long").persist()
    ccnt = (cand.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= 2).select("h"))
    return (cand.join(ccnt, "h")
            .select(F.col("_id").alias(id_col), "pos"))


def duplicated_spans(
    df: DataFrame,
    min_len: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    anchored: bool | None = None,
) -> DataFrame:
    """Maximal duplicated spans per document: (id, span_start,
    span_end) with 0-based start inclusive / end exclusive.  Coverage
    intervals [pos, pos+min_len) of duplicated L-gram starts, merged
    where they touch.  One count-by-hash pass (see
    :func:`duplicated_positions`) plus one per-document aggregation;
    per-document state is its duplicated positions only."""
    pos = duplicated_positions(df, min_len=min_len, text_col=text_col,
                               id_col=id_col, anchored=anchored)
    L = min_len

    merged = (
        pos.groupBy(id_col)
        .agg(F.array_sort(F.collect_list("pos")).alias("ps"))
        .select(
            id_col,
            F.explode(
                # fold sorted starts into merged [start, end) structs:
                # extend the open span while the next start touches it
                F.aggregate(
                    "ps",
                    F.expr("array()").cast("array<struct<s:int,e:int>>"),
                    lambda acc, p: F.when(
                        (F.size(acc) > 0)
                        & (p <= F.element_at(acc, -1)["e"]),
                        F.concat(
                            F.slice(acc, 1, F.size(acc) - 1),
                            F.array(F.struct(
                                F.element_at(acc, -1)["s"].alias("s"),
                                (p + F.lit(L)).cast("int").alias("e"),
                            )),
                        ),
                    ).otherwise(
                        F.concat(acc, F.array(F.struct(
                            p.cast("int").alias("s"),
                            (p + F.lit(L)).cast("int").alias("e"),
                        )))
                    ),
                )
            ).alias("sp"),
        )
        .select(
            id_col,
            F.col("sp.s").alias("span_start"),
            F.col("sp.e").alias("span_end"),
        )
    )
    return merged


def remove_duplicated_spans(
    df: DataFrame,
    min_len: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clean_text",
    anchored: bool | None = None,
) -> DataFrame:
    """All input rows with ``out_col`` = text minus its duplicated
    spans (documents without any span pass through verbatim via the
    left join).  Cutting is a pure Catalyst fold over the per-doc span
    array — no Python in the rewrite pass."""
    spans = (
        duplicated_spans(df, min_len=min_len, text_col=text_col,
                         id_col=id_col, anchored=anchored)
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(
            F.struct("span_start", "span_end"))).alias("_spans"))
    )
    joined = df.join(spans, id_col, "left")
    # fold spans left to right, keeping [cursor, span_start) each time
    kept = F.aggregate(
        F.coalesce("_spans",
                   F.expr("array()").cast(
                       "array<struct<span_start:int,span_end:int>>")),
        F.struct(F.lit(0).cast("int").alias("cur"),
                 F.lit("").alias("acc")),
        lambda st, sp: F.struct(
            sp["span_end"].alias("cur"),
            F.concat(
                st["acc"],
                F.substring(
                    F.col(text_col), st["cur"] + 1,
                    F.greatest(sp["span_start"] - st["cur"], F.lit(0)),
                ),
            ).alias("acc"),
        ),
        lambda st: F.concat(
            st["acc"],
            F.substring(F.col(text_col), st["cur"] + 1, F.lit(1 << 30)),
        ),
    )
    return joined.withColumn(
        out_col,
        F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(kept),
    ).drop("_spans")
