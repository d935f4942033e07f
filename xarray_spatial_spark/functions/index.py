"""Inverted index: compressed postings artifact + search over it.

The retrieval tier so far scores queries against the CORPUS every
time (text.py:bm25_topk re-aggregates tf/df/doclen per call).  This
module builds the index ARTIFACT once — term-sharded, varbyte-
compressed postings with a zipnum-style manifest (the cdx.py pattern,
sources/cdx.py:107) — and serves BM25 queries from it touching only
the shards, row groups, and postings of the query's terms.

Reference parity: xarray-spatial has no retrieval tier; this is a
training-data-pipeline component (corpus -> searchable artifact) in
the same family as the CDX capture index.  Scoring semantics are
IDENTICAL to bm25_topk (Lucene non-negative idf, distinct query
terms; pinned by an equality test) so the index is a drop-in faster
path, and the `search_index` oracle replays the whole
build->encode->shard->prune->decode->score chain against DuckDB
computing BM25 directly from the corpus.

Postings layout per term (one `binary` cell): a single unsigned-
LEB128 (varbyte) stream `[n, delta_1..delta_n, tf_1..tf_n,
dl_1..dl_n]` where doc_ids are sorted ascending and delta_1 is the
first doc_id itself.  Doc length rides inline so scoring a query
never touches a corpus-sized doclens table — search cost is
proportional to the postings of the query's terms, nothing else.

100-TB shape:
- build: ONE explode of the corpus, two map-side-combined hash
  aggregates ((term,doc)->tf then term->postings), one range
  exchange to sort shards by term.  Stop-term postings are the skew
  hazard: `max_df` drops terms appearing in more than that fraction
  of docs BEFORE collect_list materializes them (a separate
  vocab-sized df agg gates the collect — vocab rows, not corpus).
- search: driver-side shard pruning from the manifest span table,
  `term IN (...)` pushed to parquet (row-group stats prune inside a
  shard because shards are SORTED by term), vectorized numpy varbyte
  decode in mapInPandas, idf/stats as literals from the manifest (no
  stats job, no corpus join), per-query window top-k.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .text import tokens

_MANIFEST = "_index_manifest.json"

# ---------------------------------------------------------------------------
# varbyte (unsigned LEB128) codec — vectorized numpy, loops bounded by
# max bytes-per-value (10 for uint64), never by value count
# ---------------------------------------------------------------------------


def varbyte_encode(vals: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int array: 7 value bits per byte,
    high bit = continuation."""
    v = np.asarray(vals, dtype=np.uint64)
    if v.size == 0:
        return b""
    nb = np.ones(v.size, np.int64)
    t = v >> np.uint64(7)
    while t.any():
        nb += (t > 0).astype(np.int64)
        t = t >> np.uint64(7)
    offs = np.cumsum(nb) - nb
    out = np.zeros(int(nb.sum()), np.uint8)
    rem = v.copy()
    idx = offs.copy()
    left = nb.copy()
    alive = left > 0
    while alive.any():
        more = left[alive] > 1
        out[idx[alive]] = (rem[alive] & np.uint64(0x7F)).astype(np.uint8) | (
            more.astype(np.uint8) << 7
        )
        rem[alive] = rem[alive] >> np.uint64(7)
        idx[alive] += 1
        left[alive] -= 1
        alive = left > 0
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Inverse of :func:`varbyte_encode` (uint64 array)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, np.uint64)
    ends = (b & 0x80) == 0
    if not ends[-1]:
        raise ValueError("truncated varbyte stream")
    gid = np.cumsum(ends) - ends  # group index per byte
    starts = np.r_[0, np.flatnonzero(ends)[:-1] + 1]
    within = (np.arange(b.size) - starts[gid]).astype(np.uint64)
    vals = np.zeros(int(ends.sum()), np.uint64)
    np.add.at(vals, gid, (b & 0x7F).astype(np.uint64) << (np.uint64(7) * within))
    return vals


def _encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> bytes:
    order = np.argsort(doc_ids, kind="stable")
    d = doc_ids[order].astype(np.uint64)
    deltas = np.diff(d, prepend=np.uint64(0))
    stream = np.concatenate(
        [
            np.array([d.size], np.uint64),
            deltas,
            tfs[order].astype(np.uint64),
            dls[order].astype(np.uint64),
        ]
    )
    return varbyte_encode(stream)


def _decode_postings(buf: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    vals = varbyte_decode(buf)
    n = int(vals[0])
    deltas = vals[1 : n + 1]
    doc_ids = np.cumsum(deltas).astype(np.int64)
    tfs = vals[n + 1 : 2 * n + 1].astype(np.int64)
    dls = vals[2 * n + 1 : 3 * n + 1].astype(np.int64)
    return doc_ids, tfs, dls


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------


def build_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: float | None = None,
) -> DataFrame:
    """(term, df, postings binary) from a corpus.  ``max_df`` (0..1]
    drops terms appearing in more than that fraction of documents
    BEFORE their postings are materialized — the stop-term guard: a
    term in every doc otherwise collects a corpus-length list into
    one task.  The df gate joins a VOCAB-sized aggregate (broadcast
    when small), so the cost is one extra map-side-combined pass."""
    terms = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = terms.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    entries = tf.join(dl, "doc_id")
    if max_df is not None:
        dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
        n_docs = dl.agg(F.count(F.lit(1)).alias("_n"))
        keep = dfreq.crossJoin(F.broadcast(n_docs)).filter(
            F.col("_df") <= F.col("_n") * F.lit(float(max_df))
        )
        entries = entries.join(keep.select("term"), "term")

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for term, grp in pdf.groupby("term", sort=False):
            rows.append(
                (
                    term,
                    len(grp),
                    _encode_postings(
                        grp["doc_id"].to_numpy(),
                        grp["tf"].to_numpy(),
                        grp["dl"].to_numpy(),
                    ),
                )
            )
        return pd.DataFrame(rows, columns=["term", "df", "postings"])

    def _enc(pdf_iter):
        # Arrow batches can SPLIT a term's rows across two pdfs, which
        # would emit duplicate term rows — hold back the final term of
        # every batch until the next batch proves it complete (rows
        # are term-contiguous per partition via sortWithinPartitions).
        pending: pd.DataFrame | None = None
        for pdf in pdf_iter:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
            if len(pdf) == 0:
                pending = None
                continue
            last = pdf["term"].iloc[-1]
            done_mask = (pdf["term"] != last).to_numpy()
            pending = pdf[~done_mask]
            if done_mask.any():
                yield _pack(pdf[done_mask])
        if pending is not None and len(pending):
            yield _pack(pending)

    # one exchange on term; encoding happens post-shuffle so each
    # term's postings live in exactly one output row
    shuffled = entries.repartition("term").sortWithinPartitions("term", "doc_id")
    return shuffled.mapInPandas(
        _enc, "term string, df long, postings binary"
    )


def write_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 8,
    max_df: float | None = None,
) -> dict:
    """Build + persist the index: range-sharded postings sorted by
    term, plus a manifest carrying per-shard term spans (driver-side
    pruning, the cdx.py zipnum pattern) and the corpus stats BM25
    needs (n_docs, avgdl) so queries never touch the corpus."""
    postings = build_postings(docs, text_col, id_col, max_df=max_df)
    (
        postings.repartitionByRange(n_shards, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(path)
    )
    # N/avgdl over docs with >=1 token only — bm25_topk derives them
    # from the explode, which never sees empty docs; keep identical
    stats_row = (
        docs.select(F.size(tokens(F.col(text_col))).alias("_dl"))
        .filter(F.col("_dl") > 0)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("_dl").alias("avgdl"),
        )
        .collect()[0]
    )
    import pyarrow.parquet as pq

    shards = {}
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = idx["term"]
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                lo, hi = None, None
                break
            mn = st.min if isinstance(st.min, str) else st.min.decode()
            mx = st.max if isinstance(st.max, str) else st.max.decode()
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        shards[name] = {"min": lo, "max": hi, "rows": md.num_rows}
    manifest = {
        "format": "postings-parquet-v1",
        "key": "term",
        "shards": shards,
        "stats": {
            "n_docs": int(stats_row["n_docs"]),
            "avgdl": float(stats_row["avgdl"] or 0.0),
        },
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


# ---------------------------------------------------------------------------
# search
# ---------------------------------------------------------------------------


def _query_terms(query: str) -> list[str]:
    """Driver twin of text.tokens (trim + split on whitespace)."""
    q = query.strip()
    return sorted(set(q.split())) if q else []


def search_index(
    spark: SparkSession,
    path: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k per query served FROM THE ARTIFACT: shard pruning
    via the manifest, `term IN` pushed into the parquet scan (sorted
    shards -> row-group pruning), numpy varbyte decode of only the
    matching postings, idf/avgdl as literals from the manifest.
    Returns (query_id, doc_id, score, n_terms_hit, rank) — the exact
    bm25_topk output shape, ties broken (score desc, doc_id asc)."""
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    n_docs = manifest["stats"]["n_docs"]
    avgdl = manifest["stats"]["avgdl"]

    term_qids: dict[str, list[int]] = {}
    for qid, q in queries:
        for t in _query_terms(q):
            term_qids.setdefault(t, []).append(qid)
    out_schema = (
        "query_id int, doc_id long, score double, n_terms_hit long, rank int"
    )
    if not term_qids or n_docs == 0:
        return spark.createDataFrame([], out_schema)

    wanted = sorted(term_qids)
    files = [
        os.path.join(path, name)
        for name, span in sorted(manifest["shards"].items())
        if span["min"] is None
        or any(span["min"] <= t <= span["max"] for t in wanted)
    ]
    if not files:
        return spark.createDataFrame([], out_schema)

    hits = (
        spark.read.parquet(*files)
        .filter(F.col("term").isin(wanted))
    )

    def _dec(pdf_iter):
        for pdf in pdf_iter:
            for term, dfreq, buf in zip(pdf["term"], pdf["df"], pdf["postings"]):
                doc_ids, tfs, dls = _decode_postings(bytes(buf))
                yield pd.DataFrame(
                    {
                        "term": term,
                        "df": int(dfreq),
                        "doc_id": doc_ids,
                        "tf": tfs,
                        "dl": dls,
                    }
                )

    decoded = hits.mapInPandas(
        _dec, "term string, df long, doc_id long, tf long, dl long"
    )
    qmap = spark.createDataFrame(
        [(t, qid) for t, qids in term_qids.items() for qid in qids],
        "term string, query_id int",
    )
    scored = decoded.join(F.broadcast(qmap), "term").withColumn(
        "_s",
        F.log(
            1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        * F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1) * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))
        ),
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("_s").alias("score"), F.count(F.lit(1)).alias("n_terms_hit")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "n_terms_hit", "rank")
    )


def index_stats(path: str) -> dict:
    """Manifest passthrough (shards + corpus stats) for inspection."""
    with open(os.path.join(path, _MANIFEST)) as f:
        return json.load(f)
