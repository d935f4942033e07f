"""Similarity search over embedding columns (array<float>).

Two paths, mirroring the broadcast-vs-shuffle duality of the
proximity family:

- ``cosine_topk_broadcast``: queries collected + broadcast; one
  vectorized matmul pass over the corpus (mapInPandas), per-batch
  running top-k merge on the way out.  Zero shuffles; the baseline
  exact path.
- ``ivf_topk``: IVF-style scale path — deterministic centroid sample,
  corpus bucketed by nearest centroid (one pass), queries probe the
  ``n_probe`` nearest buckets only; exact cosine within buckets via an
  equi-join on the centroid id.  Recall -> 1 as n_probe grows; exact
  when n_probe = n_centroids.

Also ``cosine_topk_expr``: a pure-expression brute force (explode-free
zip_with dot product vs a literal query vector) used for
oracle-checkable single-query top-k.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_expr(vec_col: str, query: list[float]) -> Column:
    """Cosine similarity of an array column against a literal vector —
    JVM-side zip_with/aggregate, no UDF."""
    q = F.array(*[F.lit(float(v)) for v in query])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    nv = F.sqrt(
        F.aggregate(
            F.col(vec_col), F.lit(0.0), lambda a, v: a + v.cast("double") * v
        )
    )
    nq = float(np.linalg.norm(query))
    return dot / (nv * F.lit(nq))


def cosine_topk_expr(
    df: DataFrame, query: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k for ONE query vector, fully Catalyst (sortable,
    oracle-checkable).  Ties break by id."""
    return (
        df.select(F.col(id_col), cosine_expr(vec_col, query).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cosine_topk_broadcast(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id: str = "query_id",
) -> DataFrame:
    """Exact top-k per query: broadcast all queries, matmul per Arrow
    batch, merge per-partition top-k with a final narrow window."""
    sc = corpus.sparkSession.sparkContext
    qpdf = queries.select(query_id, vec_col).toPandas()
    qids = qpdf[query_id].to_numpy()
    qmat = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)
    bc = sc.broadcast((qids, qmat, qnorm))

    schema = f"{query_id} long, {id_col} long, cosine double"

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, qm, qn = bc.value
        best: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(vecs, axis=1)
            norms[norms == 0] = 1.0
            sims = (vecs @ qm.T) / (norms[:, None] * qn[None, :])
            cids = pdf[id_col].to_numpy()
            # per-query partial top-k within this batch
            kk = min(k, sims.shape[0])
            top_idx = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            for j in range(sims.shape[1]):
                rows = top_idx[:, j]
                prev = best.get(j)
                cand = np.stack([sims[rows, j], cids[rows]], axis=1)
                best[j] = cand if prev is None else np.vstack([prev, cand])
                if len(best[j]) > 4 * k:
                    keep = np.argpartition(-best[j][:, 0], k - 1)[:k]
                    best[j] = best[j][keep]
        out_q, out_id, out_c = [], [], []
        for j, arr in best.items():
            keep = arr[np.argsort(-arr[:, 0])][:k]
            out_q.extend([ids_q[j]] * len(keep))
            out_id.extend(keep[:, 1].astype(np.int64))
            out_c.extend(keep[:, 0])
        yield pd.DataFrame({query_id: out_q, id_col: out_id, "cosine": out_c})

    partial = corpus.select(id_col, vec_col).mapInPandas(_op, schema=schema)
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )


def _centroids(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str,
    id_col: str,
    method: str = "kmeans",
    sample: int = 16384,
    iters: int = 12,
):
    """Deterministic IVF centroids.

    ``kmeans`` (default): spherical Lloyd's on a hash-ordered sample
    (deterministic — no RNG, no parallelism dependence): normalize,
    assign to max-cosine centroid, recentre, renormalize; empty
    clusters respawn on the farthest points.  On clustered real
    embeddings this is what gives IVF its recall; the old hash-pick
    kept buckets well-spread only for uniform synthetic data.
    ``hash``: the n lowest xxhash64(id) vectors (cheap, uniform-data
    only)."""
    n_pick = n_centroids if method == "hash" else max(sample, n_centroids)
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.pmod(F.xxhash64(F.col(id_col)), F.lit(1 << 61)))
        .limit(n_pick)
        .collect()
    )
    vecs = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    if method == "hash" or len(vecs) <= n_centroids:
        return vecs[:n_centroids]
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    x = vecs / norms[:, None]
    c = x[:n_centroids].copy()  # deterministic init: first hash-ordered
    for _ in range(iters):
        sims = x @ c.T
        assign = np.argmax(sims, axis=1)
        newc = np.zeros_like(c)
        np.add.at(newc, assign, x)
        counts = np.bincount(assign, minlength=n_centroids)
        empty = counts == 0
        if empty.any():
            # respawn empty clusters on the worst-served points
            worst = np.argsort(sims[np.arange(len(x)), assign])
            newc[empty] = x[worst[: int(empty.sum())]]
            counts[empty] = 1
        newc /= np.linalg.norm(newc, axis=1, keepdims=True).clip(1e-12)
        if np.allclose(newc, c, atol=1e-9):
            c = newc
            break
        c = newc
    return c


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id: str = "query_id",
    centroid_method: str = "kmeans",
) -> DataFrame:
    """IVF-bucketed approximate top-k: corpus partitioned once by
    nearest centroid; each query probes its n_probe nearest buckets.
    Centroids come from deterministic spherical k-means by default
    (``centroid_method='hash'`` for the cheap uniform-data pick)."""
    cents = _centroids(corpus, n_centroids, vec_col, id_col,
                       method=centroid_method)
    cnorm = np.linalg.norm(cents, axis=1)
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast((cents, cnorm))

    def _assign(probe: int, out_name: str, vec_out: str, vec_type: str):
        # the vector rides THROUGH the Arrow pass (same element type as
        # the source) instead of being re-fetched with a shuffle join
        # back onto the source table — bucket assignment stays a
        # zero-shuffle map stage per side
        schema_a = f"_tmp_id long, {out_name} array<int>, {vec_out} {vec_type}"

        def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c, cn = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                vecs = np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
                norms = np.linalg.norm(vecs, axis=1)
                norms[norms == 0] = 1.0
                sims = (vecs @ c.T) / (norms[:, None] * cn[None, :])
                order = np.argsort(-sims, axis=1)[:, :probe].astype(np.int32)
                yield pd.DataFrame(
                    {"_tmp_id": pdf.iloc[:, 0].to_numpy(),
                     out_name: list(order),
                     vec_out: pdf.iloc[:, 1]}
                )

        return _op, schema_a

    ctype = corpus.schema[vec_col].dataType.simpleString()
    qtype = queries.schema[vec_col].dataType.simpleString()
    op_c, sch_c = _assign(1, "bucket", "_cvec", ctype)
    corpus_b = (
        corpus.select(F.col(id_col).alias("_tmp_id"), vec_col)
        .mapInPandas(op_c, schema=sch_c)
        .select(F.col("_tmp_id").alias(id_col),
                F.element_at("bucket", 1).alias("bucket"),
                F.col("_cvec").alias(vec_col))
    )
    op_q, sch_q = _assign(n_probe, "buckets", "_qvec", qtype)
    queries_b = (
        queries.select(F.col(query_id).alias("_tmp_id"), vec_col)
        .mapInPandas(op_q, schema=sch_q)
        .select(F.col("_tmp_id").alias(query_id),
                F.explode("buckets").alias("bucket"), "_qvec")
    )
    joined = corpus_b.join(queries_b, "bucket")
    dot = F.aggregate(
        F.zip_with(vec_col, "_qvec", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    nv = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda a, v: a + v * v))
    nq = F.sqrt(F.aggregate(F.col("_qvec"), F.lit(0.0), lambda a, v: a + v * v))
    scored = joined.withColumn("cosine", dot / (nv * nq))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pruning: cluster the
    corpus with the deterministic spherical k-means centroids, compare
    pairs WITHIN a cluster only, and drop every row whose cosine to a
    LOWER-id cluster-mate exceeds ``threshold``.  Returns the kept
    rows (a strict subset of the corpus, dedup semantics like
    ``exact_duplicates``: lowest id survives).

    Scale shape: centroid assignment is a zero-shuffle Arrow map
    stage; comparison is ONE bucket-keyed shuffle followed by a
    per-bucket vectorized matmul (never all-pairs, never per-pair
    expression evaluation); the b x b per-bucket sim matrix is the
    operator's cost model, which is exactly the SemDeDup paper's
    trade — raise ``n_clusters`` to shrink buckets.  Cross-cluster
    near-duplicates are missed by design (the recall/cost knob)."""
    cents = _centroids(corpus, n_clusters, vec_col, id_col, method="kmeans")
    cnorm = np.linalg.norm(cents, axis=1)
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast((cents, cnorm))
    ctype = corpus.schema[vec_col].dataType.simpleString()
    schema_a = f"{id_col} long, _bkt int, _v {ctype}"

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c, cn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(vecs, axis=1)
            norms[norms == 0] = 1.0
            sims = (vecs @ c.T) / (norms[:, None] * cn[None, :])
            yield pd.DataFrame({
                id_col: pdf.iloc[:, 0].to_numpy(),
                "_bkt": np.argmax(sims, axis=1).astype(np.int32),
                "_v": pdf.iloc[:, 1],
            })

    assigned = corpus.select(id_col, vec_col).mapInPandas(_op, schema=schema_a)

    # within-bucket comparison as ONE vectorized matmul per bucket
    # (applyInPandas), not a pair-explosion self-join: a b-vector
    # bucket costs O(b^2) similarity CELLS either way, but the matmul
    # does them at numpy speed while a join evaluates a Catalyst HOF
    # per pair (~50x slower measured at sf0.1).  Peak memory is the
    # bucket's b x b float64 sim matrix — n_clusters is the knob that
    # bounds b (the SemDeDup cost/recall trade).
    def _bucket_dupes(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        vecs = np.stack(pdf["_v"].to_numpy())[order].astype(np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        x = vecs / norms[:, None]
        sims = x @ x.T
        upper = np.triu(sims > threshold, k=1)  # (lower_id, higher_id)
        dup = upper.any(axis=0)
        return pd.DataFrame({id_col: ids[dup]})

    dupes = assigned.groupBy("_bkt").applyInPandas(
        _bucket_dupes, schema=f"{id_col} long"
    )
    return corpus.join(dupes, id_col, "left_anti")
