"""Retrieval evaluation — trec_eval-style metrics over (runs, qrels).

The engine grew a retrieval stack (BM25 postings artifact, ANN
brute/IVF/PQ/OPQ top-k); this is its measurement side: given a *runs*
frame (query_id, doc_id, score — what the system returned) and a
*qrels* frame (query_id, doc_id, rel — graded human judgments), emit
per-query Precision@k, Recall@k, reciprocal rank, average precision,
and nDCG@k, plus the macro means — the numbers retrieval papers and
dashboards report.

Spark-first shape (no Python anywhere):

- rank = ``row_number`` per query over (score DESC, doc_id ASC) — the
  doc-id tiebreak makes every metric deterministic under score ties,
  the same convention the BM25 operator uses.
- one LEFT join against qrels on (query, doc) attaches ``rel``
  (unjudged = 0, the trec_eval convention); AQE broadcasts qrels when
  small — judgment sets are ~1e3-1e5 rows against runs of
  queries × k, so in practice this join is a broadcast.
- cumulative hits for AP ride the SAME per-query sort window as the
  rank (one exchange + sort serves both).
- ideal DCG comes from qrels alone (rank rel DESC per query), so a
  system is never rewarded for retrieving MORE than the judgments
  support.

Queries with no relevant document in qrels are dropped (trec_eval
semantics — recall/AP/nDCG are undefined there), which the inner join
against the per-query qrels rollup performs for free.

Scale: everything is per-query windows + one join; partitions are
bounded by the run depth per query (k or the retriever's cutoff),
never by corpus size.  A million-query sweep is a million small
groups — exactly the shape Spark's hash exchange likes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["retrieval_metrics", "macro_metrics"]


def retrieval_metrics(
    runs: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query metrics frame: ``(query_col, n_ret, n_rel, p_at_k,
    r_at_k, rr, ap, ndcg)``.

    - ``p_at_k``  — relevant in the top k, over k (missing ranks count
      as misses, the trec_eval cutoff rule).
    - ``r_at_k``  — relevant in the top k, over the query's total
      relevant.
    - ``rr``      — 1/rank of the first relevant result at ANY depth
      (0 when the run never retrieves a relevant doc).
    - ``ap``      — mean of precision-at-r over the relevant retrieved
      ranks, normalized by total relevant (uninterpolated AP, full
      run depth).
    - ``ndcg``    — DCG@k with (2^rel - 1)/log2(rank + 1) gains over
      the ideal DCG@k computed from qrels.

    ``rel`` > 0 means relevant; graded values feed the nDCG gains.
    Ties in ``score_col`` break by ascending ``doc_col``.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    q, d = query_col, doc_col

    w = Window.partitionBy(q).orderBy(F.desc(score_col), F.asc(d))
    ranked = (
        runs.select(q, d, score_col)
        .join(qrels.select(q, d, rel_col), [q, d], "left")
        .withColumn("_rel", F.coalesce(F.col(rel_col), F.lit(0)))
        .withColumn("_rank", F.row_number().over(w))
        .withColumn("_hit", (F.col("_rel") > 0).cast("int"))
        .withColumn(
            "_cumhits",
            F.sum("_hit").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )

    # per-query truth rollup: total relevant + ideal DCG@k from qrels
    # alone (rel DESC rank; doc ASC tiebreak for determinism)
    iw = Window.partitionBy(q).orderBy(F.desc(rel_col), F.asc(d))
    truth = (
        qrels.filter(F.col(rel_col) > 0)
        .withColumn("_irank", F.row_number().over(iw))
        .groupBy(q)
        .agg(
            F.count(F.lit(1)).alias("n_rel"),
            F.sum(
                F.when(
                    F.col("_irank") <= k,
                    (F.pow(F.lit(2.0), F.col(rel_col)) - 1.0)
                    / F.log2(F.col("_irank") + 1.0),
                ).otherwise(0.0)
            ).alias("_idcg"),
        )
    )

    per_q = ranked.groupBy(q).agg(
        F.count(F.lit(1)).alias("n_ret"),
        (
            F.sum(F.when(F.col("_rank") <= k, F.col("_hit")).otherwise(0))
            / float(k)
        ).alias("p_at_k"),
        F.sum(F.when(F.col("_rank") <= k, F.col("_hit")).otherwise(0)).alias(
            "_hits_at_k"
        ),
        F.coalesce(
            F.max(
                F.when(F.col("_hit") == 1, 1.0 / F.col("_rank"))
            ),
            F.lit(0.0),
        ).alias("rr"),
        F.sum(
            F.when(
                F.col("_hit") == 1, F.col("_cumhits") / F.col("_rank")
            ).otherwise(0.0)
        ).alias("_ap_num"),
        F.sum(
            F.when(
                (F.col("_rank") <= k) & (F.col("_hit") == 1),
                (F.pow(F.lit(2.0), F.col("_rel")) - 1.0)
                / F.log2(F.col("_rank") + 1.0),
            ).otherwise(0.0)
        ).alias("_dcg"),
    )

    return (
        per_q.join(truth, q, "inner")
        .select(
            q,
            "n_ret",
            "n_rel",
            "p_at_k",
            (F.col("_hits_at_k") / F.col("n_rel")).alias("r_at_k"),
            "rr",
            (F.col("_ap_num") / F.col("n_rel")).alias("ap"),
            (F.col("_dcg") / F.col("_idcg")).alias("ndcg"),
        )
    )


def macro_metrics(per_query: DataFrame) -> DataFrame:
    """One-row macro means over :func:`retrieval_metrics` output:
    ``(n_queries, mean_p_at_k, mean_r_at_k, mrr, map, mean_ndcg)`` —
    the headline numbers (MRR and MAP are by definition these means).
    """
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.avg("p_at_k").alias("mean_p_at_k"),
        F.avg("r_at_k").alias("mean_r_at_k"),
        F.avg("rr").alias("mrr"),
        F.avg("ap").alias("map"),
        F.avg("ndcg").alias("mean_ndcg"),
    )
