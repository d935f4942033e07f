"""Retrieval metrics (functions/retrieval.py): hand-computed example,
pure-python reference parity on random runs/qrels, tie determinism,
and trec_eval conventions (unjudged=0, no-relevant queries dropped)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.retrieval import (
    macro_metrics,
    retrieval_metrics,
)


def _frames(spark, runs, qrels):
    r = spark.createDataFrame(
        runs, "query_id long, doc_id long, score double"
    )
    q = spark.createDataFrame(qrels, "query_id long, doc_id long, rel long")
    return r, q


def test_hand_computed(spark):
    # q1: ranked docs 10(rel2), 11(rel0), 12(rel1)  [scores 3,2,1]
    runs = [(1, 10, 3.0), (1, 11, 2.0), (1, 12, 1.0)]
    qrels = [(1, 10, 2), (1, 12, 1), (1, 99, 1)]  # 99 never retrieved
    r, q = _frames(spark, runs, qrels)
    row = retrieval_metrics(r, q, k=2).collect()[0]
    assert row.n_ret == 3 and row.n_rel == 3
    assert row.p_at_k == pytest.approx(1 / 2)  # one hit in top-2
    assert row.r_at_k == pytest.approx(1 / 3)
    assert row.rr == pytest.approx(1.0)
    # AP: hits at ranks 1 (prec 1/1) and 3 (prec 2/3), over n_rel=3
    assert row.ap == pytest.approx((1.0 + 2 / 3) / 3)
    # DCG@2 = (2^2-1)/log2(2) = 3; IDCG@2 = 3 + (2^1-1)/log2(3)
    assert row.ndcg == pytest.approx(3.0 / (3.0 + 1.0 / math.log2(3)))


def test_no_relevant_query_dropped_and_zero_rr(spark):
    runs = [(1, 10, 1.0), (2, 10, 1.0)]
    qrels = [(1, 77, 1), (2, 5, 0)]  # q1 has unretrieved rel; q2 none
    r, q = _frames(spark, runs, qrels)
    rows = {x.query_id: x for x in retrieval_metrics(r, q, k=5).collect()}
    assert set(rows) == {1}  # q2 dropped (no rel>0 judgment)
    assert rows[1].rr == 0.0 and rows[1].ap == 0.0 and rows[1].ndcg == 0.0


def test_score_tie_breaks_by_doc_id(spark):
    # equal scores: doc 3 (rel) must rank before doc 7 (not rel)
    runs = [(1, 7, 5.0), (1, 3, 5.0)]
    qrels = [(1, 3, 1)]
    r, q = _frames(spark, runs, qrels)
    row = retrieval_metrics(r, q, k=1).collect()[0]
    assert row.p_at_k == 1.0 and row.rr == 1.0


def _reference(runs, qrels, k):
    """Pure-python trec_eval replay."""
    from collections import defaultdict

    rel = {(q, d): r for q, d, r in qrels}
    nrel = defaultdict(int)
    by_q_rels = defaultdict(list)
    for q, d, r in qrels:
        if r > 0:
            nrel[q] += 1
            by_q_rels[q].append((r, d))
    by_q = defaultdict(list)
    for q, d, s in runs:
        by_q[q].append((s, d))
    out = {}
    for q, lst in by_q.items():
        if nrel[q] == 0:
            continue
        lst.sort(key=lambda t: (-t[0], t[1]))
        hits_k = hits = 0
        rr = ap = dcg = 0.0
        for i, (_, d) in enumerate(lst, 1):
            g = rel.get((q, d), 0)
            if g > 0:
                hits += 1
                if rr == 0.0:
                    rr = 1.0 / i
                ap += hits / i
                if i <= k:
                    hits_k += 1
                    dcg += (2.0 ** g - 1) / math.log2(i + 1)
        ideal = sorted(by_q_rels[q], key=lambda t: (-t[0], t[1]))
        idcg = sum(
            (2.0 ** g - 1) / math.log2(i + 1)
            for i, (g, _) in enumerate(ideal[:k], 1)
        )
        out[q] = dict(
            p_at_k=hits_k / k,
            r_at_k=hits_k / nrel[q],
            rr=rr,
            ap=ap / nrel[q],
            ndcg=dcg / idcg if idcg else 0.0,
        )
    return out


def test_random_parity_vs_reference(spark):
    rng = random.Random(1234)
    runs, qrels = [], []
    for q in range(40):
        docs = rng.sample(range(500), 30)
        for d in docs:
            runs.append((q, d, float(rng.randint(0, 9))))  # heavy ties
        for d in rng.sample(range(500), 25):
            qrels.append((q, d, rng.randint(0, 3)))
    r, qf = _frames(spark, runs, qrels)
    got = {
        x.query_id: x for x in retrieval_metrics(r, qf, k=10).collect()
    }
    exp = _reference(runs, qrels, 10)
    assert set(got) == set(exp)
    for q in exp:
        for m in ("p_at_k", "r_at_k", "rr", "ap", "ndcg"):
            assert got[q][m] == pytest.approx(exp[q][m], abs=1e-12), (q, m)


def test_macro_means(spark):
    runs = [(1, 10, 2.0), (1, 11, 1.0), (2, 20, 2.0), (2, 21, 1.0)]
    qrels = [(1, 10, 1), (2, 21, 1)]
    r, q = _frames(spark, runs, qrels)
    m = macro_metrics(retrieval_metrics(r, q, k=1)).collect()[0]
    assert m.n_queries == 2
    assert m.mrr == pytest.approx((1.0 + 0.5) / 2)
    assert m.mean_p_at_k == pytest.approx(0.5)


def test_k_validation(spark):
    r, q = _frames(spark, [(1, 1, 1.0)], [(1, 1, 1)])
    with pytest.raises(ValueError):
        retrieval_metrics(r, q, k=0)
