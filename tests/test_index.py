"""Inverted index (functions/index.py): varbyte codec properties,
postings roundtrip across Arrow batch boundaries, manifest shard
pruning with plan pins, the stop-term guard, and — the core claim —
search_index == bm25_topk on the same corpus and queries."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from xarray_spatial_spark.functions import index as ix
from xarray_spatial_spark.functions import text as tx

DOCS = "/root/testdata/sf0.001/documents.parquet"
QUERIES = [
    (1, "the of and"),
    (2, "data web crawl"),
    (3, "zzz-not-a-term"),
    (4, "  "),
]


# --- varbyte codec -----------------------------------------------------------


@pytest.mark.parametrize(
    "vals",
    [
        [],
        [0],
        [127],
        [128],
        [0, 1, 2, 300, 2**20, 2**35, 2**63 - 1],
        list(range(1000)),
    ],
)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    got = ix.varbyte_decode(ix.varbyte_encode(arr))
    assert got.tolist() == arr.tolist()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert ix.varbyte_decode(ix.varbyte_encode(arr)).tolist() == arr.tolist()


def test_varbyte_truncated_raises():
    buf = ix.varbyte_encode(np.array([2**40], np.uint64))
    with pytest.raises(ValueError):
        ix.varbyte_decode(buf[:-1])


def test_postings_roundtrip():
    rng = np.random.default_rng(3)
    ids = rng.choice(10**9, 500, replace=False)
    tfs = rng.integers(1, 50, 500)
    dls = rng.integers(1, 2000, 500)
    d, t, l = ix._decode_postings(ix._encode_postings(ids, tfs, dls))
    order = np.argsort(ids)
    assert d.tolist() == ids[order].tolist()
    assert t.tolist() == tfs[order].tolist()
    assert l.tolist() == dls[order].tolist()


# --- build ------------------------------------------------------------------


def test_build_postings_no_duplicate_terms_across_batches(spark):
    # force tiny Arrow batches so term groups straddle batch
    # boundaries — the carry-over in _enc must still emit one row per
    # term (this exact split produced duplicate rows pre-fix)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, "10000")
    spark.conf.set(key, "7")
    try:
        docs = spark.createDataFrame(
            [(i, "alpha beta " + ("hot " * 5)) for i in range(200)],
            "doc_id long, text string",
        )
        p = ix.build_postings(docs).collect()
    finally:
        spark.conf.set(key, old)
    terms = [r.term for r in p]
    assert sorted(terms) == sorted(set(terms)) == ["alpha", "beta", "hot"]
    by = {r.term: r for r in p}
    assert by["hot"].df == 200
    d, t, l = ix._decode_postings(bytes(by["hot"].postings))
    assert d.tolist() == list(range(200))
    assert t.tolist() == [5] * 200
    assert l.tolist() == [7] * 200  # alpha beta hot*5


def test_max_df_drops_stop_terms(spark):
    docs = spark.createDataFrame(
        [(i, "stopword " + f"rare{i}") for i in range(100)],
        "doc_id long, text string",
    )
    terms = {r.term for r in ix.build_postings(docs, max_df=0.5).collect()}
    assert "stopword" not in terms and "rare0" in terms and len(terms) == 100


# --- search: artifact equals corpus-side BM25 --------------------------------


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("invidx") / "postings")
    docs = spark.read.parquet(DOCS).select("doc_id", "text")
    ix.write_index(docs, path, n_shards=4)
    return path


def test_search_matches_bm25_topk(spark, index_path):
    docs = spark.read.parquet(DOCS).select("doc_id", "text")
    qs = spark.createDataFrame(QUERIES, "query_id int, query string")
    want = sorted(
        (r.query_id, r.doc_id, round(r.score, 9), r.n_terms_hit, r.rank)
        for r in tx.bm25_topk(docs, qs, k=7).collect()
    )
    got = sorted(
        (r.query_id, r.doc_id, round(r.score, 9), r.n_terms_hit, r.rank)
        for r in ix.search_index(spark, index_path, QUERIES, k=7).collect()
    )
    assert got == want and len(got) > 0


def test_empty_docs_excluded_from_stats_like_bm25(spark, tmp_path):
    # bm25_topk's N/avgdl come from the explode and never see empty
    # docs; the manifest stats must match or idf/length-norm drift
    docs = spark.createDataFrame(
        [(0, "apple banana"), (1, ""), (2, "   "), (3, "apple cherry date")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    man = ix.write_index(docs, path, n_shards=2)
    assert man["stats"]["n_docs"] == 2
    assert man["stats"]["avgdl"] == 2.5
    qs = [(1, "apple date")]
    qdf = spark.createDataFrame(qs, "query_id int, query string")
    want = sorted(
        (r.query_id, r.doc_id, round(r.score, 9), r.n_terms_hit, r.rank)
        for r in tx.bm25_topk(docs, qdf, k=3).collect()
    )
    got = sorted(
        (r.query_id, r.doc_id, round(r.score, 9), r.n_terms_hit, r.rank)
        for r in ix.search_index(spark, path, qs, k=3).collect()
    )
    assert got == want


def test_search_prunes_shards(spark, index_path):
    man = ix.index_stats(index_path)
    assert len(man["shards"]) == 4
    # a term lexically below every shard's min reads NOTHING
    out = ix.search_index(spark, index_path, [(1, "\x01")], k=5)
    assert out.count() == 0
    # a real single term only scans shards whose span covers it
    term = "the"
    covering = {
        name
        for name, s in man["shards"].items()
        if s["min"] <= term <= s["max"]
    }
    q = ix.search_index(spark, index_path, [(1, term)], k=5)
    used = {f.split("/")[-1] for f in q.inputFiles()}
    assert used and used <= covering


def test_search_plan_pushes_term_filter(spark, index_path):
    q = ix.search_index(spark, index_path, [(1, "the data")], k=5)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "term" in plan


def test_empty_and_missing_terms(spark, index_path):
    out = ix.search_index(spark, index_path, [(9, "zqxjkwv-none")], k=3)
    assert out.count() == 0
    out2 = ix.search_index(spark, index_path, [(9, "   ")], k=3)
    assert out2.count() == 0
    assert out2.columns == ["query_id", "doc_id", "score", "n_terms_hit", "rank"]
