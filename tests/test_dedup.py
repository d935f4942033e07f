"""Dedup family: planted duplicates, python-oracle Jaccard, LSH recall."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.functions import dedup


@pytest.fixture()
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",   # near-dup of 0
        "a completely different document about spark engines",
        "the quick brown fox jumps over the lazy dog",   # exact dup of 0
        "another unrelated text concerning raster tiles",
        "a completely different document about spark engine",  # near-dup of 2
    ]
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(base)), "text": base})
    )


def test_exact_duplicates(docs):
    got = dedup.exact_duplicates(docs).collect()
    assert len(got) == 1
    assert got[0]["n_dups"] == 2 and got[0]["doc_ids"] == [0, 3]


def test_distinct_by_text(docs):
    kept = dedup.distinct_by_text(docs)
    assert kept.count() == 5
    assert kept.filter("doc_id = 3").count() == 0  # rep is smallest id


def _py_jaccard(a: str, b: str, k: int) -> float:
    sa = {a[i:i + k] for i in range(len(a) - k + 1)}
    sb = {b[i:i + k] for i in range(len(b) - k + 1)}
    return len(sa & sb) / len(sa | sb)


def test_ngram_jaccard_pairs_matches_python(docs):
    rows = docs.orderBy("doc_id").collect()
    texts = {r["doc_id"]: r["text"] for r in rows}
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, k=5, threshold=0.5).collect()
    }
    # oracle: all pairs >= 0.5 by python sets
    want = {}
    ids = sorted(texts)
    for i in ids:
        for j in ids:
            if i < j:
                sim = _py_jaccard(texts[i], texts[j], 5)
                if sim >= 0.5:
                    want[(i, j)] = sim
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p])
    assert (0, 1) in got and (2, 5) in got and (0, 3) in got


def test_minhash_signatures_estimate_jaccard(docs):
    sigs = {r["doc_id"]: r["sig"] for r in
            dedup.minhash_signatures(docs, num_hashes=128, k=5).collect()}
    est = np.mean(np.array(sigs[0]) == np.array(sigs[1]))
    true = _py_jaccard(
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat", 5)
    assert abs(est - true) < 0.15  # 128 hashes -> ~0.04 std
    # exact dups -> identical signatures
    assert sigs[0] == sigs[3]


def test_minhash_dedup_pairs_finds_neardups(docs):
    pairs = dedup.minhash_dedup_pairs(
        docs, threshold=0.6, num_hashes=64, bands=16, k=5
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 3) in got  # exact
    assert (0, 1) in got  # near
    assert (2, 5) in got  # near
    assert (0, 2) not in got and (0, 4) not in got


def test_simhash_duplicates(docs):
    got = dedup.simhash_duplicates(docs).collect()
    groups = {tuple(r["doc_ids"]) for r in got}
    assert (0, 3) in groups
    # determinism across parallelism
    a = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs.repartition(1)).collect()}
    b = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs.repartition(5)).collect()}
    assert a == b


def test_embedding_neardup(spark):
    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, 16)).astype(np.float32)
    vecs = list(base)
    vecs.append(base[4] + rng.normal(scale=0.01, size=16).astype(np.float32))  # id 20 ~ id 4
    vecs.append(base[4].copy())  # id 21 == id 4
    pdf = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": [list(map(float, v)) for v in vecs]})
    df = spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in dedup.embedding_neardup_pairs(df, threshold=0.95).collect()}
    assert (4, 21) in got and got[(4, 21)] == pytest.approx(1.0)
    assert (4, 20) in got
    # random gaussian pairs in dim 16 essentially never reach 0.95
    assert all(a in (4, 20, 21) and b in (4, 20, 21) for a, b in got)


def test_minhash_fast_signatures_estimate(docs):
    sigs = {r["doc_id"]: np.array(r["sig"]) for r in
            dedup.minhash_signatures_fast(docs, num_hashes=128, k=5).collect()}
    est = np.mean(sigs[0] == sigs[1])
    true = _py_jaccard(
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat", 5)
    assert abs(est - true) < 0.15
    assert (sigs[0] == sigs[3]).all()  # exact dups -> identical signatures
    # determinism under repartitioning
    b = {r["doc_id"]: np.array(r["sig"]) for r in
         dedup.minhash_signatures_fast(docs.repartition(5), num_hashes=128, k=5).collect()}
    assert all((sigs[i] == b[i]).all() for i in sigs)


def test_minhash_dedup_fast_and_slow_agree_on_pairs(docs):
    fast = {(r["id_a"], r["id_b"]) for r in dedup.minhash_dedup_pairs(
        docs, threshold=0.6, num_hashes=64, bands=16, k=5, fast=True).collect()}
    slow = {(r["id_a"], r["id_b"]) for r in dedup.minhash_dedup_pairs(
        docs, threshold=0.6, num_hashes=64, bands=16, k=5, fast=False).collect()}
    assert fast == slow == {(0, 1), (0, 3), (1, 3), (2, 5)}
