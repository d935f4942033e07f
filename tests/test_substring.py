"""Exact substring dedup (functions/substring.py): both physical
strategies against a brute-force Python reference, anchored == exact
equality, span-removal semantics, and the scale-shape plan pins."""

import random

import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.functions import substring as ss


def _brute_spans(docs: dict[int, str], L: int) -> list[tuple[int, int, int]]:
    """(id, start, end) of maximal duplicated spans: union of coverage
    of L-grams (exact text) occurring >= 2 times over all positions."""
    from collections import Counter

    grams = Counter()
    for t in docs.values():
        if t is None:
            continue
        for i in range(len(t) - L + 1):
            grams[t[i:i + L]] += 1
    out = []
    for did, t in docs.items():
        if t is None:
            continue
        cur = None
        for i in range(len(t) - L + 1):
            if grams[t[i:i + L]] < 2:
                continue
            if cur is not None and i <= cur[1]:
                cur = (cur[0], i + L)
            else:
                if cur is not None:
                    out.append((did, cur[0], cur[1]))
                cur = (i, i + L)
        if cur is not None:
            out.append((did, cur[0], cur[1]))
    return sorted(out)


def _got_spans(spark, docs, L, anchored):
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    rows = ss.duplicated_spans(df, min_len=L, anchored=anchored).collect()
    return sorted((r["doc_id"], r["span_start"], r["span_end"]) for r in rows)


def _word_soup(rng, n_words):
    vocab = ["alpha", "bravo", "car", "delta", "echo", "fox", "golf",
             "hotel", "india", "jazz", "kilo", "lima"]
    return " ".join(rng.choice(vocab) for _ in range(n_words))


@pytest.mark.parametrize("anchored", [False, True])
def test_planted_cross_doc_span(spark, anchored):
    shared = "zebra quilt foxtrot jasper wick " * 3  # 96 chars
    docs = {1: "alpha start " + shared + " tail one",
            2: "totally different middle " + shared + " other end",
            3: "no duplicates in this one at all nothing repeats here"}
    exp = _brute_spans(docs, 40)
    assert _got_spans(spark, docs, 40, anchored) == exp
    # the planted passage itself is covered in both docs
    assert {d for d, _, _ in exp} == {1, 2}


@pytest.mark.parametrize("anchored", [False, True])
def test_intra_doc_repeat_and_overlaps(spark, anchored):
    block = "pqrs tuvw xyza bcde fghi " * 2  # 50 chars, self-similar
    docs = {6: "selfrepeat " + block + "and " + block,
            7: "padding so the corpus is not a single document xyz"}
    assert _got_spans(spark, docs, 40, anchored) == _brute_spans(docs, 40)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_corpus_matches_brute_force(spark, seed):
    """Word soup from a 12-word vocabulary repeats short phrases
    naturally; L small enough that organic duplicates appear."""
    rng = random.Random(seed)
    docs = {i: _word_soup(rng, rng.randint(5, 60)) for i in range(30)}
    docs[30] = None
    docs[31] = ""
    docs[32] = "tiny"
    exp = _brute_spans(docs, 20)
    assert exp, "degenerate test: no organic duplicates"
    assert _got_spans(spark, docs, 20, False) == exp
    assert _got_spans(spark, docs, 20, True) == exp


@pytest.mark.parametrize("seed", [3, 4])
def test_anchored_equals_exact_with_long_spans(spark, seed):
    """Long planted spans (many windows deep) + organic noise: the
    winnowing prefilter must reproduce the exact mode bit-for-bit."""
    rng = random.Random(seed)
    planted = _word_soup(rng, 40)  # ~200 chars
    docs = {i: _word_soup(rng, rng.randint(20, 80)) for i in range(20)}
    docs[100] = _word_soup(rng, 10) + " " + planted + " " + _word_soup(rng, 10)
    docs[101] = planted + " " + _word_soup(rng, 30)
    docs[102] = _word_soup(rng, 30) + " " + planted
    a = _got_spans(spark, docs, 35, False)
    b = _got_spans(spark, docs, 35, True)
    assert a == b == _brute_spans(docs, 35)
    assert any(d == 101 for d, _, _ in a)


def test_no_duplicates_and_short_docs(spark):
    docs = {1: "completely unique text with no repeats anywhere at all",
            2: "another entirely different string of words here",
            3: "", 4: None, 5: "short"}
    assert _got_spans(spark, docs, 40, False) == []
    assert _got_spans(spark, docs, 40, True) == []


@pytest.mark.parametrize("anchored", [False, True])
def test_remove_duplicated_spans(spark, anchored):
    shared = "zebra quilt foxtrot jasper wick " * 3
    docs = {1: "alpha start " + shared + " tail one",
            2: "totally different middle " + shared + " other end",
            3: "untouched document stays byte identical",
            4: None}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r["doc_id"]: r["clean_text"]
           for r in ss.remove_duplicated_spans(
               df, min_len=40, anchored=anchored).collect()}
    spans = {}
    for d, s, e in _brute_spans(docs, 40):
        spans.setdefault(d, []).append((s, e))
    for did, t in docs.items():
        if t is None:
            assert got[did] is None
            continue
        keep, cur = [], 0
        for s, e in sorted(spans.get(did, [])):
            keep.append(t[cur:s])
            cur = e
        keep.append(t[cur:])
        assert got[did] == "".join(keep), did
    assert got[3] == docs[3]


def test_winnow_covers_every_window():
    """Classic winnowing invariant: every w-window of k-gram indices
    contains a selected index; selection inside a window is a pure
    function of the window's hashes."""
    import numpy as np

    rng = np.random.default_rng(7)
    for _ in range(20):
        m, w = int(rng.integers(1, 200)), int(rng.integers(2, 30))
        kh = rng.integers(0, 50, size=m).astype(np.uint64)  # many ties
        sel = set(ss._winnow(kh, w).tolist())
        assert sel
        if m > w:
            for i in range(m - w + 1):
                assert sel & set(range(i, i + w)), (m, w, i)


def test_plan_shape(spark):
    """Scale pins: no global sort, no cartesian product, and the
    exact mode's count-by-hash aggregates partially before its
    exchange (map-side combine)."""
    df = spark.createDataFrame(
        [(i, "words repeat words repeat words repeat here") for i in range(4)],
        "doc_id long, text string")
    plan = (ss.duplicated_spans(df, min_len=20, anchored=False)
            ._jdf.queryExecution().executedPlan().toString())
    assert "rangepartitioning" not in plan
    assert "Cartesian" not in plan
    assert "partial_count" in plan
