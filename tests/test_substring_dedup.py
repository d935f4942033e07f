"""Exact duplicate-substring spans (distributed rolling-window
re-expression of suffix-array dedup)."""

from pyspark.sql import functions as F

from xarray_spatial_spark.functions.dedup import (
    duplicate_spans,
    remove_duplicate_spans,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _toks(s):
    return s.split()


BOILER = "all rights reserved contact us terms of service apply here"  # 10


def test_planted_shared_span_found_first_kept(spark):
    """One 10-token chunk planted in 3 docs at different offsets: the
    first occurrence (min doc, min pos) is kept, the other two are
    reported with exact token offsets."""
    rows = [
        (0, f"alpha beta {BOILER} gamma delta"),
        (1, f"one two three four {BOILER}"),
        (2, f"{BOILER} tail words here"),
        (3, "totally unrelated text with nothing repeated at all ok"),
    ]
    got = {
        (r["doc_id"], r["start_tok"], r["end_tok"])
        for r in duplicate_spans(_df(spark, rows), k=8).collect()
    }
    # doc 0 pos 2 is the global owner; docs 1 (pos 4) and 2 (pos 0) flagged
    assert got == {(1, 4, 14), (2, 0, 10)}


def test_keep_first_false_reports_all_occurrences(spark):
    rows = [
        (0, f"alpha beta {BOILER} gamma delta"),
        (1, f"one two three four {BOILER}"),
    ]
    got = {
        (r["doc_id"], r["start_tok"], r["end_tok"])
        for r in duplicate_spans(
            _df(spark, rows), k=8, keep_first=False
        ).collect()
    }
    assert got == {(0, 2, 12), (1, 4, 14)}


def test_intra_document_repeat_found(spark):
    """A doc repeating its own chunk: second copy flagged."""
    chunk = "x1 x2 x3 x4 x5 x6 x7 x8"
    rows = [(7, f"{chunk} middle filler words {chunk}")]
    got = duplicate_spans(_df(spark, rows), k=8).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_id"], r["start_tok"], r["end_tok"]) == (7, 11, 19)


def test_adjacent_windows_merge_into_maximal_span(spark):
    """A 14-token duplicate run with k=8 -> 7 overlapping windows ->
    ONE merged span covering all 14 tokens."""
    run = " ".join(f"r{i}" for i in range(14))
    rows = [(0, f"{run} end"), (1, f"start {run}")]
    got = duplicate_spans(_df(spark, rows), k=8).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_id"], r["start_tok"], r["end_tok"]) == (1, 1, 15)
    assert r["n_windows"] == 7


def test_unaligned_copies_always_caught(spark):
    """Exactness at k granularity: copies at ANY relative offset are
    caught (this is the case that killed the rejected stride knob —
    offsets 0 and 3 never sample the same window under stride 4)."""
    run = " ".join(f"s{i}" for i in range(11))
    rows = [(0, f"{run} pad0 pad1"), (1, f"p0 p1 p2 {run}")]
    got = duplicate_spans(_df(spark, rows), k=8).collect()
    assert {r["doc_id"] for r in got} == {1}
    r = got[0]
    assert (r["start_tok"], r["end_tok"]) == (3, 14)


def test_hot_boilerplate_many_docs(spark):
    """The same sentence on 200 'pages' (hot hash): every non-owner
    occurrence flagged; count agg collapses map-side (no list blowup)."""
    rows = [(i, f"u{i}a u{i}b u{i}c {BOILER}") for i in range(200)]
    got = duplicate_spans(_df(spark, rows), k=10).collect()
    assert len(got) == 199  # all but the owner (doc 0)
    assert all(r["end_tok"] - r["start_tok"] == 10 for r in got)


def test_remove_duplicate_spans_text(spark):
    rows = [
        (0, f"alpha beta {BOILER} gamma delta"),
        (1, f"one two three four {BOILER}"),
        (2, f"{BOILER} tail words here"),
        (3, "short untouched doc"),
    ]
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(_df(spark, rows), k=8).collect()
    }
    assert out[0] == rows[0][1]  # owner keeps its copy
    assert out[1] == "one two three four"
    assert out[2] == "tail words here"
    assert out[3] == "short untouched doc"


def test_no_duplicates_no_spans(spark):
    rows = [(i, " ".join(f"u{i}w{j}" for j in range(30))) for i in range(5)]
    assert duplicate_spans(_df(spark, rows), k=8).count() == 0


def test_islands_groupby_reuses_window_partitioning(spark):
    """The islands groupBy(doc, _g) must NOT add an exchange after the
    window's hash partitioning on doc."""
    rows = [(0, f"alpha beta {BOILER} g"), (1, f"x y z w {BOILER}")]
    plan = duplicate_spans(_df(spark, rows), k=8)._jdf.queryExecution(
    ).executedPlan().toString()
    import re

    n_exchange = len(re.findall(r"Exchange hashpartitioning", plan))
    # one for the hash-count agg, one for the join back, one for the
    # doc window — and NONE extra for the final groupBy
    assert n_exchange <= 3, plan
