"""Winnowing fingerprints: alignment-robust detection guarantee,
density, and candidate generation."""

from pyspark.sql import functions as F

from xarray_spatial_spark.functions.dedup import (
    _winnow_doc,
    winnow_candidates,
    winnow_fingerprints,
)


def test_guarantee_any_alignment():
    """A shared run of exactly k + w - 1 tokens must yield >= 1
    identical fingerprint hash at EVERY relative alignment — the
    property that killed document-aligned striding."""
    k, w = 5, 8
    run = [f"r{i}" for i in range(k + w - 1)]
    base = dict(_winnow_doc([f"a{i}" for i in range(3)] + run, k, w))
    base_hashes = set(base.values())
    for off in range(10):
        pre = [f"b{off}x{i}" for i in range(off)]
        other = dict(_winnow_doc(pre + run + ["tail0", "tail1"], k, w))
        assert base_hashes & set(other.values()), f"alignment {off} missed"


def test_shorter_run_than_floor_may_miss_but_equal_docs_match():
    k, w = 5, 8
    toks = [f"t{i}" for i in range(40)]
    a = _winnow_doc(toks, k, w)
    b = _winnow_doc(list(toks), k, w)
    assert a == b  # determinism: identical docs -> identical prints


def test_density_approx_2_over_w1():
    import zlib  # noqa: F401 (document the hash dependency)

    k, w = 8, 16
    toks = [f"z{i * 2654435761 % 1000003}" for i in range(5000)]
    fps = _winnow_doc(toks, k, w)
    m = len(toks) - k + 1
    frac = len(fps) / m
    assert 1.0 / (w + 1) < frac < 4.0 / (w + 1), frac


def test_short_doc_one_fingerprint():
    k, w = 5, 8
    toks = [f"s{i}" for i in range(7)]  # m = 3 < w
    fps = _winnow_doc(toks, k, w)
    assert len(fps) == 1
    assert _winnow_doc(["x"] * 2, k, w) == []  # shorter than k


def test_distributed_fingerprints_and_candidates(spark):
    run = " ".join(f"c{i}" for i in range(12))  # k+w-1 = 12
    rows = [
        (0, f"{run} u0a u0b u0c"),
        (1, f"v1a v1b {run}"),
        (2, "nothing shared with anyone here at all ok fine"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=5, w=8)
    assert fps.columns == ["doc_id", "pos", "fp"]
    cands = winnow_candidates(df, k=5, w=8).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in cands}
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


def test_candidates_shuffle_is_fingerprint_scale(spark):
    """The join operates on the winnowed projection only — no text
    column survives into the exchange."""
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(60))) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plan = winnow_candidates(df, k=5, w=8)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "text" not in plan.split("MapInPandas")[0], (
        "text column leaked past the fingerprint pass")
