"""As-of join + interval join (plans/asof.py): semantics vs pandas
merge_asof / brute force, inclusivity, tolerance, determinism under
duplicate right timestamps, and plan shape (hash join, never
BroadcastNestedLoop)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.plans.asof import asof_join, interval_join


def _left(spark):
    return spark.createDataFrame(
        [("a", 5, "l1"), ("a", 10, "l2"), ("a", 3, "l3"), ("b", 7, "l4")],
        "host string, ts long, lv string",
    )


def _right(spark):
    return spark.createDataFrame(
        [("a", 4, "r4"), ("a", 10, "r10"), ("b", 9, "r9")],
        "host string, ts long, rv string",
    )


def test_backward_basic(spark):
    out = asof_join(_left(spark), _right(spark), on="ts", by="host")
    got = {(r.host, r.ts): (r.ts_r, r.rv) for r in out.collect()}
    assert got == {
        ("a", 5): (4, "r4"),
        ("a", 10): (10, "r10"),  # exact match inclusive
        ("a", 3): (None, None),  # nothing at-or-before
        ("b", 7): (None, None),
    }


def test_inner_drops_unmatched(spark):
    out = asof_join(_left(spark), _right(spark), on="ts", by="host", how="inner")
    assert sorted((r.host, r.ts) for r in out.collect()) == [("a", 5), ("a", 10)]


def test_forward(spark):
    out = asof_join(
        _left(spark), _right(spark), on="ts", by="host", direction="forward"
    )
    got = {(r.host, r.ts): r.ts_r for r in out.collect()}
    assert got == {("a", 5): 10, ("a", 10): 10, ("a", 3): 4, ("b", 7): 9}


def test_tolerance(spark):
    out = asof_join(
        _left(spark), _right(spark), on="ts", by="host", tolerance=1
    )
    got = {(r.host, r.ts): r.ts_r for r in out.collect()}
    assert got == {("a", 5): 4, ("a", 10): 10, ("a", 3): None, ("b", 7): None}


def test_duplicate_right_ts_deterministic(spark):
    right = spark.createDataFrame(
        [("a", 4, "x"), ("a", 4, "z"), ("a", 4, "y")],
        "host string, ts long, rv string",
    )
    out = asof_join(_left(spark), right, on="ts", by="host")
    got = {r.ts: r.rv for r in out.collect() if r.host == "a"}
    # struct-max dedup: the lexically largest payload wins, always
    assert got == {5: "z", 10: "z", 3: None}


def test_no_by_key(spark):
    left = spark.createDataFrame([(5,), (1,)], "ts long")
    right = spark.createDataFrame([(2, 9.5)], "ts long, v double")
    got = {r.ts: (r.ts_r, r.v) for r in asof_join(left, right).collect()}
    assert got == {5: (2, 9.5), 1: (None, None)}


def test_collision_suffix(spark):
    left = spark.createDataFrame([("a", 5, 1.0)], "host string, ts long, v double")
    right = spark.createDataFrame([("a", 4, 2.0)], "host string, ts long, v double")
    out = asof_join(left, right, on="ts", by="host")
    assert set(out.columns) == {"host", "ts", "v", "ts_r", "v_r"}
    r = out.collect()[0]
    assert (r.v, r.v_r, r.ts_r) == (1.0, 2.0, 4)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_matches_pandas_merge_asof(spark, direction):
    rng = np.random.default_rng(17)
    lpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 300).astype(str),
            "ts": rng.integers(0, 1000, 300),
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200).astype(str),
            "ts": rng.choice(1000, 200, replace=False),  # unique per key
            "val": rng.normal(size=200).round(6),
        }
    )
    want = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rpdf.sort_values("ts", kind="stable"),
        on="ts",
        by="k",
        direction=direction,
    )
    out = asof_join(
        spark.createDataFrame(lpdf, "k string, ts long"),
        spark.createDataFrame(rpdf, "k string, ts long, val double"),
        on="ts",
        by="k",
        direction=direction,
    ).toPandas()
    a = sorted(
        (r.k, r.ts, None if pd.isna(r.val) else r.val)
        for r in want.itertuples()
    )
    b = sorted(
        (r.k, r.ts, None if pd.isna(r.val) else r.val)
        for r in out.itertuples()
    )
    assert a == b


def test_asof_plan_no_join(spark):
    plan = (
        asof_join(_left(spark), _right(spark), on="ts", by="host")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoop" not in plan and "Join" not in plan
    assert plan.count("Exchange") == 1  # one hash exchange for the window


# --- interval join -----------------------------------------------------------


def _ivals(spark):
    return spark.createDataFrame(
        [(0, 10, "A"), (5, 5, "B"), (100, 200, "C")],
        "lo long, hi long, tag string",
    )


def test_interval_basic_inclusive(spark):
    pts = spark.createDataFrame([(0,), (5,), (10,), (11,), (200,)], "p long")
    out = interval_join(pts, _ivals(spark), "p", bin_width=4)
    got = sorted((r.p, r.tag) for r in out.collect())
    assert got == [(0, "A"), (5, "A"), (5, "B"), (10, "A"), (200, "C")]


def test_interval_left_outer(spark):
    pts = spark.createDataFrame([(5,), (50,)], "p long")
    out = interval_join(pts, _ivals(spark), "p", bin_width=8, how="left")
    got = sorted([(r.p, r.tag) for r in out.collect()], key=str)
    assert (50, None) in got and (5, "A") in got and (5, "B") in got


def test_interval_by_key_and_negative(spark):
    pts = spark.createDataFrame([("h1", -3), ("h2", -3)], "host string, p long")
    ivl = spark.createDataFrame(
        [("h1", -5, 0, "neg")], "host string, lo long, hi long, tag string"
    )
    out = interval_join(pts, ivl, "p", by="host", bin_width=4)
    assert [(r.host, r.p, r.tag) for r in out.collect()] == [("h1", -3, "neg")]


def test_interval_matches_brute_force(spark):
    rng = np.random.default_rng(23)
    pvals = rng.integers(0, 5000, 400)
    los = rng.integers(0, 5000, 120)
    lens = rng.integers(0, 300, 120)
    pts = spark.createDataFrame([(int(v),) for v in pvals], "p long")
    ivl = spark.createDataFrame(
        [(int(l), int(l + d), i) for i, (l, d) in enumerate(zip(los, lens))],
        "lo long, hi long, iid int",
    )
    got = sorted((r.p, r.iid) for r in interval_join(pts, ivl, "p", bin_width=64).collect())
    want = sorted(
        (int(p), i)
        for p in pvals
        for i, (l, d) in enumerate(zip(los, lens))
        if l <= p <= l + d
    )
    assert got == want and len(want) > 100


def test_interval_plan_is_hash_join(spark):
    pts = spark.createDataFrame([(5,)], "p long")
    plan = (
        interval_join(pts, _ivals(spark), "p")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoop" not in plan


def test_interval_validation(spark):
    pts = spark.createDataFrame([(5, "x")], "p long, tag string")
    with pytest.raises(ValueError, match="ambiguous"):
        interval_join(pts, _ivals(spark), "p")
    with pytest.raises(ValueError, match="bin_width"):
        interval_join(
            pts.select("p"), _ivals(spark), "p", bin_width=0
        )
