"""Time-aware robots gating (robots.robots_filter_at): the capture in
force at fetch time governs; policy flips between snapshots change
verdicts; pre-first-capture and capture-less hosts pass; agreement
with the static robots_filter when history is trivial."""

from pyspark.sql import functions as F

from xarray_spatial_spark.functions.robots import (
    robots_filter,
    robots_filter_at,
    robots_rules,
    robots_rules_snapshots,
)

PERMISSIVE = "User-agent: *\nDisallow:\n"
BLOCK_PRIVATE = "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
BLOCK_ALL = "User-agent: *\nDisallow: /\n"


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, warc_ts long, html string")


def test_policy_flip_governs_by_fetch_time(spark):
    captures = spark.createDataFrame(
        [
            ("a.com", 100, PERMISSIVE),
            ("a.com", 200, BLOCK_PRIVATE),
            ("b.com", 150, BLOCK_ALL),
        ],
        "host string, captured_ts long, robots_txt string",
    )
    pages = _pages(
        spark,
        [
            ("http://a.com/private/x", 50, "pre-capture"),   # before any
            ("http://a.com/private/x", 150, "era-1"),        # permissive era
            ("http://a.com/private/x", 250, "era-2"),        # blocked era
            ("http://a.com/private/ok", 250, "allow-tiebreak"),
            ("http://a.com/public", 250, "unmatched-path"),
            ("http://b.com/q", 100, "pre-capture-b"),
            ("http://b.com/q", 200, "blocked-b"),
            ("http://c.com/q", 300, "no-captures"),
        ],
    )
    kept = {
        (r.url, r.warc_ts)
        for r in robots_filter_at(pages, captures).collect()
    }
    assert kept == {
        ("http://a.com/private/x", 50),
        ("http://a.com/private/x", 150),
        ("http://a.com/private/ok", 250),
        ("http://a.com/public", 250),
        ("http://b.com/q", 100),
        ("http://c.com/q", 300),
    }


def test_equals_static_filter_on_trivial_history(spark):
    """One capture per host, every fetch after it: the as-of gate must
    agree with robots_filter on the same rules."""
    bodies = spark.createDataFrame(
        [("a.com", BLOCK_PRIVATE), ("b.com", PERMISSIVE)],
        "host string, robots_txt string",
    )
    captures = bodies.select(
        "host", F.lit(0).cast("long").alias("captured_ts"), "robots_txt"
    )
    pages = _pages(
        spark,
        [
            (u, ts, "x")
            for ts in (10, 20)
            for u in (
                "http://a.com/private/z",
                "http://a.com/private/ok",
                "http://a.com/open",
                "http://b.com/anything",
            )
        ],
    )
    via_asof = sorted(
        (r.url, r.warc_ts) for r in robots_filter_at(pages, captures).collect()
    )
    via_static = sorted(
        (r.url, r.warc_ts)
        for r in robots_filter(pages, robots_rules(bodies)).collect()
    )
    assert via_asof == via_static and len(via_asof) == 6


def test_snapshot_parse_shape(spark):
    captures = spark.createDataFrame(
        [("a.com", 1, BLOCK_PRIVATE), ("a.com", 2, "")],
        "host string, captured_ts long, robots_txt string",
    )
    rows = {
        (r.host, r.captured_ts): r.rules
        for r in robots_rules_snapshots(captures).collect()
    }
    assert len(rows[("a.com", 1)]) == 2  # disallow + allow
    assert rows[("a.com", 2)] == []      # empty body -> empty rules


def test_payloads_stay_out_of_the_asof_sort(spark):
    """The window/sort side of the plan must not carry the html
    payload — decision computes on distinct keys and joins back."""
    captures = spark.createDataFrame(
        [("a.com", 1, BLOCK_ALL)],
        "host string, captured_ts long, robots_txt string",
    )
    pages = _pages(spark, [("http://a.com/x", 5, "PAYLOAD")])
    out = robots_filter_at(pages, captures)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" in plan
    # the Window operator's own argument list must not mention html
    first_window_args = plan.split("Window")[1][:200]
    assert "html" not in first_window_args
