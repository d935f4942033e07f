"""Crawl-frontier scheduling (functions/frontier.py)."""

import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.frontier import frontier_schedule


def test_schedule_dedup_priority_waves(spark):
    links = spark.createDataFrame(
        [("https://A.com/x#frag", 0.9),   # alias of /x — dedup, best pri
         ("https://a.com/x", 0.1),
         ("https://a.com/y", 0.5),
         ("https://a.com/z", 0.7),
         ("https://b.net/only", 0.2),
         ("ftp://a.com/skip", 1.0)],      # non-http dropped
        "url string, pri double")
    got = {r["url"]: r for r in frontier_schedule(
        links, priority_col="pri").collect()}
    assert set(got) == {"https://a.com/x", "https://a.com/y",
                        "https://a.com/z", "https://b.net/only"}
    a = {u: (r["priority"], r["wave"]) for u, r in got.items()
         if r["host"] == "a.com"}
    # alias kept the max priority; waves order by priority desc
    assert a["https://a.com/x"] == (0.9, 0)
    assert a["https://a.com/z"] == (0.7, 1)
    assert a["https://a.com/y"] == (0.5, 2)
    assert got["https://b.net/only"]["wave"] == 0  # waves are per host


def test_schedule_seen_robots_and_cap(spark):
    from xarray_spatial_spark.functions.robots import robots_rules

    links = spark.createDataFrame(
        [(f"https://h.com/p{i}", float(i)) for i in range(6)]
        + [("https://h.com/private/x", 99.0)],
        "url string, pri double")
    seen = spark.createDataFrame(
        [("https://h.com/p5#old",)], "url string")  # alias of p5
    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string")
    got = frontier_schedule(
        links, priority_col="pri", seen=seen,
        rules=robots_rules(robots), max_per_host=3).collect()
    # p5 seen, /private/ disallowed, then top 3 by priority
    assert {(r["url"], r["wave"]) for r in got} == {
        ("https://h.com/p4", 0), ("https://h.com/p3", 1),
        ("https://h.com/p2", 2)}


def test_schedule_wave_is_one_per_host(spark):
    links = spark.createDataFrame(
        [(f"https://h{i % 7}.com/p{i}", float(i % 13)) for i in range(150)],
        "url string, pri double")
    out = frontier_schedule(links, priority_col="pri", max_per_host=10)
    per_wave_host = (out.groupBy("wave", "host")
                     .count().agg(F.max("count")).collect()[0][0])
    assert per_wave_host == 1
    assert out.agg(F.max("wave")).collect()[0][0] <= 9


def test_schedule_default_priority_deterministic(spark):
    links = spark.createDataFrame(
        [("https://h.com/b",), ("https://h.com/a",), ("https://h.com/a",)],
        "url string")
    got = sorted((r["url"], r["wave"])
                 for r in frontier_schedule(links).collect())
    # no priority column: ties break on url lexically
    assert got == [("https://h.com/a", 0), ("https://h.com/b", 1)]


class TestRevisit:
    def _history(self, spark):
        # 6 captures each, 1 day apart: urlA changes every capture,
        # urlB never, urlC every second capture
        rows = []
        for i in range(6):
            ts = f"2026-01-{i + 1:02d} 00:00:00"
            rows.append(("a", ts, f"fp{i}"))
            rows.append(("b", ts, "fp"))
            rows.append(("c", ts, f"fp{i // 2}"))
        return spark.createDataFrame(
            rows, "url string, warc_ts string, fingerprint string"
        ).select("url", F.col("warc_ts").cast("timestamp").alias("warc_ts"),
                 "fingerprint")

    def test_change_rate_closed_form(self, spark):
        import math

        from xarray_spatial_spark.functions.frontier import change_rate

        got = {r["url"]: r for r in change_rate(self._history(spark)).collect()}
        assert set(got) == {"a", "b", "c"}
        for u, x in (("a", 5), ("b", 0), ("c", 2)):
            r = got[u]
            assert r["n_intervals"] == 5 and r["n_changes"] == x
            assert r["mean_interval_s"] == 86400.0
            want = -math.log((5 - x + 0.5) / 5.5)
            assert r["rate_per_day"] == pytest.approx(want, rel=1e-9)
        assert got["a"]["rate_per_day"] > got["c"]["rate_per_day"] > 0
        assert got["b"]["rate_per_day"] == 0.0

    def test_single_capture_urls_excluded(self, spark):
        from xarray_spatial_spark.functions.frontier import change_rate

        h = spark.createDataFrame(
            [("solo", "2026-01-01 00:00:00", "x")],
            "url string, warc_ts string, fingerprint string"
        ).select("url", F.col("warc_ts").cast("timestamp").alias("warc_ts"),
                 "fingerprint")
        assert change_rate(h).count() == 0

    def test_schedule_budget_and_abandonment(self, spark):
        import numpy as np

        from xarray_spatial_spark.functions.frontier import revisit_schedule

        # 100 slow (0.1/day), 100 medium (1/day), 100 frantic (200/day)
        rows = ([("s%d" % i, 0.1) for i in range(100)]
                + [("m%d" % i, 1.0) for i in range(100)]
                + [("f%d" % i, 200.0) for i in range(100)])
        rates = spark.createDataFrame(rows, "url string, rate_per_day double")
        got = revisit_schedule(rates, budget_per_day=150.0).collect()
        by = {}
        for r in got:
            by.setdefault(r["rate_per_day"], []).append(r)
        total = sum(r["revisit_per_day"] for r in got)
        assert total == pytest.approx(150.0, rel=0.01)
        f_slow = by[0.1][0]["revisit_per_day"]
        f_med = by[1.0][0]["revisit_per_day"]
        f_fast = by[200.0][0]["revisit_per_day"]
        # the classic Cho result: under a tight budget the optimal
        # policy ABANDONS the frantic changers
        assert f_fast == 0.0
        assert f_med > 0 and f_slow > 0
        # and it beats proportional-to-rate allocation on total freshness
        def fresh(lam, f):
            if f <= 0:
                return 0.0
            r = lam / f
            return (1 - np.exp(-r)) / r
        opt = sum(fresh(r["rate_per_day"], r["revisit_per_day"]) for r in got)
        lam_sum = 100 * (0.1 + 1.0 + 200.0)
        prop = sum(100 * fresh(l, 150.0 * l / lam_sum)
                   for l in (0.1, 1.0, 200.0))
        assert opt > prop * 1.5

    def test_schedule_zero_rate_rows_get_zero(self, spark):
        from xarray_spatial_spark.functions.frontier import revisit_schedule

        rates = spark.createDataFrame(
            [("a", 0.0), ("b", 2.0)], "url string, rate_per_day double")
        got = {r["url"]: r for r in
               revisit_schedule(rates, budget_per_day=5.0).collect()}
        assert got["a"]["revisit_per_day"] == 0.0
        assert got["b"]["revisit_per_day"] == pytest.approx(5.0, rel=0.01)

    def test_schedule_rejects_bad_budget(self, spark):
        from xarray_spatial_spark.functions.frontier import revisit_schedule

        rates = spark.createDataFrame([("a", 1.0)],
                                      "url string, rate_per_day double")
        with pytest.raises(ValueError, match="positive"):
            revisit_schedule(rates, budget_per_day=0.0)

    def test_never_changing_pages_are_fresh_at_zero_cost(self, spark):
        from xarray_spatial_spark.functions.frontier import revisit_schedule

        rates = spark.createDataFrame(
            [("still", 0.0), ("busy", 4.0)], "url string, rate_per_day double")
        got = {r["url"]: r for r in
               revisit_schedule(rates, budget_per_day=8.0).collect()}
        assert got["still"]["revisit_per_day"] == 0.0
        assert got["still"]["freshness"] == 1.0
        assert got["busy"]["freshness"] > 0.5


class TestPlanNextRound:
    def test_composed_plan(self, spark, tmp_path):
        from xarray_spatial_spark.functions.frontier import plan_next_round
        from xarray_spatial_spark.streaming.frontier import change_rate_sink

        # standing revisit state: d0 drifts every capture, d1 never
        caps = []
        for i in range(4):
            ts = f"2026-03-{i + 1:02d} 00:00:00"
            caps.append(("https://old.org/d0", ts, f"v{i}"))
            caps.append(("https://old.org/d1", ts, "v"))
        hist = spark.createDataFrame(
            caps, "url string, warc_ts string, fingerprint string"
        ).selectExpr("url", "CAST(warc_ts AS TIMESTAMP) AS warc_ts",
                     "fingerprint")
        state = str(tmp_path / "state")
        change_rate_sink(state)(hist, batch_id=0)

        links = spark.createDataFrame(
            [("https://new.org/a",), ("https://new.org/b",),
             ("https://new.org/blocked",), ("https://seen.org/x",)],
            "url string")
        seen = spark.createDataFrame([("https://seen.org/x",)], "url string")
        robots = spark.createDataFrame(
            [("new.org", "User-agent: *\nDisallow: /blocked\nCrawl-delay: 3"),
             ("old.org", "User-agent: *\nDisallow:")],
            "host string, robots_txt string")

        plan = plan_next_round(
            spark, links, revisit_state=state, robots=robots, seen=seen,
            revisit_budget_per_day=10.0)
        rows = {r["url"]: r for r in plan.collect()}
        # discovery minus seen minus robots-blocked
        assert "https://seen.org/x" not in rows
        assert "https://new.org/blocked" not in rows
        assert rows["https://new.org/a"]["kind"] == "discover"
        # the drifting url is due; the static one needs no revisit
        assert rows["https://old.org/d0"]["kind"] == "revisit"
        assert rows["https://old.org/d0"]["priority"] > 0
        assert "https://old.org/d1" not in rows
        # timeline: new.org waves 3 s apart, default 1 s elsewhere
        a, b = (rows["https://new.org/a"], rows["https://new.org/b"])
        assert {a["wave"], b["wave"]} == {0, 1}
        assert abs(max(a["fetch_at_s"], b["fetch_at_s"]) - 3.0) < 1e-9
        assert rows["https://old.org/d0"]["fetch_at_s"] == 0.0
