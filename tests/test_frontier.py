"""Crawl-frontier scheduling (functions/frontier.py)."""

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
