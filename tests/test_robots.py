"""robots.txt (RFC 9309): group selection, longest-match, wildcards,
distributed filtering."""

from pyspark.sql import functions as F

from xarray_spatial_spark.functions.robots import (
    _pattern_regex,
    parse_robots_body,
    robots_filter,
    robots_rules,
)

BODY = """
# crawler policy
User-agent: *
Disallow: /private/
Allow: /private/ok.html
Disallow: /*.pdf$
Disallow:

User-agent: examplebot
User-agent: otherbot
Disallow: /only-for-example/
"""


def test_parse_groups_and_fallback():
    star = parse_robots_body(BODY, "*")
    assert ("disallow", "/private/") in star
    assert ("allow", "/private/ok.html") in star
    assert ("disallow", "/*.pdf$") in star
    assert all(p != "" for _, p in star)  # empty Disallow dropped
    # exact agent group overrides *; stacked UA lines share the group
    for agent in ("ExampleBot", "otherbot"):
        got = parse_robots_body(BODY, agent)
        assert got == [("disallow", "/only-for-example/")]
    # unknown agent falls back to *
    assert parse_robots_body(BODY, "nobody") == star


def test_pattern_regex():
    import re

    assert re.match(_pattern_regex("/private/"), "/private/x")
    assert not re.match(_pattern_regex("/private/"), "/public/x")
    assert re.match(_pattern_regex("/*.pdf$"), "/docs/a.pdf")
    assert not re.match(_pattern_regex("/*.pdf$"), "/docs/a.pdfx")
    assert re.match(_pattern_regex("/a*b"), "/aXXXb-tail")
    # regex metachars in patterns are literal
    assert re.match(_pattern_regex("/q?x=1"), "/q?x=1")
    assert not re.match(_pattern_regex("/q?x=1"), "/qx=1")


def test_filter_longest_match_and_allow_tiebreak(spark):
    robots = spark.createDataFrame(
        [("ex.com", BODY), ("open.org", "User-agent: *\nDisallow:\n")],
        "host string, robots_txt string")
    rules = robots_rules(robots)
    pages = spark.createDataFrame(
        [
            ("https://ex.com/",),                    # no rule -> allowed
            ("https://ex.com/private/secret",),      # disallow /private/
            ("https://ex.com/private/ok.html",),     # longer allow wins
            ("https://ex.com/docs/file.pdf",),       # $ anchor disallow
            ("https://ex.com/docs/file.pdf.html",),  # anchor miss -> ok
            ("https://open.org/anything",),          # empty disallow
            ("https://norules.net/x",),              # host w/o robots
        ],
        "url string")
    kept = {r["url"] for r in robots_filter(pages, rules).collect()}
    assert kept == {
        "https://ex.com/",
        "https://ex.com/private/ok.html",
        "https://ex.com/docs/file.pdf.html",
        "https://open.org/anything",
        "https://norules.net/x",
    }


def test_filter_keeps_all_page_columns_and_rows(spark):
    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /no/\n")],
        "host string, robots_txt string")
    rules = robots_rules(robots)
    pages = spark.createDataFrame(
        [(f"https://h.com/p/{i}", f"payload{i}", i) for i in range(50)]
        + [(f"https://h.com/no/{i}", "x", i) for i in range(10)],
        "url string, body string, n int")
    out = robots_filter(pages, rules)
    assert out.columns == ["url", "body", "n"]
    assert out.count() == 50
    # duplicate urls all survive (decision joins back on (host, path))
    dup = spark.createDataFrame(
        [("https://h.com/p/1", "a", 1), ("https://h.com/p/1", "b", 2)],
        "url string, body string, n int")
    assert robots_filter(dup, rules).count() == 2


def test_specific_agent_distributed(spark):
    robots = spark.createDataFrame(
        [("h.com", BODY)], "host string, robots_txt string")
    rules = robots_rules(robots, user_agent="examplebot")
    pages = spark.createDataFrame(
        [("https://h.com/private/x",), ("https://h.com/only-for-example/y",)],
        "url string")
    kept = {r["url"] for r in robots_filter(pages, rules).collect()}
    # examplebot group replaces *: /private/ is fine, its own dir is not
    assert kept == {"https://h.com/private/x"}


# ---------------------------------------------------------------------------
# sitemaps
# ---------------------------------------------------------------------------


def test_sitemap_refs(spark):
    from xarray_spatial_spark.functions.robots import sitemap_refs

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /x\n"
          "Sitemap: https://a.com/sitemap.xml\n"
          "sitemap: https://a.com/news.xml\n"),
         ("b.org", "User-agent: *\nDisallow:\n")],
        "host string, robots_txt string")
    got = {(r["host"], r["sitemap_url"])
           for r in sitemap_refs(robots).collect()}
    assert got == {("a.com", "https://a.com/sitemap.xml"),
                   ("a.com", "https://a.com/news.xml")}


SITEMAP_XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.com/p1</loc><lastmod>2026-01-05</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc> https://a.com/p2 </loc></url>
  <url><priority>0.1</priority></url>
</urlset>"""

INDEX_XML = """<sitemapindex>
  <sitemap><loc>https://a.com/s1.xml</loc></sitemap>
  <sitemap><loc>https://a.com/s2.xml</loc><lastmod>2026-02-01</lastmod></sitemap>
</sitemapindex>"""


def test_sitemap_entries_and_index(spark):
    from xarray_spatial_spark.functions.robots import sitemap_entries

    df = spark.createDataFrame(
        [("a.com", SITEMAP_XML), ("a.com", INDEX_XML)],
        "host string, xml string")
    got = sitemap_entries(df).collect()
    urls = {(r["loc"], r["is_index"]) for r in got}
    # entry with no <loc> dropped; whitespace trimmed
    assert urls == {
        ("https://a.com/p1", False), ("https://a.com/p2", False),
        ("https://a.com/s1.xml", True), ("https://a.com/s2.xml", True)}
    full = {r["loc"]: r for r in got}
    assert full["https://a.com/p1"]["lastmod"] == "2026-01-05"
    assert full["https://a.com/p1"]["changefreq"] == "daily"
    assert abs(full["https://a.com/p1"]["priority"] - 0.8) < 1e-9
    assert full["https://a.com/p2"]["lastmod"] is None
    assert full["https://a.com/s2.xml"]["lastmod"] == "2026-02-01"
    assert got[0].__fields__[:1] == ["host"]  # input columns preserved


def test_allowed_fold_matches_batch_filter(spark):
    """The streaming-safe per-host array fold (robots_allowed) gives
    the SAME verdict as batch robots_filter's max_by aggregation on a
    rule set exercising wildcards, $, allow/disallow ties and
    ruleless hosts."""
    from xarray_spatial_spark.functions.robots import (
        robots_allowed, robots_filter, robots_rules,
        robots_rules_per_host)
    from xarray_spatial_spark.functions.url import url_host

    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\n"
                   "Disallow: /private/\n"
                   "Allow: /private/ok\n"
                   "Disallow: /*.pdf$\n"
                   "Allow: /a\n"
                   "Disallow: /a\n")],  # tie -> allow wins
        "host string, robots_txt string")
    rules = robots_rules(robots)
    urls = [f"https://h.com{p}" for p in (
        "/", "/private/x", "/private/ok/y", "/doc.pdf", "/doc.pdfx",
        "/a", "/a/b", "/b")] + ["https://norules.org/x"]
    pages = spark.createDataFrame([(u,) for u in urls], "url string")

    batch_kept = {r["url"] for r in robots_filter(pages, rules).collect()}

    per_host = robots_rules_per_host(rules)
    path = F.regexp_extract(
        F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    j = (pages.withColumn("_h", url_host(F.col("url")))
         .join(per_host, F.col("_h") == per_host["host"], "left"))
    fold_kept = {r["url"] for r in j.filter(
        robots_allowed(path, F.col("rules")) == 1).collect()}

    assert fold_kept == batch_kept
    assert "https://h.com/private/ok/y" in fold_kept
    assert "https://h.com/private/x" not in fold_kept
    assert "https://norules.org/x" in fold_kept


class TestCrawlDelay:
    BODY = """
User-agent: *
Crawl-delay: 2
Disallow: /private

User-agent: fastbot
Crawl-delay: 0.5

User-agent: rudebot
Crawl-delay: banana
"""

    def test_parse_group_override_and_malformed(self):
        from xarray_spatial_spark.functions.robots import parse_crawl_delay

        assert parse_crawl_delay(self.BODY) == 2.0
        assert parse_crawl_delay(self.BODY, "FastBot") == 0.5
        # malformed value in the agent's own group -> falls back to *
        assert parse_crawl_delay(self.BODY, "rudebot") == 2.0
        assert parse_crawl_delay("User-agent: *\nCrawl-delay: -3") is None
        assert parse_crawl_delay("") is None

    def test_crawl_delays_frame_with_default(self, spark):
        from xarray_spatial_spark.functions.robots import crawl_delays

        robots = spark.createDataFrame(
            [("slow.org", self.BODY), ("bare.org", "User-agent: *\nDisallow:")],
            "host string, robots_txt string")
        got = {r["host"]: r["delay_s"]
               for r in crawl_delays(robots, default_s=1.0).collect()}
        assert got == {"slow.org": 2.0, "bare.org": 1.0}

    def test_schedule_fetch_times_honors_waves(self, spark):
        from xarray_spatial_spark.functions.frontier import frontier_schedule
        from xarray_spatial_spark.functions.robots import (
            crawl_delays, schedule_fetch_times)

        links = spark.createDataFrame(
            [(f"https://slow.org/p{i}",) for i in range(4)]
            + [(f"https://bare.org/p{i}",) for i in range(3)],
            "url string")
        plan = frontier_schedule(links)
        robots = spark.createDataFrame(
            [("slow.org", self.BODY), ("bare.org", "")],
            "host string, robots_txt string")
        t = schedule_fetch_times(plan, crawl_delays(robots))
        rows = t.collect()
        for r in rows:
            want = r["wave"] * (2.0 if r["host"] == "slow.org" else 1.0)
            assert r["fetch_at_s"] == want, r
        # per host: consecutive waves exactly one delay apart
        slow = sorted(r["fetch_at_s"] for r in rows if r["host"] == "slow.org")
        assert slow == [0.0, 2.0, 4.0, 6.0]
