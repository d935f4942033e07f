"""RSS/Atom feed discovery + parsing (functions/feeds.py)."""

import datetime

from pyspark.sql import functions as F

from xarray_spatial_spark.functions import feeds

PAGE = """<html><head>
<link rel="alternate" type="application/rss+xml" href="/feed.xml">
<link type="application/atom+xml" rel="alternate"
      href="https://other.example.org/atom" />
<link rel="stylesheet" type="text/css" href="/style.css">
<link rel="self" type="application/rss+xml" href="/not-advertised.xml">
<link rel="alternate" type="text/html" href="/mobile">
</head><body><a href="/p">x</a></body></html>"""


def test_feed_links_discovery(spark):
    df = spark.createDataFrame(
        [(1, "http://news.example.com/section/index.html", PAGE),
         (2, "http://plain.example.com/", "<html>no feeds</html>")],
        "doc_id long, url string, html string")
    got = feeds.feed_links(df).orderBy("feed_url").collect()
    assert [(r.feed_url, r.feed_kind, r.doc_id) for r in got] == [
        ("http://news.example.com/feed.xml", "rss", 1),
        ("https://other.example.org/atom", "atom", 1),
    ]
    assert "html" not in got[0].asDict()


def test_feed_links_binary_and_relative(spark):
    page = ('<link rel="alternate" type="application/rss+xml" '
            'href="rss/latest.xml">').encode()
    df = spark.createDataFrame(
        [("http://a.com/blog/post/1", bytearray(page))],
        "url string, html binary")
    got = feeds.feed_links(df).collect()
    assert got[0].feed_url == "http://a.com/blog/post/rss/latest.xml"


RSS = """<?xml version="1.0"?><rss version="2.0"><channel>
<title>Chan</title><link>http://c.example.com/</link>
<item><title><![CDATA[First & Foremost]]></title>
  <link>http://c.example.com/a?x=1&amp;y=2</link>
  <guid>tag:1</guid>
  <pubDate>Mon, 02 Jan 2006 15:04:05 GMT</pubDate></item>
<item><title>No date</title><link>http://c.example.com/b</link></item>
<item><title>Dropped: no link</title></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">
<title>F</title><link rel="self" href="http://f.example.com/atom"/>
<entry><title>E1</title>
  <link rel="self" href="http://f.example.com/entry/1.atom"/>
  <link rel="alternate" href="http://f.example.com/posts/1"/>
  <id>urn:e1</id><published>2006-01-02T15:04:05Z</published></entry>
<entry><title>E2</title><link href="http://f.example.com/posts/2"/>
  <id>urn:e2</id><updated>2007-03-04T05:06:07+02:00</updated></entry>
</feed>"""


def test_rss_entries(spark):
    df = spark.createDataFrame([("http://c.example.com/feed", RSS)],
                               "feed_url string, xml string")
    got = feeds.feed_entries(df).orderBy("loc").collect()
    assert len(got) == 2  # the no-link item drops
    first = got[0]
    assert first.loc == "http://c.example.com/a?x=1&y=2"
    assert first.title == "First & Foremost"
    assert first.entry_id == "tag:1"
    assert first.kind == "rss"
    assert first.published_ts == datetime.datetime(2006, 1, 2, 15, 4, 5)
    assert got[1].published is None and got[1].published_ts is None


def test_atom_entries(spark):
    df = spark.createDataFrame([("http://f.example.com/atom", ATOM)],
                               "feed_url string, xml string")
    got = {r.entry_id: r for r in feeds.feed_entries(df).collect()}
    assert got["urn:e1"].loc == "http://f.example.com/posts/1"  # not rel=self
    assert got["urn:e1"].kind == "atom"
    assert got["urn:e1"].published_ts == datetime.datetime(2006, 1, 2, 15, 4, 5)
    assert got["urn:e2"].loc == "http://f.example.com/posts/2"
    # +02:00 normalizes to UTC
    assert got["urn:e2"].published_ts == datetime.datetime(2007, 3, 4, 3, 6, 7)


def test_feed_entries_never_raise_on_garbage(spark):
    rows = [("u1", "<rss><channel><item><link>http://x/1</link>"),
            ("u2", ""), ("u3", None),
            ("u4", "<feed><entry><link href='http://x/2'/>")]
    df = spark.createDataFrame(rows, "feed_url string, xml string")
    # truncated feeds (no closing tags) yield nothing, but never error
    assert feeds.feed_entries(df).count() == 0


def test_plan_is_scan_stage(spark):
    df = spark.createDataFrame([("http://a.com/", PAGE)],
                               "url string, html string")
    plan = feeds.feed_links(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "pythonUDF" not in plan and "ArrowEval" not in plan


def test_discovery_to_frontier_composition(spark):
    """feeds compose with the frontier: discovered entry locs are
    plain candidate URLs for plan_next_round's discovery input."""
    pages = spark.createDataFrame(
        [(1, "http://news.example.com/", PAGE)],
        "doc_id long, url string, html string")
    ads = feeds.feed_links(pages)
    fetched = ads.filter(F.col("feed_kind") == "rss").select(
        "feed_url", F.lit(RSS).alias("xml"))
    cand = feeds.feed_entries(fetched).select(F.col("loc").alias("url"))
    assert cand.count() == 2
