"""Hyperlink extraction + web-graph edges (functions/url.py)."""

from pyspark.sql import functions as F

from xarray_spatial_spark.functions.url import extract_links, link_edges


def _links(spark, html, base="https://ex.com/a/b/page.html"):
    df = spark.createDataFrame([(base, html)], "url string, html string")
    return df.select(
        extract_links(F.col("html"), F.col("url")).alias("l")
    ).collect()[0]["l"]


def test_resolution_branches(spark):
    html = (
        '<a href="https://other.org/x">abs</a>'
        '<a href="//cdn.net/lib.js">proto-rel</a>'
        '<a href="/root/path">root-rel</a>'
        '<a href="sib.html">path-rel</a>'
        '<a href="../up/one.html">dotdot</a>'
        '<a href="./same/dir.html">dot</a>'
    )
    got = _links(spark, html)
    assert got == [
        "https://other.org/x",
        "https://cdn.net/lib.js",
        "https://ex.com/root/path",
        "https://ex.com/a/b/sib.html",
        "https://ex.com/a/up/one.html",
        "https://ex.com/a/b/same/dir.html",
    ]


def test_skipped_targets(spark):
    html = (
        '<a href="javascript:void(0)">js</a>'
        '<a href="mailto:x@y.z">mail</a>'
        '<a href="data:text/plain,hi">data</a>'
        '<a href="tel:+155500">tel</a>'
        '<a href="#frag">frag-only</a>'
        '<a href="real.html#sec2">keeps-path-drops-frag</a>'
    )
    got = _links(spark, html)
    assert got == ["https://ex.com/a/b/real.html"]


def test_nested_dotdot_and_host_protection(spark):
    got = _links(spark, '<a href="../../up2.html">x</a>',
                 base="https://ex.com/a/b/c/page.html")
    assert got == ["https://ex.com/a/up2.html"]
    # ../ beyond root must NOT eat the host
    got = _links(spark, '<a href="../../../../zzz">x</a>',
                 base="https://ex.com/a/page.html")
    assert got[0].startswith("https://ex.com/")
    assert "zzz" in got[0]


def test_attribute_variants_and_case(spark):
    html = (
        "<A HREF='single.html'>caps+single-quote</A>"
        '<a class="x" target="_blank" href="attr.html">later attr</a>'
    )
    got = _links(spark, html)
    assert got == [
        "https://ex.com/a/b/single.html",
        "https://ex.com/a/b/attr.html",
    ]


def test_link_edges_normalized_dedup_no_selfloop(spark):
    rows = [
        ("https://ex.com/p1", (
            '<a href="https://ex.com/p2?utm_source=x">tracked</a>'
            '<a href="https://ex.com/p2">plain</a>'      # same after norm
            '<a href="https://ex.com/p1#self">self</a>'  # self-loop
        )),
        ("https://ex.com/p2", '<a href="/p1">back</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {(r["src"], r["dst"]) for r in link_edges(df).collect()}
    assert got == {
        ("https://ex.com/p1", "https://ex.com/p2"),
        ("https://ex.com/p2", "https://ex.com/p1"),
    }


def test_edges_feed_pagerank(spark):
    """The whole bridge: html -> edges -> pagerank runs and ranks the
    most-linked page first."""
    from xarray_spatial_spark.functions.graph import pagerank

    hub = "https://h.com/hub"
    rows = [(f"https://h.com/p{i}", f'<a href="/hub">h</a>') for i in range(5)]
    rows.append((hub, '<a href="/p0">p0</a>'))
    df = spark.createDataFrame(rows, "url string, html string")
    edges = link_edges(df)
    pr = pagerank(edges, iters=5)
    top = pr.orderBy(F.desc(pr.columns[-1])).limit(1).collect()[0]
    assert top[0] == hub


def test_binary_html_column(spark):
    df = spark.createDataFrame(
        [("https://b.com/x", b'<a href="/y">y</a>')],
        "url string, html binary")
    got = df.select(
        extract_links(F.col("html"), F.col("url")).alias("l")
    ).collect()[0]["l"]
    assert got == ["https://b.com/y"]
