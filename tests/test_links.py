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


# ---------------------------------------------------------------------------
# anchor text
# ---------------------------------------------------------------------------


def test_extract_anchors(spark):
    from xarray_spatial_spark.functions.url import extract_anchors

    html = (
        '<a href="https://other.org/x">Plain  text</a>'
        '<a href="/root">has <b>inline</b>\nmarkup</a>'
        '<a href="img.png"><img src="i.png"></a>'
        '<a href="javascript:void(0)">dropped</a>'
    )
    df = spark.createDataFrame(
        [("https://ex.com/a/b/page.html", html)], "url string, html string")
    got = df.select(extract_anchors(
        F.col("html"), F.col("url")).alias("a")).collect()[0]["a"]
    assert [(r["url"], r["anchor"]) for r in got] == [
        ("https://other.org/x", "Plain text"),
        ("https://ex.com/root", "has inline markup"),
        ("https://ex.com/a/b/img.png", ""),
    ]


def test_anchor_text_aggregation(spark):
    from xarray_spatial_spark.functions.url import anchor_text

    def page(host, n, links):
        body = "".join(f'<a href="{u}">{t}</a>' for u, t in links)
        return (f"https://{host}/p{n}", body)

    rows = [
        page("a.com", 1, [("https://t.org/doc", "Good Guide"),
                          ("https://t.org/doc", "Good Guide"),
                          ("https://other.net/x", "misc")]),
        page("b.com", 1, [("https://t.org/doc/", "Good Guide")]),
        page("c.com", 1, [("https://t.org/doc", "click here")]),
        page("a.com", 2, [("https://t.org/doc", "click here")]),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = {r["url"]: r for r in anchor_text(df, k=1).collect()}
    doc = out["https://t.org/doc"]  # trailing slash collapsed in
    assert doc["n_inlinks"] == 5
    assert doc["n_source_hosts"] == 3  # a.com, b.com, c.com
    assert doc["top_anchors"] == ["Good Guide"]  # 3 > 2 'click here'
    misc = out["https://other.net/x"]
    assert misc["n_inlinks"] == 1 and misc["top_anchors"] == ["misc"]


def test_anchor_text_tie_and_empty(spark):
    from xarray_spatial_spark.functions.url import anchor_text

    df = spark.createDataFrame(
        [("https://s.com/1",
          '<a href="https://t.org/a">zeta</a><a href="https://t.org/a">alpha</a>'
          '<a href="https://t.org/b"><img src="x"></a>')],
        "url string, html string")
    out = {r["url"]: r for r in anchor_text(df, k=2).collect()}
    # equal counts -> lexical order
    assert out["https://t.org/a"]["top_anchors"] == ["alpha", "zeta"]
    # empty anchors never surface in top_anchors but count as inlinks
    b = out["https://t.org/b"]
    assert b["n_inlinks"] == 1 and b["top_anchors"] == []


class TestResolveRedirects:
    def _resolve(self, spark, edges, **kw):
        df = spark.createDataFrame(edges, "src string, dst string")
        from xarray_spatial_spark.functions.url import resolve_redirects
        return {r["url"]: (r["final_url"], r["hops"], r["unresolved"])
                for r in resolve_redirects(df, **kw).collect()}

    def test_chains_resolve_with_exact_hops(self, spark):
        # a -> b -> c -> T ; d -> T2
        got = self._resolve(spark, [("a", "b"), ("b", "c"), ("c", "T"),
                                    ("d", "T2")])
        assert got == {"a": ("T", 3, False), "b": ("T", 2, False),
                       "c": ("T", 1, False), "d": ("T2", 1, False)}

    def test_cycle_and_overlength_flagged(self, spark):
        chain = [(f"n{i}", f"n{i+1}") for i in range(12)]  # 12 > 8 hops
        got = self._resolve(spark, chain + [("x", "y"), ("y", "x")],
                            max_hops=8)
        assert got["x"] == (None, -1, True) and got["y"] == (None, -1, True)
        assert got["n0"] == (None, -1, True)          # 12-hop chain
        assert got["n5"] == ("n12", 7, False)         # tail fits in 8
        assert got["n11"] == ("n12", 1, False)

    def test_conflicting_targets_keep_smallest(self, spark):
        got = self._resolve(spark, [("a", "z"), ("a", "b"), ("b", "T")])
        assert got["a"] == ("T", 2, False)

    def test_max_hops_one(self, spark):
        got = self._resolve(spark, [("a", "b"), ("b", "T")], max_hops=1)
        assert got["b"] == ("T", 1, False)
        assert got["a"] == (None, -1, True)  # needs 2 hops

    def test_bad_max_hops(self, spark):
        import pytest as pt
        from xarray_spatial_spark.functions.url import resolve_redirects
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pt.raises(ValueError, match=">= 1"):
            resolve_redirects(df, max_hops=0)
