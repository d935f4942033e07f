"""HTML page-metadata extraction goldens (functions/html.py)."""

from pyspark.sql import functions as F

from xarray_spatial_spark.functions.html import page_metadata


def _meta(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(page_metadata(F.col("html")).alias("m")).collect()[0]["m"]


def test_full_head(spark):
    html = (
        "<!doctype html><html><head>"
        "<META CHARSET='UTF-8'>"
        "<title>  A  Title\n  Here </title>"
        '<meta name="description" content="a fine page">'
        '<link rel="canonical" href="https://ex.com/real">'
        '<meta name="robots" content="NOINDEX, nofollow">'
        "</head><body>x</body></html>"
    )
    m = _meta(spark, html)
    assert m["title"] == "A Title Here"
    assert m["description"] == "a fine page"
    assert m["canonical"] == "https://ex.com/real"
    assert m["charset"] == "utf-8"
    assert m["robots"]["noindex"] and m["robots"]["nofollow"]


def test_reversed_attribute_order(spark):
    html = (
        '<meta content="rev desc" name="description">'
        '<link href="https://ex.com/c" rel="canonical">'
        '<meta content="index, follow" name="robots">'
    )
    m = _meta(spark, html)
    assert m["description"] == "rev desc"
    assert m["canonical"] == "https://ex.com/c"
    assert not m["robots"]["noindex"] and not m["robots"]["nofollow"]


def test_missing_fields_are_null(spark):
    m = _meta(spark, "<html><body>no head</body></html>")
    assert m["title"] is None
    assert m["description"] is None
    assert m["canonical"] is None
    assert m["charset"] is None
    assert not m["robots"]["noindex"]


def test_robots_token_boundaries(spark):
    # 'noindexing' must not read as noindex
    m = _meta(spark, '<meta name="robots" content="noindexing">')
    assert not m["robots"]["noindex"]
    m = _meta(spark, '<meta name="robots" content="noindex">')
    assert m["robots"]["noindex"]


def test_binary_html_and_distributed(spark):
    rows = [(i, f"<title>t{i}</title>".encode()) for i in range(100)]
    df = spark.createDataFrame(rows, "i int, html binary")
    got = df.select("i", page_metadata(F.col("html"))["title"].alias("t"))
    assert got.filter(F.col("t") != F.concat(F.lit("t"), F.col("i"))).count() == 0


# ---------------------------------------------------------------------------
# main-content extraction
# ---------------------------------------------------------------------------


def _content(spark, html, **kw):
    from xarray_spatial_spark.functions.html import main_content

    df = spark.createDataFrame([(html,)], "html string")
    return df.select(
        main_content(F.col("html"), **kw).alias("c")).collect()[0]["c"]


BOILERPLATE_PAGE = (
    "<!doctype html><html><head><title>T</title>"
    "<style>body { color: red; } /* a very long stylesheet with words "
    "words words words words words words words words words */</style>"
    "<script>var x = 'this script block is long enough to pass the "
    "minimum length test if it were not removed entirely first';</script>"
    "</head><body>"
    '<nav><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact</a> <a href="/blog">Blog</a></nav>'
    "<article><h1>Headline of a real article goes here</h1>"
    "<p>This is the first real paragraph of the article, long enough "
    'to clear the minimum and containing <a href="/ref">one link</a> '
    "without tripping the link-density gate.</p>"
    "<p>Second paragraph, also substantive and long enough to keep, "
    "with &amp; entities &lt;escaped&gt; and   runs   of   spaces "
    "collapsed.</p></article>"
    '<footer><a href="/tos">Terms</a> | <a href="/priv">Privacy</a> | '
    '<a href="/imprint">Imprint</a></footer>'
    "<!-- a comment long enough that it would count as text too -->"
    "</body></html>"
)


def test_main_content_drops_boilerplate(spark):
    got = _content(spark, BOILERPLATE_PAGE)
    paras = got.split("\n")
    assert paras[0] == "Headline of a real article goes here"
    assert paras[1].startswith("This is the first real paragraph")
    assert "one link" in paras[1]  # inline link text preserved
    assert paras[2].startswith("Second paragraph")
    # entity decode + whitespace collapse
    assert "& entities <escaped> and runs of spaces" in paras[2]
    # nav / footer / script / style / comment all gone
    for frag in ("Home", "Terms", "color: red", "var x", "a comment"):
        assert frag not in got
    assert len(paras) == 3


def test_main_content_link_density_gate(spark):
    # a long block that is ALL links is boilerplate even above min_chars
    html = ("<p>" + " ".join(
        f'<a href="/{i}">Related article number {i}</a>' for i in range(8))
        + "</p><p>A plain paragraph with enough characters to stay "
          "in the output.</p>")
    got = _content(spark, html)
    assert got == ("A plain paragraph with enough characters to stay "
                   "in the output.")
    # raising the tolerance keeps the link list too
    got2 = _content(spark, html, max_link_density=1.0)
    assert got2.startswith("Related article number 0")


def test_main_content_null_binary_empty(spark):
    from xarray_spatial_spark.functions.html import main_content

    df = spark.createDataFrame(
        [(None,), (b"<p>binary html paragraph long enough to keep here</p>",)],
        "html binary")
    got = [r["c"] for r in df.select(
        main_content(F.col("html")).alias("c")).collect()]
    assert got[0] == ""
    assert got[1] == "binary html paragraph long enough to keep here"


# ---------------------------------------------------------------------------
# charset detection + transcoding
# ---------------------------------------------------------------------------


def _decode_rows(spark, rows):
    from xarray_spatial_spark.functions.html import decode_html, sniff_charset

    df = spark.createDataFrame([(r,) for r in rows], "html binary")
    return df.select(
        sniff_charset(F.col("html")).alias("cs"),
        decode_html(F.col("html")).alias("t"),
    ).collect()


def test_charset_bom_beats_declaration(spark):
    # BOM says UTF-16LE even though the meta says utf-8
    body = '<meta charset="utf-8"><p>héllo</p>'
    got = _decode_rows(spark, [b"\xff\xfe" + body.encode("utf-16-le")])[0]
    assert got["cs"] == "utf-16-le"
    assert "héllo" in got["t"]


def test_charset_declared_cp1252_and_gbk(spark):
    cp = '<html><meta charset="iso-8859-1"><p>café naïve</p>'.encode(
        "windows-1252")
    gb = '<meta charset="gb2312"><p>中文页</p>'.encode("gbk")
    got = _decode_rows(spark, [cp, gb])
    assert got[0]["cs"] == "windows-1252"   # latin1 sniffs as cp1252
    assert "café naïve" in got[0]["t"]
    assert got[1]["cs"] == "gbk"
    assert "中文页" in got[1]["t"]


def test_charset_fallbacks(spark):
    # no declaration, invalid utf-8 bytes -> replacement char, not a throw
    bad = b"<p>caf\xe9</p>"
    # bogus label python has no codec for -> utf-8 retry path
    bogus = '<meta charset="x-wrong-9">ok</meta>'.encode()
    utf8bom = b"\xef\xbb\xbf<p>plain</p>"
    got = _decode_rows(spark, [bad, bogus, utf8bom, None])
    assert got[0]["cs"] == "utf-8" and "caf�" in got[0]["t"]
    assert "ok" in got[1]["t"]
    assert got[2]["cs"] == "utf-8" and got[2]["t"].startswith("<p>plain")
    assert got[3]["cs"] is None and got[3]["t"] is None


def test_charset_decode_distributed_pipeline(spark):
    """decode_html output feeds main_content: a cp1252 page end to end."""
    from xarray_spatial_spark.functions.html import decode_html, main_content

    page = ('<meta charset="latin1"><body>'
            "<p>Ein längerer Absatz über die Straße, der lang genug ist "
            "um zu bleiben.</p></body>").encode("windows-1252")
    df = spark.createDataFrame([(i, page) for i in range(64)],
                               "doc_id long, html binary").repartition(8)
    out = df.select(main_content(decode_html(F.col("html"))).alias("c"))
    vals = {r["c"] for r in out.collect()}
    assert vals == {"Ein längerer Absatz über die Straße, der lang genug "
                    "ist um zu bleiben."}
