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
