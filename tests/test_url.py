"""URL structure functions + keep-latest snapshot dedup."""

import pandas as pd
from pyspark.sql import functions as F

from xarray_spatial_spark.functions import url as uf
from xarray_spatial_spark.functions import dedup


URLS = [
    ("https://www.Example.COM/a/b/c", "www.example.com", "example.com", 3),
    ("https://user:pw@example.co.uk:8443/x/", "example.co.uk", "example.co.uk", 1),
    ("http://sub.deep.example.co.uk/p?q=1#f", "sub.deep.example.co.uk", "example.co.uk", 1),
    ("https://site.org", "site.org", "site.org", 0),
    ("https://localhost:8080/", "localhost", "localhost", 0),
    ("ftp://files.example.net/pub//two", "files.example.net", "example.net", 2),
    ("not a url", "", "", 0),
]


def test_url_parts(spark):
    df = spark.createDataFrame([(u,) for u, *_ in URLS], ["url"])
    got = df.select(
        "url",
        uf.url_host(F.col("url")).alias("host"),
        uf.registered_domain(uf.url_host(F.col("url"))).alias("dom"),
        uf.path_depth(F.col("url")).alias("pd"),
    ).collect()
    want = {u: (h, d, p) for u, h, d, p in URLS}
    for r in got:
        assert (r["host"], r["dom"], r["pd"]) == want[r["url"]], r["url"]


def test_snapshot_dedup_keeps_latest(spark):
    rows = [
        # (url, ts, crawl_id, text)
        ("a", "2024-01-01 00:00:00", 1, "old"),
        ("a", "2024-03-01 00:00:00", 3, "new"),
        ("a", "2024-03-01 00:00:00", 2, "tie-lower"),  # tie on ts -> max crawl_id
        ("b", "2024-02-01 00:00:00", 9, "only"),
    ]
    df = spark.createDataFrame(rows, ["url", "ts", "crawl_id", "text"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = dedup.snapshot_dedup(df, key_cols="url", ts_col="ts", tie_cols=["crawl_id"])
    got = {r["url"]: (r["crawl_id"], r["text"]) for r in out.collect()}
    assert got == {"a": (3, "new"), "b": (9, "only")}
    assert set(out.columns) == {"url", "ts", "crawl_id", "text"}


def test_snapshot_dedup_is_aggregate_not_window(spark):
    """The scale contract: partial-combining HashAggregate, no Window
    (a window would shuffle every capture of every key)."""
    df = spark.range(1000).select(
        (F.col("id") % 50).alias("url"),
        F.col("id").alias("ts"),
        (F.col("id") * 7).alias("payload"),
    )
    out = dedup.snapshot_dedup(df, key_cols="url", ts_col="ts", tie_cols=["payload"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # struct-ordered max_by plans as SortAggregate: partial + final pair
    # (map-side combine bounds what a hot key ships to the shuffle)
    assert plan.count("Aggregate(") >= 2
    # parity vs pandas idxmax
    pdf = df.toPandas()
    want = pdf.loc[pdf.groupby("url")["ts"].idxmax()]
    got = out.toPandas().sort_values("url", ignore_index=True)
    pd.testing.assert_frame_equal(
        got, want.sort_values("url", ignore_index=True)[got.columns.tolist()]
    )


def test_host_stats(spark):
    df = spark.createDataFrame(
        [
            ("https://a.example.com/1", 10),
            ("https://b.example.com/2", 20),
            ("https://a.example.com/3", 30),
            ("https://only.org/", 5),
        ],
        ["url", "n_chars"],
    )
    out = {r["domain"]: (r["n_pages"], r["n_hosts"], r["sum_chars"])
           for r in uf.host_stats(df, n_chars_col="n_chars").collect()}
    assert out == {"example.com": (3, 2, 60), "only.org": (1, 1, 5)}


def test_url_normalize(spark):
    from xarray_spatial_spark.functions.url import url_normalize

    cases = [
        # (input, expected)
        ("HTTP://Example.COM:80/a/b/", "http://example.com/a/b"),
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("http://user:pw@example.com/a", "http://example.com/a"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com/p?b=2&a=1", "http://example.com/p?a=1&b=2"),
        ("http://example.com/p?utm_source=x&a=1&fbclid=z",
         "http://example.com/p?a=1"),
        ("http://example.com/p?utm_campaign=only",
         "http://example.com/p"),
        ("http://example.com/p?a=1#frag", "http://example.com/p?a=1"),
        ("http://example.com/a//b/", "http://example.com/a//b"),
        # '?' first appearing INSIDE the fragment is not a query
        ("http://example.com/p#a?b=1", "http://example.com/p"),
        ("http://example.com/p?a=1#x?b=2", "http://example.com/p?a=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(url_normalize(F.col("url"))).collect()]
    for (u, want), g in zip(cases, got):
        assert g == want, (u, g, want)


def test_url_normalize_collapses_refetches(spark):
    """Crawl re-fetches of one resource (tracking params, fragment,
    port/case noise) normalize to ONE dedup key."""
    from xarray_spatial_spark.functions.url import url_normalize

    variants = [
        "http://Example.com/article?id=7&utm_source=feed",
        "http://example.com:80/article/?id=7",
        "http://example.com/article?id=7#top",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    n = df.select(url_normalize(F.col("url")).alias("k")).distinct().count()
    assert n == 1
