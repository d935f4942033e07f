"""SURT keys (functions/url.py:surt) and the CDX capture index
(sources/cdx.py): canonicalization goldens, the Python/Catalyst twin
pin, sorted-shard layout + manifest, and pruned prefix lookup."""

import json
import os

import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.url import surt
from xarray_spatial_spark.sources import cdx as cx

GOLDEN = [
    ("https://User@WWW.Example.co.uk:8443/A/B?b=2&a=1#frag",
     "uk,co,example:8443)/a/b?a=1&b=2"),
    ("https://example.com", "com,example)/"),
    ("http://example.com:80/x", "com,example)/x"),
    ("https://example.com:443/x", "com,example)/x"),
    ("http://example.com:8080/x", "com,example:8080)/x"),
    ("https://www2.Sub.Example.org/Path/", "org,example,sub)/path/"),
    ("https://example.com/p?z=1&a=2&", "com,example)/p?a=2&z=1"),
    ("https://example.com/p#a?b=1", "com,example)/p"),  # ? inside frag
    ("https://example.com/?", "com,example)/"),
]


def test_surt_goldens(spark):
    df = spark.createDataFrame([(u,) for u, _ in GOLDEN], "url string")
    got = [r[0] for r in df.select(surt(F.col("url"))).collect()]
    assert got == [s for _, s in GOLDEN]


def test_surt_str_twin_matches_column(spark):
    urls = [u for u, _ in GOLDEN] + [
        "ftp://Files.Example.net/Pub",
        "https://a.b.c.d.example.com/deep/Path?x=1#y",
        "http://www9.example.com",
        "https://example.com/UPPER?Q=V&q=v",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in df.select(surt(F.col("url"))).collect()]
    assert got == [cx.surt_str(u) for u in urls]


def _captures(spark, n=400):
    d = spark.range(0, n).withColumnRenamed("id", "i")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("i") % 7 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("site"), (F.col("i") % 20).cast("string"),
        F.lit(".example."),
        F.when(F.col("i") % 2 == 0, F.lit("com")).otherwise(F.lit("org")),
        F.lit("/p/"), (F.col("i") % 50).cast("string"),
        F.when(F.col("i") % 5 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("")),
    )
    return d.select(
        url.alias("url"),
        (F.lit(20240100000000) + F.col("i")).cast("string").alias("warc_ts"),
        F.concat(F.lit("payload-"), (F.col("i") % 9).cast("string")).alias("text"),
    )


def test_cdx_build_sorted_manifest_and_lookup(spark, tmp_path):
    path = os.path.join(tmp_path, "cdx")
    recs = cx.cdx_records(_captures(spark), ts_col="warc_ts")
    manifest = cx.write_cdx(recs, path, n_shards=6)
    files = sorted(manifest["shards"])
    assert len(files) >= 2
    # every shard sorted internally; shard spans ordered and complete
    import pyarrow.parquet as pq

    total = 0
    prev_max = None
    for name in files:
        t = pq.read_table(os.path.join(path, name), columns=["surt_key"])
        keys = t.column(0).to_pylist()
        assert keys == sorted(keys), name
        total += len(keys)
        span = manifest["shards"][name]
        assert span["min"] <= span["max"]
        if prev_max is not None and keys:
            assert span["min"] >= prev_max
        if keys:
            prev_max = span["max"]
    assert total == 400

    # prefix lookup == brute filter, for host- and path-level prefixes
    full = spark.read.parquet(path)
    for prefix in ("https://site2.example.com",
                   "https://www.site7.example.org/p/",
                   "https://site4.example.com/p/4"):
        got = cx.cdx_prefix_scan(spark, path, url_prefix=prefix)
        sp = cx.surt_str(prefix)
        exp = full.filter(F.col("surt_key").startswith(sp))
        g = sorted(map(tuple, got.collect()))
        e = sorted(map(tuple, exp.collect()))
        assert g == e and len(g) > 0, prefix

    # the scan's file set is pruned, not the whole index
    got = cx.cdx_prefix_scan(spark, path,
                             url_prefix="https://site2.example.com")
    opened = {os.path.basename(f) for f in got.inputFiles()}
    assert opened < set(files), (sorted(opened), files)

    # provable miss: zero rows, no shard opened
    miss = cx.cdx_prefix_scan(spark, path,
                              url_prefix="https://zzz.nowhere.test")
    assert miss.count() == 0


def test_cdx_digest_and_defaults(spark, tmp_path):
    recs = cx.cdx_records(_captures(spark, 20), ts_col="warc_ts").collect()
    import hashlib

    for r in recs:
        assert r["status"] == 200 and r["mime"] == "text/html"
        assert r["length"] == len("payload-0")
    # digest is sha2-256 hex of the payload
    one = [r for r in recs if r["url"].endswith("/p/3")][0]
    assert one["digest"] == hashlib.sha256(b"payload-3").hexdigest()


def test_cdx_prefix_scan_arg_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        cx.cdx_prefix_scan(spark, str(tmp_path))
    with pytest.raises(ValueError):
        cx.cdx_prefix_scan(spark, str(tmp_path), url_prefix="x",
                           surt_prefix="y")


def test_next_prefix():
    assert cx._next_prefix("abc") == "abd"
    assert cx._next_prefix("a" + chr(0x10FFFF)) == "b"
    assert cx._next_prefix(chr(0x10FFFF)) is None
