"""IPv4 parsing + geolocation (functions/ip.py): parse/format
roundtrip, strict validation, CIDR ranges, and interval-join
geolocation vs brute force — plan must stay a hash join."""

import random

import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.ip import (
    cidr_to_range,
    geolocate_ipv4,
    ipv4_to_long,
    long_to_ipv4,
)


def test_parse_known_values(spark):
    df = spark.createDataFrame(
        [("0.0.0.0",), ("255.255.255.255",), ("10.0.0.1",), ("1.2.3.4",)],
        "ip string",
    )
    got = [r.v for r in df.select(ipv4_to_long("ip").alias("v")).collect()]
    assert got == [0, 4294967295, 167772161, 16909060]


@pytest.mark.parametrize(
    "bad",
    ["256.1.1.1", "1.2.3", "1.2.3.4.5", "a.b.c.d", "", "1..2.3", "-1.2.3.4",
     "1.2.3.999"],
)
def test_parse_rejects(spark, bad):
    df = spark.createDataFrame([(bad,)], "ip string")
    assert df.select(ipv4_to_long("ip").alias("v")).collect()[0].v is None


def test_roundtrip_random(spark):
    rng = random.Random(7)
    vals = [rng.randrange(0, 2**32) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = df.select(
        "v", ipv4_to_long(long_to_ipv4("v")).alias("back")
    ).collect()
    assert all(r.back == r.v for r in out)


def test_cidr_range(spark):
    df = spark.createDataFrame(
        [("10.0.0.77/24",), ("0.0.0.0/0",), ("1.2.3.4/32",), ("1.2.3.4/33",),
         ("junk/8",)],
        "c string",
    )
    got = [r.r for r in df.select(cidr_to_range("c").alias("r")).collect()]
    assert (got[0].lo, got[0].hi) == (167772160, 167772415)  # 10.0.0.0/24
    assert (got[1].lo, got[1].hi) == (0, 2**32 - 1)
    assert (got[2].lo, got[2].hi) == (16909060, 16909060)
    assert got[3] is None and got[4] is None


def test_geolocate_vs_brute_force(spark):
    rng = random.Random(42)
    # disjoint /20-ish blocks with gaps, GeoIP-shaped
    ranges, lo = [], 0
    for i in range(60):
        lo += rng.randrange(1, 1 << 22)
        hi = lo + rng.randrange(0, 1 << 20)
        ranges.append((lo, hi, f"cc{i % 7}"))
        lo = hi + 1
    ips = [rng.randrange(0, lo + (1 << 22)) for _ in range(2000)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(ips)], "row_id long, ip long"
    )
    rdf = spark.createDataFrame(ranges, "ip_lo long, ip_hi long, cc string")
    out = geolocate_ipv4(df, rdf, ip_col="ip")
    got = {r.row_id: r.cc for r in out.collect()}
    exp = {}
    for i, v in enumerate(ips):
        exp[i] = None
        for a, b, cc in ranges:
            if a <= v <= b:
                exp[i] = cc
                break
    assert len(got) == len(ips)  # left join keeps all, disjoint → no fanout
    assert got == exp
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan


def test_geolocate_string_ips_and_inner(spark):
    df = spark.createDataFrame(
        [(1, "10.0.0.5"), (2, "10.0.1.5"), (3, "not-an-ip")],
        "row_id long, ip string",
    )
    rdf = spark.createDataFrame(
        [(167772160, 167772415, "AA")], "ip_lo long, ip_hi long, cc string"
    )  # 10.0.0.0/24
    left = {r.row_id: r.cc for r in geolocate_ipv4(df, rdf).collect()}
    assert left == {1: "AA", 2: None, 3: None}
    inner = geolocate_ipv4(df, rdf, how="inner").collect()
    assert [(r.row_id, r.cc) for r in inner] == [(1, "AA")]
