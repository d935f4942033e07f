"""IPv4 functions + IP→geo enrichment — the classic interval-join
consumer (MaxMind-style range tables), wired onto
:func:`plans.asof.interval_join` so the lookup is a bucketed hash
join, never a BroadcastNestedLoop.

Crawl uses: geolocate fetch logs by server IP, attach ASN/country to
hosts for per-jurisdiction corpus slicing, rate-limit by network
block.  Range tables are (ip_lo, ip_hi, payload...) rows over the
uint32 IPv4 space; real GeoIP tables are ~3M rows — broadcastable,
but the bucketed join also works when they aren't (per-ASN flow
tables, RIR delegations joined at full history).

All parsing is pure Catalyst (codegen regex + arithmetic); values are
BIGINT in [0, 2^32) so nothing touches the sign bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xarray_spatial_spark.plans.asof import interval_join

__all__ = [
    "ipv4_to_long",
    "long_to_ipv4",
    "cidr_to_range",
    "geolocate_ipv4",
]

_IPV4_RE = (
    r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
    r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$"
)


def ipv4_to_long(col: Column | str) -> Column:
    """Dotted-quad string → BIGINT in [0, 2^32), NULL on anything
    malformed (missing octets, values > 255, leading-zero octets pass
    — they're unambiguous).  Strict octet bounds ride the regex so no
    arithmetic runs on garbage."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"\.")
    val = (
        parts[0].cast("long") * 16777216
        + parts[1].cast("long") * 65536
        + parts[2].cast("long") * 256
        + parts[3].cast("long")
    )
    return F.when(c.rlike(_IPV4_RE), val)


def long_to_ipv4(col: Column | str) -> Column:
    """BIGINT → dotted-quad string (inverse of :func:`ipv4_to_long`
    on the valid range)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(
        ".",
        (c / 16777216).cast("long") % 256,
        (c / 65536).cast("long") % 256,
        (c / 256).cast("long") % 256,
        c.cast("long") % 256,
    )


def cidr_to_range(cidr: Column | str) -> Column:
    """``a.b.c.d/n`` → struct(lo, hi) covering the block (NULL on a
    malformed address or prefix outside [0, 32]).  The base address is
    masked down to the block start, so ``10.0.0.77/24`` and
    ``10.0.0.0/24`` give the same range."""
    c = F.col(cidr) if isinstance(cidr, str) else cidr
    addr = F.substring_index(c, "/", 1)
    plen = F.substring_index(c, "/", -1).cast("int")
    base = ipv4_to_long(addr)
    # shiftleft() takes only literal shift amounts; 2^(32-p) is exact
    # in double for p in [0, 32] so pow+cast is bit-safe here
    size = F.pow(F.lit(2.0), (F.lit(32) - plen)).cast("long")
    lo = (base / size).cast("long") * size
    ok = plen.isNotNull() & (plen >= 0) & (plen <= 32) & base.isNotNull()
    return F.when(ok, F.struct(lo.alias("lo"), (lo + size - 1).alias("hi")))


def geolocate_ipv4(
    df: DataFrame,
    ranges: DataFrame,
    ip_col: str = "ip",
    lo_col: str = "ip_lo",
    hi_col: str = "ip_hi",
    how: str = "left",
    bin_width: int = 65536,
) -> DataFrame:
    """Attach every range row whose [lo, hi] contains the row's IPv4
    address.  ``ip_col`` may be a dotted-quad string column or an
    already-numeric column; range bounds are numeric (use
    :func:`cidr_to_range` to build them from CIDR strings).

    GeoIP tables are disjoint, so each row gains at most one match;
    overlapping tables (ASN hierarchies) fan out like any join.  Plan:
    ranges explode to /16-aligned buckets (``bin_width`` = 65536 —
    real-world blocks are /16 or smaller, so the explosion factor
    stays ~1-2), rows hash-join on their single bucket, exact BETWEEN
    filters.  Malformed addresses get NULL payloads under
    ``how="left"`` and drop under ``"inner"``."""
    ip_dtype = dict(df.dtypes)[ip_col]
    num = (
        F.col(ip_col)
        if ip_dtype in ("bigint", "int", "long")
        else ipv4_to_long(F.col(ip_col))
    )
    pts = df.withColumn("_ipv4", num)
    out = interval_join(
        pts,
        ranges,
        point_col="_ipv4",
        lo_col=lo_col,
        hi_col=hi_col,
        bin_width=bin_width,
        how=how,
    )
    return out.drop("_ipv4")
