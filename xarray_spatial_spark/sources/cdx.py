"""CDX capture index — the web archive's URL lookup structure.

Every Common Crawl / Internet Archive consumer resolves "which capture
of this URL do I fetch from which WARC" through a CDX index: records
keyed by :func:`~xarray_spatial_spark.functions.url.surt` (reversed
host makes a domain's captures lexically contiguous) and timestamp,
GLOBALLY SORTED, sharded, with a secondary index of shard key ranges
(the "zipnum cluster" layout) so a prefix query touches one shard, not
the archive.  This module re-expresses that layout Spark-first:

- :func:`cdx_records` derives the index row (surt_key, ts, url,
  digest, length, mime, status) from a capture table — pure Catalyst,
  scan-stage (digest is ``sha2-256`` hex; classic CDX uses sha1-b32,
  a digest-format deviation documented here so both engines of the
  correctness harness can compute it natively).
- :func:`write_cdx` range-partitions by (surt_key, ts), sorts within
  shards, writes parquet, and records each shard's [min, max] key
  span in ``_cdx_manifest.json`` — the zipnum secondary index.  One
  sampling pass (repartitionByRange) + one sorted write: the standard
  index build, all distributed.
- :func:`cdx_prefix_scan` answers "all captures under this URL
  prefix" by (1) driver-side shard pruning via the manifest, (2) a
  pushed key-range predicate that prunes parquet row groups inside
  the surviving shards, (3) the exact prefix filter.  At archive
  scale the read is O(result) + one shard footer, not O(index).

``surt_str`` is the driver-side Python twin of the Catalyst ``surt``
expression (pytest pins them equal) so callers can turn a URL prefix
into a key prefix without a Spark job.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.url import surt

_MANIFEST = "_cdx_manifest.json"


def surt_str(url: str) -> str:
    """Python twin of functions/url.py:surt (same canonicalization,
    same subset) for driver-side prefix construction."""
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]+)", url)
    scheme = m.group(1).lower() if m else ""
    auth = m.group(2) if m else ""
    nouser = re.sub(r"^.*@", "", auth)
    pm = re.search(r":([0-9]+)$", nouser)
    port = pm.group(1) if pm else ""
    host = re.sub(r":[0-9]+$", "", nouser).lower()
    host = re.sub(r"^www[0-9]*\.", "", host)
    rev = ",".join(reversed(host.split("."))) if host else ""
    keep_port = port != "" and not (
        (scheme == "http" and port == "80")
        or (scheme == "https" and port == "443"))
    pmatch = re.match(
        r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)", url)
    path = pmatch.group(1).lower() if pmatch else ""
    if path == "":
        path = "/"
    nofrag = re.sub(r"#.*", "", url, flags=re.DOTALL)
    qm = re.search(r"\?(.*)", nofrag, flags=re.DOTALL)
    query = qm.group(1).lower() if qm else ""
    params = sorted(p for p in query.split("&") if p != "")
    out = rev + (":" + port if keep_port else "") + ")" + path
    if params:
        out += "?" + "&".join(params)
    return out


def cdx_records(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str | None = "text",
    mime_col: str | None = None,
    status_col: str | None = None,
) -> DataFrame:
    """Index row per capture.  ``digest``/``length`` come from
    ``payload_col`` when given (content-addressed dedup across
    captures rides the digest); mime/status default to the crawl
    norm when their columns are absent."""
    cols = [
        surt(F.col(url_col)).alias("surt_key"),
        F.col(ts_col).cast("string").alias("ts"),
        F.col(url_col).alias("url"),
    ]
    if payload_col is not None:
        cols += [
            F.sha2(F.col(payload_col).cast("string"), 256).alias("digest"),
            F.length(F.col(payload_col)).cast("long").alias("length"),
        ]
    else:
        cols += [F.lit("").alias("digest"), F.lit(0).cast("long").alias("length")]
    cols.append((F.col(mime_col) if mime_col
                 else F.lit("text/html")).alias("mime"))
    cols.append((F.col(status_col).cast("int") if status_col
                 else F.lit(200)).alias("status"))
    return df.select(*cols)


def write_cdx(cdx: DataFrame, path: str, n_shards: int = 8) -> dict:
    """Sorted sharded index + manifest.  Returns the manifest dict:
    ``{"shards": {file: {"min": k, "max": k, "rows": n}}, ...}``."""
    (cdx.repartitionByRange(n_shards, "surt_key", "ts")
        .sortWithinPartitions("surt_key", "ts")
        .write.mode("overwrite").parquet(path))
    import pyarrow.parquet as pq

    shards = {}
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        lo = hi = None
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = idx["surt_key"]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                lo, hi = None, None
                break
            mn = st.min if isinstance(st.min, str) else st.min.decode()
            mx = st.max if isinstance(st.max, str) else st.max.decode()
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        shards[name] = {"min": lo, "max": hi,
                        "rows": md.num_rows}
    manifest = {"format": "cdx-parquet-v1", "key": "surt_key",
                "shards": shards}
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


def _next_prefix(prefix: str) -> str | None:
    """Smallest string greater than every string with this prefix."""
    for i in range(len(prefix) - 1, -1, -1):
        c = ord(prefix[i])
        if c < 0x10FFFF:
            return prefix[:i] + chr(c + 1)
    return None


def cdx_prefix_scan(
    spark: SparkSession, path: str, url_prefix: str | None = None,
    surt_prefix: str | None = None,
) -> DataFrame:
    """Captures whose surt_key starts with the prefix (give a URL
    prefix — converted via :func:`surt_str`, trailing ``)"/"`` forms
    included — or a raw surt prefix).  Shard pruning happens here on
    the manifest; the range predicate prunes row groups inside the
    shards Spark does open."""
    if (url_prefix is None) == (surt_prefix is None):
        raise ValueError("give exactly one of url_prefix / surt_prefix")
    if surt_prefix is None:
        # a bare host canonicalizes to 'com,example)/', which as a
        # PREFIX already matches every path under the host
        surt_prefix = surt_str(url_prefix)
    nxt = _next_prefix(surt_prefix)

    manifest_path = os.path.join(path, _MANIFEST)
    files = None
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
        files = []
        for name, span in sorted(manifest["shards"].items()):
            lo, hi = span["min"], span["max"]
            if lo is None or hi is None:
                files.append(name)  # unknown span: cannot prune
                continue
            if hi < surt_prefix or (nxt is not None and lo >= nxt):
                continue
            files.append(name)
        if not files:
            # provable miss: scan nothing but keep the schema
            first = sorted(manifest["shards"]) or [None]
            if first[0] is None:
                raise ValueError(f"empty cdx index at {path}")
            return (spark.read.parquet(os.path.join(path, first[0]))
                    .filter(F.lit(False)))
        files = [os.path.join(path, n) for n in files]

    df = spark.read.parquet(*(files if files is not None else [path]))
    cond = F.col("surt_key").startswith(surt_prefix) & (
        F.col("surt_key") >= surt_prefix)
    if nxt is not None:
        cond = cond & (F.col("surt_key") < nxt)
    return df.filter(cond)
