"""Streaming crawl frontier — the continuous half of the crawl loop.

Batch :func:`~xarray_spatial_spark.functions.frontier.frontier_schedule`
plans a fetch ROUND from a settled link table; this module is the
continuous feeder: an unbounded stream of fetched pages turns into an
unbounded stream of novel candidate URLs, with the seen-set kept in
the state store and bounded by a watermark instead of growing forever.

Stage shape (all stateless except the one dedup):
- link extraction + RFC 3986 resolution: scan-stage Catalyst on each
  micro-batch (functions.url.extract_links — identical semantics to
  batch, so stream==batch equivalence is testable row-for-row);
- URL canonicalization (url_normalize) so refetch aliases collapse
  BEFORE they enter dedup state;
- ``dropDuplicatesWithinWatermark`` on the canonical url: the
  state-store-backed "have I emitted this recently" set, evicted by
  event-time watermark — the streaming stand-in for the Bloom-filter
  seen-set (functions.dedup.bloom_filter_seen covers the
  beyond-watermark horizon in the batch round);
- robots gate as a stream-static join against a parsed rules frame
  (stateless per micro-batch; rules broadcast).

Politeness waves stay a BATCH concern by design: wave assignment is a
per-host ranking over a settled candidate set, and a crawl scheduler
runs it per round over the accumulated frontier sink — ranking an
unbounded stream would mean unbounded state for no operational gain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.url import (
    extract_links,
    url_host,
    url_normalize,
)


def streaming_frontier(
    pages: DataFrame,
    rules: DataFrame | None = None,
    watermark: str = "2 hours",
    ts_col: str = "warc_ts",
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Fetched-page stream -> (ts, url, host) novel-candidate stream.

    ``pages`` is an unbounded frame (readStream) with fetch timestamp,
    page url and html payload; ``rules`` an optional STATIC parsed
    robots frame (functions.robots.robots_rules).  A candidate is
    emitted at most once per watermark horizon; the page's own URL is
    also folded into the dedup state so a just-fetched page doesn't
    re-enter the frontier through a self-link alias."""
    links = pages.select(
        F.col(ts_col).alias("ts"),
        F.explode(
            extract_links(F.col(html_col), F.col(url_col))).alias("_u"),
        F.lit(False).alias("_own"),
    )
    own = pages.select(
        F.col(ts_col).alias("ts"), F.col(url_col).alias("_u"),
        F.lit(True).alias("_own"))
    # own rows ride INTO dedup state (so a fetched page's aliases stop
    # re-entering the frontier) but are filtered from the OUTPUT after
    # the dedup keeps one row per url.  If a page's own record and a
    # link to it land in the same micro-batch, which row wins is
    # batch-order-dependent — at crawl timescales a link that raced
    # its target's fetch by one trigger is an acceptable re-candidate.
    cand = (
        links.unionByName(own)
        .select("ts", url_normalize(F.col("_u")).alias("url"), "_own")
        .filter(F.col("url").rlike("(?i)^https?://"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["url"])
        .filter(~F.col("_own"))
        .drop("_own")
    )
    if rules is not None:
        # the batch robots_filter computes verdicts on a DISTINCT key
        # set — a streaming aggregation, illegal in append mode; the
        # streaming gate is the stateless per-host-rules-array form
        from xarray_spatial_spark.functions.robots import (
            robots_allowed,
            robots_rules_per_host,
        )

        per_host = robots_rules_per_host(rules)
        path = F.regexp_extract(
            F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
        path = F.when(path == "", F.lit("/")).otherwise(path)
        cand = (
            cand.withColumn("_h", url_host(F.col("url")))
            .join(F.broadcast(per_host),
                  F.col("_h") == per_host["host"], "left")
            .filter(robots_allowed(path, F.col("rules")) == 1)
            .drop("host", "rules", "_h")
        )
    return cand.withColumn("host", url_host(F.col("url")))
