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


def change_rate_sink(
    state_table: str,
    id_col: str = "url",
    ts_col: str = "warc_ts",
    fp_col: str = "fingerprint",
):
    """foreachBatch callback folding capture micro-batches into a
    per-URL change-observation STATE table — the continuous feeder for
    :func:`~xarray_spatial_spark.functions.frontier.revisit_schedule`,
    so the recrawl planner never replays history.

    State row per url: ``(url, last_t, last_fp, n_intervals,
    n_changes, sum_interval_s)`` — the sufficient statistics of
    change_rate's estimator (its mean interval is sum/n).  Each batch:
    intra-batch pairs come from one lag window over the batch's own
    captures; ONE bridge pair joins each url's first batch capture to
    the stored last capture; the updated rows MERGE INTO an Iceberg
    state table (sources.iceberg_format.merge_into), so only files
    holding touched urls rewrite and every planning round can time
    travel to earlier freshness states.  Increments are not
    idempotent, hence the recorded-batch-id ledger (the Count-Min
    contract).  Captures are event-time ordered per url WITHIN a
    batch by the window; a batch whose earliest capture predates the
    stored last_t would double-count an interval — feed this sink
    from an ordered source (the crawler's own fetch log is).

    Use :func:`change_rate_from_state` to read rates back."""
    import os

    from xarray_spatial_spark.sources import iceberg_format as I
    from xarray_spatial_spark.streaming.sketches import (
        _last_batch, _record_batch)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_batch(state_table):
            return
        from pyspark.sql.window import Window

        spark = batch_df.sparkSession
        w = Window.partitionBy("url").orderBy("_t")
        caps = batch_df.select(
            F.col(id_col).alias("url"),
            F.unix_timestamp(F.col(ts_col)).cast("double").alias("_t"),
            F.col(fp_col).alias("_fp"),
        ).select(
            "url", "_t", "_fp",
            F.lag("_t").over(w).alias("_pt"),
            F.lag("_fp").over(w).alias("_pfp"),
        )
        delta = caps.groupBy("url").agg(
            F.sum(F.when(F.col("_pt").isNotNull(), 1).otherwise(0)
                  ).alias("_n_b"),
            F.sum(F.when(F.col("_pt").isNotNull()
                         & (F.col("_fp") != F.col("_pfp")), 1).otherwise(0)
                  ).alias("_x_b"),
            F.sum(F.when(F.col("_pt").isNotNull(),
                         F.col("_t") - F.col("_pt")).otherwise(0.0)
                  ).alias("_dt_b"),
            F.min_by(F.col("_t"), F.col("_t")).alias("_first_t"),
            F.min_by(F.col("_fp"), F.col("_t")).alias("_first_fp"),
            F.max_by(F.col("_t"), F.col("_t")).alias("_last_t"),
            F.max_by(F.col("_fp"), F.col("_t")).alias("_last_fp"),
        )
        exists = os.path.exists(os.path.join(state_table, "metadata"))
        if exists:
            prev = I.read_iceberg(spark, state_table).select(
                "url", F.col("last_t").alias("_s_t"),
                F.col("last_fp").alias("_s_fp"),
                F.col("n_intervals").alias("_s_n"),
                F.col("n_changes").alias("_s_x"),
                F.col("sum_interval_s").alias("_s_dt"))
            joined = delta.join(prev, "url", "left")
        else:
            joined = (delta
                      .withColumn("_s_t", F.lit(None).cast("double"))
                      .withColumn("_s_fp", F.lit(None).cast("string"))
                      .withColumn("_s_n", F.lit(None).cast("long"))
                      .withColumn("_s_x", F.lit(None).cast("long"))
                      .withColumn("_s_dt", F.lit(None).cast("double")))
        bridged = F.col("_s_t").isNotNull()
        new = joined.select(
            "url",
            F.col("_last_t").alias("last_t"),
            F.col("_last_fp").alias("last_fp"),
            (F.coalesce("_s_n", F.lit(0)) + F.col("_n_b")
             + bridged.cast("long")).alias("n_intervals"),
            (F.coalesce("_s_x", F.lit(0)) + F.col("_x_b")
             + (bridged & (F.col("_s_fp") != F.col("_first_fp")))
             .cast("long")).alias("n_changes"),
            (F.coalesce("_s_dt", F.lit(0.0)) + F.col("_dt_b")
             + F.when(bridged, F.col("_first_t") - F.col("_s_t"))
             .otherwise(0.0)).alias("sum_interval_s"),
        )
        if exists:
            I.merge_into(new, state_table, on=["url"])
        else:
            I.write_iceberg(new, state_table)
        _record_batch(state_table, batch_id)

    return _sink


def change_rate_from_state(spark, state_table: str) -> DataFrame:
    """Per-URL change rates from a :func:`change_rate_sink` state
    table — identical estimator to the batch
    :func:`~xarray_spatial_spark.functions.frontier.change_rate`
    (sum/n IS its mean interval), so streamed-state rates equal a
    full-history batch pass (pinned).  URLs still on their first
    capture carry no interval evidence and are excluded, same as the
    batch path."""
    from xarray_spatial_spark.sources import iceberg_format as I

    st = I.read_iceberg(spark, state_table).filter(F.col("n_intervals") > 0)
    r_hat = -F.log(
        (F.col("n_intervals") - F.col("n_changes") + F.lit(0.5))
        / (F.col("n_intervals") + F.lit(0.5)))
    mean_dt = F.col("sum_interval_s") / F.col("n_intervals")
    return st.select(
        "url", "n_intervals", "n_changes",
        mean_dt.alias("mean_interval_s"),
        (r_hat / mean_dt * F.lit(86400.0)).alias("rate_per_day"),
    )
