"""Structured Streaming over the events/documents shape.

The reference is batch-only (SURVEY.md §2.10: no streaming constructs);
the north rule asks for *resumability* (plans/manifest.py), not
streams.  This module is the optional streaming tier: the same zonal /
tile-assignment semantics expressed over an unbounded source, with
watermarked event-time windows and checkpointed sinks — so a
Common-Crawl-style ingest can run continuously with exactly-once file
output.

Ops:
- ``stream_events``      file-stream a directory of events parquet
- ``windowed_zonal``     per-window per-zone stats (watermark + window)
- ``streaming_tile_counts`` per-tile doc counts over a doc stream
- ``run_to_sink``        checkpointed parquet sink helper
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xarray_spatial_spark import grid

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

DOCS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "lat double, lon double, doc_id long"
)


def stream_events(
    spark: SparkSession, path: str, schema: str = EVENTS_SCHEMA,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_zonal(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    zone_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-event-time-window zonal stats with late-data watermark —
    the streaming analog of zonal.stats (groupBy window+zone; Spark
    maintains partial aggregates in state store)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col(zone_col).alias("zone"))
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.avg(value_col).alias("mean"),
            F.min(value_col).alias("min"),
            F.max(value_col).alias("max"),
            F.sum(value_col).alias("sum"),
        )
        .select(F.col("w.start").alias("window_start"), "zone", "count",
                "mean", "min", "max", "sum")
    )


def streaming_tile_counts(
    docs: DataFrame,
    zoom: int = 6,
    watermark: str = "1 hour",
    window: str = "10 minutes",
) -> DataFrame:
    """Tile-assignment over a document stream: JVM-expression tile ids
    (no Python in the streaming hot path), windowed counts."""
    tx = grid.tile_x_col(F.col("lon"), zoom)
    ty = grid.tile_y_col(F.col("lat"), zoom)
    return (
        docs.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            (tx * F.lit(1 << zoom) + ty).alias("tile"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(F.col("w.start").alias("window_start"), "tile", "n_docs")
    )


def run_to_sink(
    df: DataFrame,
    out_path: str,
    checkpoint: str,
    mode: str = "append",
    once: bool = True,
):
    """Checkpointed parquet sink; ``once=True`` processes the available
    backlog then stops (batch-like semantics for tests/backfills)."""
    w = (
        df.writeStream.outputMode(mode)
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
    )
    if once:
        w = w.trigger(availableNow=True)
    return w.start()


def streaming_dedup(
    docs: DataFrame,
    watermark: str = "2 hours",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup: keep the first-seen document per content
    hash inside the watermark horizon (the streaming twin of
    functions/dedup.py:exact_duplicates' keep-one pass).

    ``dropDuplicatesWithinWatermark`` bounds the dedup state by event
    time — the state store holds one 8-byte hash per distinct doc
    inside the horizon instead of growing forever, which is the only
    honest way to dedup an unbounded crawl (a global-forever dedup is
    a batch job over the accumulated table).  Re-crawls arriving more
    than ``watermark`` late can re-emit; tighten or widen to taste."""
    hashed = docs.withColumn("_content_hash", F.xxhash64(F.col(text_col)))
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_content_hash"])
    )
