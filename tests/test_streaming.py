"""Structured Streaming tier: file-stream the events/documents shapes,
windowed aggregates agree with the batch equivalents, checkpointed
sink resumes without reprocessing."""

import numpy as np
from pyspark.sql import functions as F

from xarray_spatial_spark.sources.documents import documents
from xarray_spatial_spark.streaming import events as se


def test_windowed_zonal_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(src)

    stream = se.stream_events(spark, src)
    assert stream.isStreaming
    out = se.windowed_zonal(stream, window="1 hour", watermark="2 hours")
    q = se.run_to_sink(
        out, str(tmp_path / "out"), str(tmp_path / "ckpt"), mode="append"
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "out"))
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type").alias("zone"))
        .agg(F.count(F.lit(1)).alias("count"), F.avg("value").alias("mean"))
        .select(F.col("w.start").alias("window_start"), "zone", "count", "mean")
    )
    g = {(r["window_start"], r["zone"]): (r["count"], r["mean"]) for r in got.collect()}
    b = {(r["window_start"], r["zone"]): (r["count"], r["mean"]) for r in batch.collect()}
    # append mode emits a window only once the watermark passes it: the
    # tail windows (within 2h+1h of max event time) stay in state
    max_ts = spark.read.parquet(src).agg(F.max("ts")).collect()[0][0]
    closed = {
        k for k in b if (max_ts - k[0]).total_seconds() > (2 + 1) * 3600
    }
    assert closed, "fixture too small to close any window"
    assert closed <= set(g) <= set(b)
    for k in set(g):
        assert g[k][0] == b[k][0]
        np.testing.assert_allclose(g[k][1], b[k][1], rtol=1e-9)


def test_streaming_tile_counts_and_resume(spark, tmp_path):
    src = str(tmp_path / "docs")
    documents(spark, 2000).write.parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema(se.DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        # 2000 docs span ~33 min of event time; watermark must be
        # shorter for append mode to close any window
        out = se.streaming_tile_counts(
            stream, zoom=4, window="10 minutes", watermark="2 minutes"
        )
        q = se.run_to_sink(
            out, str(tmp_path / "tiles"), str(tmp_path / "tiles_ckpt")
        )
        q.awaitTermination(120)

    run_once()
    n1 = spark.read.parquet(str(tmp_path / "tiles")).count()
    assert n1 > 0
    # resume with no new files: checkpoint prevents reprocessing
    run_once()
    n2 = spark.read.parquet(str(tmp_path / "tiles")).count()
    assert n2 == n1
    # new backlog appears -> picked up incrementally
    documents(spark, 1000).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 30 DAYS")
    ).write.mode("append").parquet(src)
    run_once()
    n3 = spark.read.parquet(str(tmp_path / "tiles")).count()
    assert n3 > n1


def test_streaming_dedup_keeps_one_per_content(spark, tmp_path):
    """Planted duplicate texts collapse to one survivor per content
    hash; unique docs all pass through."""
    src = str(tmp_path / "docs_dup")
    d = documents(spark, 500)
    dup = d.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    d.union(dup).write.parquet(src)

    stream = spark.readStream.schema(se.DOCS_SCHEMA).option(
        "maxFilesPerTrigger", 4
    ).parquet(src)
    out = se.streaming_dedup(stream, watermark="10 minutes")
    q = se.run_to_sink(
        out.select("doc_id", "_content_hash"),
        str(tmp_path / "out"), str(tmp_path / "ckpt"), mode="append",
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "out"))
    n_distinct_texts = d.union(dup).select(
        F.xxhash64("text").alias("h")).distinct().count()
    assert got.count() == n_distinct_texts
    assert got.select("_content_hash").distinct().count() == n_distinct_texts


def test_streaming_corpus_pass(spark, tmp_path):
    """prepare_corpus_stream: quality gate + watermark dedup + PII
    redaction over a file stream; survivors match the batch twin's
    CONTENT set (streaming keeps first-seen, batch keeps smallest id —
    same distinct texts either way)."""
    from xarray_spatial_spark.functions import corpus

    src = str(tmp_path / "docs_corpus")
    d = documents(spark, 400).select("doc_id", "warc_ts", "text").withColumn(
        "text",
        F.concat(F.lit("the shape of the data and that of the run "),
                 F.col("text"), F.lit(" ping ab@cd.ef")),
    )
    dup = d.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    d.union(dup).write.parquet(src)

    schema = "doc_id long, warc_ts timestamp, text string"
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 4
    ).parquet(src)
    out = corpus.prepare_corpus_stream(stream, min_words=20,
                                       watermark="10 minutes")
    q = se.run_to_sink(
        out.select("doc_id", "text"),
        str(tmp_path / "corpus_out"), str(tmp_path / "corpus_ckpt"),
        mode="append",
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "corpus_out"))
    batch = corpus.prepare_corpus(d.union(dup), min_words=20)
    got_texts = {r["text"] for r in got.collect()}
    want_texts = {r["text"] for r in batch.collect()}
    assert got_texts == want_texts and len(got_texts) > 0
    assert not any("ab@cd.ef" in t for t in got_texts)
