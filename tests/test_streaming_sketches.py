"""Streaming maintenance of Bloom / Count-Min artifacts
(streaming/sketches.py): micro-batch deltas fold into the stored
artifact and equal the batch build over the whole stream."""

import numpy as np
from pyspark.sql import functions as F

from xarray_spatial_spark.functions import sketch as sk
from xarray_spatial_spark.functions.dedup import bloom_load, bloom_might_contain
from xarray_spatial_spark.streaming import sketches as sk_sinks
from xarray_spatial_spark.streaming.sketches import bloom_sink, cms_sink


def _write_batches(spark, src, n_files=3, rows=400):
    for f in range(n_files):
        rows_f = [(f * rows + i, f"h{(f * rows + i) % 23}.org")
                  for i in range(rows)]
        spark.createDataFrame(rows_f, "id long, host string").coalesce(
            1).write.mode("append").parquet(src)


def test_cms_sink_equals_batch_build(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(spark, src)
    art = str(tmp_path / "cms.parquet")

    stream = (spark.readStream.schema("id long, host string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(cms_sink("host", art, w=1024, d=4))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = sk.cms_load(art)
    want = sk.cms_build(spark.read.parquet(src), "host", w=1024, d=4)
    assert np.array_equal(got, want)

    # replayed batch id: a no-op (sums are not idempotent; the sink
    # records the last applied id)
    sink = cms_sink("host", art, w=1024, d=4)
    sink(spark.read.parquet(src), batch_id=0)
    assert np.array_equal(sk.cms_load(art), want)
    # a NEW batch id does fold in
    sink(spark.createDataFrame([(9_999, "h0.org")], "id long, host string"),
         batch_id=99)
    assert sk.cms_load(art).sum() == want.sum() + 4


def test_bloom_sink_contains_all_streamed(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(spark, src, n_files=2, rows=200)
    art = str(tmp_path / "bloom.parquet")

    stream = (spark.readStream.schema("id long, host string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(bloom_sink("host", art,
                                                    n_bits=1 << 14, k=5))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    bitmap, k = bloom_load(art)
    assert k == 5
    hosts = spark.read.parquet(src).select("host").distinct()
    misses = hosts.filter(
        ~bloom_might_contain(spark, bitmap, F.col("host"), k)).count()
    assert misses == 0  # no false negatives, ever


def test_hll_sink_equals_batch_build(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(spark, src)
    art = str(tmp_path / "hll.parquet")

    stream = (spark.readStream.schema("id long, host string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream
         .foreachBatch(sk_sinks.hll_sink("host", art, p=10))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = sk.hll_load(art)
    want = sk.hll_build(spark.read.parquet(src), "host", p=10)
    assert np.array_equal(got, want)
    assert round(sk.hll_cardinality(got)) == 23  # 23 distinct hosts

    # replay is harmless WITHOUT a ledger check: max-merge is idempotent
    sink = sk_sinks.hll_sink("host", art, p=10)
    sink(spark.read.parquet(src), batch_id=0)
    assert np.array_equal(sk.hll_load(art), want)


def test_kll_sink_equals_batch_build(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(spark, src)
    art = str(tmp_path / "kll.parquet")

    stream = (spark.readStream.schema("id long, host string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.selectExpr("CAST(id % 617 AS DOUBLE) AS v")
         .writeStream.foreachBatch(sk_sinks.kll_sink("v", art, k=128))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = sk.kll_load(art)
    assert got.n == 1200
    # replay is skipped via the batch ledger (merge adds weight)
    sink = sk_sinks.kll_sink("v", art, k=128)
    sink(spark.read.parquet(src).selectExpr("CAST(id AS DOUBLE) AS v"),
         batch_id=0)
    assert sk.kll_load(art).n == 1200
    # quantiles within the rank-error band of the streamed multiset
    vals = np.sort(np.array([(f * 400 + i) % 617
                             for f in range(3) for i in range(400)], float))
    for e, qq in zip(got.quantiles([0.25, 0.5, 0.75]), [0.25, 0.5, 0.75]):
        assert abs(np.searchsorted(vals, e, side="right") / 1200 - qq) < 0.04


def test_kmv_sink_equals_batch_build(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(spark, src)
    art = str(tmp_path / "kmv.parquet")

    stream = (spark.readStream.schema("id long, host string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream
         .foreachBatch(sk_sinks.kmv_sink("host", art, k=64))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got, k = sk.kmv_load(art)
    want = sk.kmv_build(spark.read.parquet(src), "host", k=64)
    assert k == 64 and np.array_equal(got, want)
    assert sk.kmv_cardinality(got, 64) == 23.0  # sub-k: exact
    # replay: min-k merge is idempotent, no ledger needed
    sink = sk_sinks.kmv_sink("host", art, k=64)
    sink(spark.read.parquet(src), batch_id=0)
    assert np.array_equal(sk.kmv_load(art)[0], want)
