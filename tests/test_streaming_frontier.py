"""Streaming crawl frontier (streaming/frontier.py): stream == batch
candidate set, seen-state suppression, robots gate on the stream."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from xarray_spatial_spark.streaming import events as se
from xarray_spatial_spark.streaming.frontier import streaming_frontier

PAGES_SCHEMA = "url string, warc_ts timestamp, html string"


def _pages(spark, n=60):
    """Deterministic page stream fixture: page i links to page
    (i*7)%n and to an off-site target (i%5)."""
    t0 = datetime(2026, 1, 1)
    rows = []
    for i in range(n):
        url = f"https://h{i % 4}.com/p{i}"
        tgt = f"https://h{(i * 7) % n % 4}.com/p{(i * 7) % n}"
        off = f"https://ext{i % 5}.org/x"
        html = f'<a href="{tgt}">t</a> <a href="{off}">o</a>'
        rows.append((url, t0 + timedelta(hours=i), html))
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def test_streaming_frontier_matches_batch_novel_set(spark, tmp_path):
    src = str(tmp_path / "pages")
    _pages(spark).write.parquet(src)

    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_frontier(stream, watermark="10000 hours")
    q = se.run_to_sink(out, str(tmp_path / "out"), str(tmp_path / "ckpt"),
                       mode="append")
    q.awaitTermination(120)
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    got = [r["url"] for r in rows]

    # batch truth: every distinct normalized link target that is NOT
    # itself a fetched page must be emitted; fetched pages MAY appear
    # when a link raced its target's fetch across micro-batches (the
    # documented semantics) but nothing else can
    from xarray_spatial_spark.functions.url import extract_links, url_normalize
    pages = spark.read.parquet(src)
    fetched = {r["u"] for r in pages.select(
        url_normalize("url").alias("u")).collect()}
    linked = {r["u"] for r in pages.select(F.explode(
        extract_links(F.col("html"), F.col("url"))).alias("l")).select(
        url_normalize("l").alias("u")).distinct().collect()}
    expect = linked - fetched
    assert expect <= set(got) <= linked
    # exactly-once per url regardless of races
    assert len(got) == len(set(got))
    ext_hosts = {r["host"] for r in rows
                 if r["url"].startswith("https://ext")}
    assert ext_hosts == {f"ext{i}.org" for i in range(5)}


def test_streaming_frontier_own_url_suppression(spark, tmp_path):
    """A page fetched in an EARLIER micro-batch never re-enters the
    frontier when a later page links to it (alias included)."""
    import os
    import time

    src = str(tmp_path / "pages")
    t0 = datetime(2026, 1, 1)
    # batch 1: fetch of the target page, no links
    spark.createDataFrame(
        [("https://a.com/seen", t0, "no links here")],
        PAGES_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # FileStreamSource orders batches by file mtime
    spark.createDataFrame(
        [("https://b.com/p", t0 + timedelta(minutes=1),
          '<a href="https://a.com/seen#frag">alias</a>'
          '<a href="https://c.com/new">n</a>')],
        PAGES_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    # force distinct mtimes even on coarse filesystems
    files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    assert len(files) == 2

    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_frontier(stream, watermark="100 hours")
    q = se.run_to_sink(out, str(tmp_path / "out"), str(tmp_path / "ckpt"),
                       mode="append")
    q.awaitTermination(120)
    got = {r["url"] for r in
           spark.read.parquet(str(tmp_path / "out")).collect()}
    # a.com/seen: own row from batch 1 holds the state slot, so the
    # batch-2 alias link is suppressed; b.com/p is a fetched page (own
    # rows never surface); only the genuinely novel link is emitted
    assert got == {"https://c.com/new"}


def test_streaming_frontier_robots_gate(spark, tmp_path):
    from xarray_spatial_spark.functions.robots import robots_rules

    src = str(tmp_path / "pages")
    t0 = datetime(2026, 1, 1)
    spark.createDataFrame(
        [("https://a.com/p1", t0,
          '<a href="https://ext0.org/ok">x</a>'
          '<a href="https://ext0.org/private/no">y</a>')],
        PAGES_SCHEMA).write.parquet(src)
    rules = robots_rules(spark.createDataFrame(
        [("ext0.org", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string"))

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
    out = streaming_frontier(stream, rules=rules, watermark="1 hour")
    q = se.run_to_sink(out, str(tmp_path / "out"), str(tmp_path / "ckpt"),
                       mode="append")
    q.awaitTermination(120)
    got = {r["url"] for r in
           spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == {"https://ext0.org/ok"}


def test_streaming_frontier_dedups_across_batches(spark, tmp_path):
    """The same link discovered in later micro-batches is emitted
    once: state suppression across triggers."""
    src = str(tmp_path / "pages")
    t0 = datetime(2026, 1, 1)
    # two files -> two micro-batches with maxFilesPerTrigger=1, same
    # off-site link in both
    for k in range(2):
        spark.createDataFrame(
            [(f"https://a.com/p{k}", t0 + timedelta(minutes=k),
              '<a href="https://ext.org/dup">x</a>')],
            PAGES_SCHEMA).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_frontier(stream, watermark="100 hours")
    q = se.run_to_sink(out, str(tmp_path / "out"), str(tmp_path / "ckpt"),
                       mode="append")
    q.awaitTermination(120)
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    assert [r["url"] for r in rows] == ["https://ext.org/dup"]


class TestChangeRateSink:
    def _captures(self):
        # url A changes every capture, B never, C at capture 3 only;
        # captures split 2/2/2 across three files so every url's
        # history BRIDGES batch boundaries
        rows = []
        for i in range(6):
            ts = f"2026-02-{i + 1:02d} 00:00:00"
            rows.append(("a", ts, f"v{i}", i // 2))
            rows.append(("b", ts, "v", i // 2))
            rows.append(("c", ts, "v" if i < 3 else "w", i // 2))
        return rows

    def test_streamed_state_equals_batch_change_rate(self, spark, tmp_path):
        import pytest as pt

        from xarray_spatial_spark.functions.frontier import change_rate
        from xarray_spatial_spark.streaming.frontier import (
            change_rate_from_state, change_rate_sink)

        src = str(tmp_path / "src")
        for f in range(3):
            batch = [(u, ts, fp) for (u, ts, fp, b) in self._captures()
                     if b == f]
            (spark.createDataFrame(
                batch, "url string, warc_ts string, fingerprint string")
             .selectExpr("url", "CAST(warc_ts AS TIMESTAMP) AS warc_ts",
                         "fingerprint")
             .coalesce(1).write.mode("append").parquet(src))

        state = str(tmp_path / "state")
        stream = (spark.readStream
                  .schema("url string, warc_ts timestamp, fingerprint string")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = (stream.writeStream.foreachBatch(change_rate_sink(state))
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

        full = spark.read.parquet(src)
        want = {r["url"]: r for r in change_rate(full).collect()}
        got = {r["url"]: r
               for r in change_rate_from_state(spark, state).collect()}
        assert set(got) == set(want) == {"a", "b", "c"}
        for u in want:
            for c in ("n_intervals", "n_changes"):
                assert got[u][c] == want[u][c], (u, c)
            assert got[u]["mean_interval_s"] == pt.approx(
                want[u]["mean_interval_s"], rel=1e-12)
            assert got[u]["rate_per_day"] == pt.approx(
                want[u]["rate_per_day"], rel=1e-12)

        # replayed batch id: ledgered no-op (increments are not
        # idempotent)
        sink = change_rate_sink(state)
        sink(full, batch_id=0)
        again = {r["url"]: r
                 for r in change_rate_from_state(spark, state).collect()}
        assert again == got

        # a genuinely new batch extends the history incrementally
        nxt = spark.createDataFrame(
            [("b", "2026-02-07 00:00:00", "CHANGED")],
            "url string, warc_ts string, fingerprint string"
        ).selectExpr("url", "CAST(warc_ts AS TIMESTAMP) AS warc_ts",
                     "fingerprint")
        sink(nxt, batch_id=99)
        after = {r["url"]: r
                 for r in change_rate_from_state(spark, state).collect()}
        assert after["b"]["n_intervals"] == 6
        assert after["b"]["n_changes"] == 1
        assert after["a"] == got["a"]
