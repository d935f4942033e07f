"""Stateful streaming sessionization vs its batch twin."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.streaming import events as se
from xarray_spatial_spark.streaming.sessions import (
    sessionize_batch,
    sessionize_stream,
)


def _mk_events(spark):
    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    # user 1: two sessions separated by a 2h gap
    for i in range(5):
        rows.append((1, base + pd.Timedelta(minutes=2 * i), 1.0))
    for i in range(3):
        rows.append((1, base + pd.Timedelta(hours=3, minutes=5 * i), 2.0))
    # user 2: one long session
    for i in range(4):
        rows.append((2, base + pd.Timedelta(minutes=10 * i), 0.5))
    # a "closer" event far in the future advances the watermark so the
    # earlier sessions time out in streaming mode
    rows.append((99, base + pd.Timedelta(days=2), 0.0))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "value"]),
        schema="user_id long, ts timestamp, value double",
    )


def test_batch_sessionize(spark):
    ev = _mk_events(spark)
    out = sessionize_batch(ev, gap_seconds=1800)
    got = {(r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
           for r in out.collect()}
    u1 = sorted(k for k in got if k[0] == 1)
    assert len(u1) == 2
    assert got[u1[0]] == (5, 5.0)
    assert got[u1[1]] == (3, 6.0)
    u2 = [k for k in got if k[0] == 2]
    assert len(u2) == 1 and got[u2[0]] == (4, 2.0)


def test_stream_sessionize_matches_batch_on_closed(spark, tmp_path):
    ev = _mk_events(spark)
    src = str(tmp_path / "src")
    ev.write.parquet(src)

    stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(src)
    out = sessionize_stream(stream, gap_seconds=1800, watermark="10 minutes")
    q = se.run_to_sink(out, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    batch = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in sessionize_batch(ev, gap_seconds=1800).collect()
    }
    # every emitted streaming session must match its batch twin; the
    # watermark-final sessions (the far-future closer, possibly the
    # last per-user sessions) may still sit in state
    assert got, "no sessions closed"
    for k, v in got.items():
        assert batch[k] == v, (k, v, batch.get(k))
    # the 2h gap guarantees user 1's first session closed
    u1_first = min(k[1] for k in batch if k[0] == 1)
    assert (1, u1_first) in got
