"""Custom stateful streaming: gap-based sessionization via
``applyInPandasWithState``.

The engine's example of a stateful operator Spark's built-in windows
can't express: sessions close when a user goes quiet for ``gap``
seconds, not on fixed boundaries.  Per-user state (open session
aggregates) lives in the state store; event-time timeouts flush
sessions whose gap elapsed relative to the watermark — so late data
inside the watermark still extends its session, and the operator is
exactly-once under checkpointed sinks.

Batch twin ``sessionize_batch`` (window lag/cumsum over event time)
defines the semantics; the streaming test asserts agreement on closed
sessions.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, sum_value double"
)
STATE_SCHEMA = "start long, last long, n int, total double"


def sessionize_batch(
    events: DataFrame, gap_seconds: int = 1800,
    user_col: str = "user_id", ts_col: str = "ts", value_col: str = "value",
) -> DataFrame:
    """Batch reference semantics: a new session starts where the gap
    from the previous event of the same user exceeds ``gap_seconds``."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # NTZ timestamps (parquet default in some writers) reject a direct
    # long cast; normalize through TIMESTAMP first
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    marked = events.withColumn(
        "_new",
        (epoch - F.lag(epoch).over(w) > gap_seconds).cast("int"),
    ).na.fill({"_new": 1})
    sessioned = marked.withColumn(
        "_sid", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sessioned.groupBy(user_col, "_sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .drop("_sid")
    )


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "1 hour",
    user_col: str = "user_id", ts_col: str = "ts", value_col: str = "value",
) -> DataFrame:
    """Streaming sessionization: emits each CLOSED session once.

    Within a micro-batch, gaps split sessions immediately; the open
    tail session is kept in per-user state with an event-time timeout
    at ``last_event + gap`` — when the watermark passes it, the state
    times out and the session flushes."""
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        out = []

        def emit(start_us: int, last_us: int, n: int, total: float) -> None:
            out.append(
                {
                    "user_id": user,
                    "session_start": pd.Timestamp(start_us, unit="us"),
                    "session_end": pd.Timestamp(last_us, unit="us"),
                    "n_events": n,
                    "sum_value": total,
                }
            )

        if state.hasTimedOut:
            start, last, n, total = state.get
            emit(start, last, n, total)
            state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
            ts_us = (rows[ts_col].astype("int64") // 1_000).to_numpy()  # ns -> us
            vals = rows[value_col].to_numpy()
            if state.exists:
                start, last, n, total = state.get
            else:
                start, last, n, total = 0, 0, 0, 0.0
            for t, v in zip(ts_us, vals):
                t = int(t)
                if n > 0 and t - last > gap_us:
                    emit(start, last, n, total)
                    n, total = 0, 0.0
                if n == 0:
                    start, last = t, t
                # late (out-of-order) events inside the watermark fold
                # into the open session by widening its bounds
                start = min(start, t)
                last = max(last, t)
                n += 1
                total += float(v)
            state.update((start, last, n, total))
            state.setTimeoutTimestamp(last // 1000 + gap_us // 1000)  # API takes ms
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_start", "session_end",
                     "n_events", "sum_value"],
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
