"""As-of join and interval (range) join — the two temporal/ordinal
join shapes Spark's optimizer has no native operator for, each
expressed as compositions that shuffle once and never fall back to
BroadcastNestedLoopJoin.

As-of join (pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics):
for every left row, the single right row with the largest timestamp
<= the left timestamp (backward; ``direction="forward"`` mirrors it)
within the same key.  Crawl uses: join each fetch to the robots.txt
capture in force at fetch time, each page to the newest sitemap entry
before it, a price/quota snapshot to the events it governed.

The Spark-first plan is the UNION-WINDOW trick, not a join at all:
tag both sides, union, ONE window per key ordered by (ts, side) with
``last(payload, ignoreNulls=True)`` — every left row picks up the
most recent right payload in pure sorted-stream order.  Cost: one
exchange + one sort of |L|+|R| rows, no join, no row explosion, and
no equality-key requirement on timestamps.  (The naive formulations
are a non-equi join — BroadcastNestedLoop, quadratic — or a windowed
self-join per candidate; both collapse at scale.)  A hot key
serializes its window partition: that is inherent to per-key ordering
(same as any sessionization), and the ``by``-key cardinality of real
crawl tables (host, url) keeps partitions bounded.

Interval join: points-in-ranges (ip-to-geo tables, time-interval
containment, genomic overlap).  Spark plans `p BETWEEN lo AND hi`
joins as BroadcastNestedLoop — every point against every interval.
``interval_join`` buckets instead: intervals EXPLODE to the fixed-
width bins they cover, points map to their single bin, the two sides
equi-join on (key, bin) — hash join, AQE-managed — and the exact
containment predicate filters the survivors.  Cost scales with
points + total interval-bin coverage; ``bin_width`` trades explosion
factor (avg interval length / width) against join selectivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    how: str = "left",
    suffix: str = "_r",
) -> DataFrame:
    """Left rows joined to the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) their ``on`` value,
    per ``by`` key.  Exact matches count (merge_asof default).  Right
    rows are first deduplicated to one per (by, on) — the struct-max
    — so results are deterministic whatever the input order.

    Output: all left columns, plus every non-key right column
    (suffixed on collision), plus ``<on><suffix>`` = the matched
    right timestamp (null when unmatched).  ``how``: "left" keeps
    unmatched left rows, "inner" drops them.  ``tolerance`` (same
    units as ``on``) voids matches farther than that from the left
    timestamp."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    by_cols = [by] if isinstance(by, str) else list(by or [])

    payload_cols = [c for c in right.columns if c != on and c not in by_cols]
    out_names = {}
    for c in payload_cols:
        out_names[c] = c + suffix if c in left.columns else c
    ts_out = on + suffix

    packed = right.select(
        *by_cols,
        F.col(on).alias("_asof_ts"),
        F.struct(
            F.col(on).alias("_mts"), *[F.col(c) for c in payload_cols]
        ).alias("_p"),
    )

    lt = left.select(
        *by_cols,
        F.lit(1).alias("_side"),
        F.col(on).alias("_asof_ts"),
        F.lit(None).cast(packed.schema["_p"].dataType).alias("_p"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    rt = packed.select(
        *by_cols,
        F.lit(0).alias("_side"),
        "_asof_ts",
        "_p",
        F.lit(None).cast(lt.schema["_l"].dataType).alias("_l"),
    )
    u = lt.unionByName(rt)

    # ordering does three jobs in ONE exchange+sort: ts puts rights
    # before the lefts they match; _side 0-before-1 makes exact
    # matches inclusive; trailing _p makes the struct-MAX right row
    # the last (thus chosen) one among duplicate right timestamps —
    # determinism without a separate dedup aggregate/shuffle
    if direction == "backward":
        w = Window.partitionBy(*by_cols).orderBy(
            F.asc("_asof_ts"), F.asc("_side"), F.asc("_p")
        )
    else:
        w = Window.partitionBy(*by_cols).orderBy(
            F.desc("_asof_ts"), F.asc("_side"), F.asc("_p")
        )
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    matched = u.withColumn("_m", F.last("_p", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )

    m = F.col("_m")
    if tolerance is not None:
        gap = (
            (F.col("_asof_ts") - m["_mts"])
            if direction == "backward"
            else (m["_mts"] - F.col("_asof_ts"))
        )
        m = F.when(gap <= F.lit(tolerance), F.col("_m"))
    out = matched.select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        m["_mts"].alias(ts_out),
        *[m[c].alias(out_names[c]) for c in payload_cols],
    )
    if how == "inner":
        out = out.filter(F.col(ts_out).isNotNull())
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    by: str | list[str] | None = None,
    bin_width: int = 1024,
    how: str = "inner",
) -> DataFrame:
    """Each point row joined to every interval row whose
    ``[lo, hi]`` (inclusive) contains it, matching ``by`` keys when
    given.  Bucketed equi-join plan (module docstring): intervals
    explode to covered ``bin_width`` bins via ``sequence`` —
    scan-stage, no Python — points map to one bin, hash-join on
    (by, bin), exact BETWEEN filter after.  ``how="left"`` keeps
    pointless rows with null interval columns via a second anti-join
    branch (two joins, still never a nested loop)."""
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    bw = int(bin_width)
    if bw <= 0:
        raise ValueError("bin_width must be positive")
    clash = (set(points.columns) & set(intervals.columns)) - set(by_cols)
    if clash:
        raise ValueError(
            f"ambiguous columns on both sides: {sorted(clash)} — rename"
        )

    ivals = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bw), F.floor(F.col(hi_col) / bw)
            )
        ),
    )
    pts = points.withColumn("_bin", F.floor(F.col(point_col) / bw))
    keys = by_cols + ["_bin"]
    joined = pts.join(ivals, keys, "inner").filter(
        F.col(point_col).between(F.col(lo_col), F.col(hi_col))
    )
    ival_payload = [
        c for c in intervals.columns if c not in by_cols
    ]
    out = joined.select(*points.columns, *ival_payload)
    if how == "left":
        # unmatched = anti-join against the MATCHED point set (a bin
        # hit alone is not a match; the exact filter may have dropped
        # every interval sharing the bin)
        matched_pts = out.select(*points.columns).distinct()
        missed = points.join(matched_pts, points.columns, "left_anti")
        for c in ival_payload:
            missed = missed.withColumn(
                c, F.lit(None).cast(joined.schema[c].dataType)
            )
        out = out.unionByName(missed)
    return out
