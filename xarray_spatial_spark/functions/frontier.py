"""Crawl-frontier scheduling — the step that closes the crawl loop.

``url.link_edges`` turns fetched pages into outlinks; the frontier is
what to fetch NEXT.  :func:`frontier_schedule` takes candidate URLs
and produces a politeness-scheduled fetch plan: canonicalize + dedup,
drop already-seen URLs, drop robots-forbidden ones, cap each host's
budget, and assign every survivor a ``wave`` such that wave *w*
contains at most one URL per host — a fetcher that processes waves in
order never hits a host twice in one round, which is the standard
crawl-politeness contract (Heydon & Najork, Mercator 1999).

Scale shape: one dedup shuffle on the 8-byte url hash-key space, one
anti-join against ``seen`` (broadcast when small; swap in
``dedup.bloom_filter_seen`` upstream when the seen-set is billions),
and the per-host ranking reuses :func:`corpus.host_cap`'s EXACT
salted two-phase top-k so a zipfian megahost bounds its task at
~n_salts*k rows instead of its full candidate share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.url import url_host, url_normalize


def frontier_schedule(
    links: DataFrame,
    url_col: str = "url",
    priority_col: str | None = None,
    seen: DataFrame | None = None,
    seen_col: str = "url",
    rules: DataFrame | None = None,
    max_per_host: int = 64,
) -> DataFrame:
    """(url, host, priority, wave) fetch plan from candidate links.

    ``priority_col`` ranks within a host (higher first; absent = 0,
    ties break on url for run-to-run determinism); duplicates keep
    their best priority.  ``seen`` is an optional frame of already
    fetched/known URLs (anti-joined after normalization, so refetch
    aliases of a seen page are dropped too).  ``rules`` is a parsed
    robots frame (:func:`robots.robots_rules`, already selected for
    one crawler identity) applied via :func:`robots.robots_filter`.
    ``max_per_host`` caps each host's budget per scheduling round —
    it is also what bounds the megahost window task (see module
    docstring); wave numbers run 0..max_per_host-1.
    """
    from xarray_spatial_spark.functions.corpus import host_cap

    pri = (F.col(priority_col).cast("double") if priority_col
           else F.lit(0.0))
    cand = (
        links.select(url_normalize(F.col(url_col)).alias("url"),
                     pri.alias("priority"))
        .filter(F.col("url").rlike("(?i)^https?://"))
        .groupBy("url")
        .agg(F.max("priority").alias("priority"))
    )
    if seen is not None:
        seen_n = seen.select(
            url_normalize(F.col(seen_col)).alias("url")).distinct()
        cand = cand.join(seen_n, "url", "left_anti")
    if rules is not None:
        from xarray_spatial_spark.functions.robots import robots_filter

        cand = robots_filter(cand, rules, url_col="url")
    capped = host_cap(
        cand.withColumn("host", url_host(F.col("url"))),
        k=max_per_host, score_col="priority",
        host_col="host", id_col="url",
    )
    return capped.select(
        "url", "host", "priority",
        (F.col("host_rank") - 1).cast("int").alias("wave"),
    )
