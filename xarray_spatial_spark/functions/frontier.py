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


def change_rate(
    history: DataFrame,
    id_col: str = "url",
    ts_col: str = "warc_ts",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Per-URL Poisson change-rate estimate from recrawl history —
    the freshness signal a revisit policy needs.

    Input: one row per CAPTURE (url, capture time, content
    fingerprint — e.g. ``text.fingerprint`` or an 8-byte hash).  For
    each url the consecutive-capture pairs give ``n`` observation
    intervals of which ``X`` showed a changed fingerprint; the
    estimator is Cho & Garcia-Molina 2003's bias-reduced
    r_hat = -ln((n - X + 0.5) / (n + 0.5)) changes per mean interval,
    scaled by the observed mean interval into a per-day rate.  (The
    naive X/n collapses at X = n — a page that changed every visit
    has rate "at least one per interval", which the +0.5 regularizer
    turns into a finite high estimate instead of infinity.)

    Pure Catalyst: one lag window + one aggregate, both keyed on
    ``id_col`` (one exchange — the aggregate reuses the window's hash
    partitioning).  URLs with fewer than two captures carry no
    interval evidence and are excluded.  Returns
    ``(url, n_intervals, n_changes, mean_interval_s, rate_per_day)``.
    """
    from pyspark.sql.window import Window

    pairs = (
        history.select(
            F.col(id_col).alias("url"),
            F.unix_timestamp(F.col(ts_col)).cast("double").alias("_t"),
            F.col(fp_col).alias("_fp"),
        )
        .select(
            "url", "_t", "_fp",
            F.lag("_t").over(
                Window.partitionBy("url").orderBy("_t")).alias("_pt"),
            F.lag("_fp").over(
                Window.partitionBy("url").orderBy("_t")).alias("_pfp"),
        )
        .filter(F.col("_pt").isNotNull())
    )
    agg = pairs.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum((F.col("_fp") != F.col("_pfp")).cast("long")).alias("n_changes"),
        F.avg(F.col("_t") - F.col("_pt")).alias("mean_interval_s"),
    )
    r_hat = -F.log(
        (F.col("n_intervals") - F.col("n_changes") + F.lit(0.5))
        / (F.col("n_intervals") + F.lit(0.5)))
    return agg.select(
        "url", "n_intervals", "n_changes", "mean_interval_s",
        (r_hat / F.col("mean_interval_s") * F.lit(86400.0))
        .alias("rate_per_day"),
    )


def revisit_schedule(
    rates: DataFrame,
    budget_per_day: float,
    rate_col: str = "rate_per_day",
) -> DataFrame:
    """Freshness-optimal revisit frequencies under a crawl budget —
    Cho & Garcia-Molina 2003's counterintuitive allocation, solved
    numerically.

    A page with Poisson change rate ``lambda`` revisited every
    ``1/f`` days has steady-state expected freshness
    F = (1 - exp(-lambda/f)) / (lambda/f); maximizing the SUM of
    freshness under ``sum f_i = budget_per_day`` gives each page the
    frequency where the marginal gain dF/df = (1 - (1+r)e^-r)/lambda
    (r = lambda/f) equals a common multiplier mu.  Because the
    marginal gain is capped at 1/lambda, pages with mu*lambda >= 1
    get f = 0: under a tight budget the OPTIMAL policy abandons the
    fastest changers entirely (they'd be stale again before the next
    visit anyway) — the classic result, pinned in tests against the
    proportional-to-rate policy it beats.

    Scale: rates bucket into ~6%-wide logarithmic bins (one hash
    aggregate; the bin count is bounded by the DYNAMIC RANGE of the
    rate column — 16 bins per ln-unit, so even a 10^12 spread is
    <= ~450 bins — never by URLs); the double bisection (inner:
    r(mu, lambda); outer: mu meeting the budget) runs driver-side on
    that histogram and the per-bucket frequency broadcast-joins back.
    Returns the input plus ``revisit_per_day`` and
    ``freshness`` (the expected steady-state freshness at that f)."""
    import numpy as np

    if budget_per_day <= 0:
        raise ValueError("budget_per_day must be positive")
    src = rates.filter(F.col(rate_col) > 0)
    hist_rows = (
        src.select(F.col(rate_col).alias("_r"))
        .groupBy(F.round(F.log("_r") * 16).alias("_b"))  # ~6%-wide bins
        .agg(F.count(F.lit(1)).alias("_cnt"), F.avg("_r").alias("_lam"))
        .orderBy("_b")
        .collect()
    )
    if not hist_rows:
        return rates.withColumn("revisit_per_day", F.lit(0.0)) \
                    .withColumn("freshness", F.lit(0.0))
    lam = np.array([r["_lam"] for r in hist_rows])
    cnt = np.array([r["_cnt"] for r in hist_rows], np.float64)

    def f_of_mu(mu):
        # per-bucket f solving 1 - (1+r)e^-r = mu*lambda, r = lam/f
        out = np.zeros_like(lam)
        for i, l in enumerate(lam):
            target = mu * l
            if target >= 1.0:
                continue  # abandoned page
            lo, hi = 1e-12, 1e3
            for _ in range(80):
                mid = 0.5 * (lo + hi)
                val = 1.0 - (1.0 + mid) * np.exp(-mid)
                if val < target:
                    lo = mid
                else:
                    hi = mid
            out[i] = l / (0.5 * (lo + hi))
        return out

    lo_mu, hi_mu = 0.0, 1.0 / lam.min()
    for _ in range(80):
        mid = 0.5 * (lo_mu + hi_mu)
        total = float((f_of_mu(mid) * cnt).sum())
        if total > budget_per_day:
            lo_mu = mid  # too generous -> raise the bar
        else:
            hi_mu = mid
    f = f_of_mu(hi_mu)
    r = np.divide(lam, f, out=np.full_like(lam, np.inf), where=f > 0)
    fresh = np.where(f > 0, (1.0 - np.exp(-r)) / np.where(r > 0, r, 1.0), 0.0)
    spark = rates.sparkSession
    plan = spark.createDataFrame(
        [(int(h["_b"]), float(ff), float(fr))
         for h, ff, fr in zip(hist_rows, f, fresh)],
        "_b long, revisit_per_day double, freshness double")
    keyed = rates.withColumn(
        "_b", F.when(F.col(rate_col) > 0,
                     F.round(F.log(rate_col) * 16)).otherwise(F.lit(None)))
    out = keyed.join(F.broadcast(plan), "_b", "left").drop("_b")
    return out.withColumn(
        "revisit_per_day", F.coalesce("revisit_per_day", F.lit(0.0))
    ).withColumn(
        # a never-changing page is always fresh; an un-rated one is
        # unknown (0); an abandoned fast changer converges to 0
        "freshness",
        F.coalesce(
            "freshness",
            F.when(F.col(rate_col) <= 0, F.lit(1.0)).otherwise(F.lit(0.0))),
    )


def plan_next_round(
    spark,
    links: DataFrame,
    revisit_state: str | None = None,
    robots: DataFrame | None = None,
    seen: DataFrame | None = None,
    revisit_budget_per_day: float = 1000.0,
    max_per_host: int = 64,
    user_agent: str = "*",
    default_delay_s: float = 1.0,
) -> DataFrame:
    """ONE call from crawl state to the next round's fetch timeline —
    the composition the individual pieces exist for:

    - the DISCOVERY half: candidate ``links`` (url [, priority]),
      normalized, minus ``seen``;
    - the REVISIT half: urls due under the freshness budget —
      :func:`~xarray_spatial_spark.streaming.frontier.change_rate_from_state`
      over the standing state table -> :func:`revisit_schedule`; their
      priority is the allocated revisit frequency (urgency), and they
      BYPASS the seen-filter (being seen is their defining feature);
    - both gate through robots rules, rank into politeness waves
      (:func:`frontier_schedule`), and stretch onto a per-host
      timeline via Crawl-delay
      (:func:`~xarray_spatial_spark.functions.robots.schedule_fetch_times`).

    Returns ``(url, host, priority, wave, delay_s, fetch_at_s,
    kind)`` with kind in {'discover', 'revisit'} (a url in both
    halves counts as revisit).  Scale: the halves union BEFORE the
    single frontier dedup/rank pass, so the exchange story is exactly
    frontier_schedule's; the revisit half adds one scan of the state
    table and the broadcast-joined delay map is host-scale."""
    from xarray_spatial_spark.functions.robots import (
        crawl_delays, robots_rules, schedule_fetch_times)
    from xarray_spatial_spark.functions.url import url_normalize
    from xarray_spatial_spark.streaming.frontier import change_rate_from_state

    pri = (F.col("priority").cast("double") if "priority" in links.columns
           else F.lit(0.0))
    disc = links.select(url_normalize(F.col("url")).alias("url"),
                        pri.alias("priority"))
    if seen is not None:
        s = seen.select(url_normalize(F.col("url")).alias("url")).distinct()
        disc = disc.join(s, "url", "left_anti")
    cand = disc
    rev = None
    if revisit_state is not None:
        rates = change_rate_from_state(spark, revisit_state)
        due = revisit_schedule(rates, revisit_budget_per_day).filter(
            F.col("revisit_per_day") > 0)
        rev = due.select(url_normalize(F.col("url")).alias("url"),
                         F.col("revisit_per_day").alias("priority"))
        cand = disc.unionByName(rev)
    rules = (robots_rules(robots, user_agent=user_agent)
             if robots is not None else None)
    plan = frontier_schedule(cand, priority_col="priority",
                             rules=rules, max_per_host=max_per_host)
    delays = (crawl_delays(robots, user_agent=user_agent,
                           default_s=default_delay_s)
              if robots is not None
              else spark.createDataFrame([], "host string, delay_s double"))
    timed = schedule_fetch_times(plan, delays, default_s=default_delay_s)
    if rev is not None:
        tag = rev.select("url").distinct().withColumn("_rev", F.lit(True))
        timed = timed.join(F.broadcast(tag), "url", "left").withColumn(
            "kind", F.when(F.col("_rev").isNotNull(), F.lit("revisit"))
            .otherwise(F.lit("discover"))).drop("_rev")
    else:
        timed = timed.withColumn("kind", F.lit("discover"))
    return timed
