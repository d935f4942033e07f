"""robots.txt (RFC 9309) parsing and URL filtering.

The crawl-frontier gate: given the per-host ``robots.txt`` bodies a
crawler has fetched, decide which candidate URLs may be crawled.
Everything follows the public RFC 9309 semantics:

* a group applies when its ``User-agent`` line matches the crawler's
  product token (case-insensitive); absent an exact match the ``*``
  group applies; multiple matching groups merge;
* the rule with the LONGEST matched pattern wins; on a tie ``allow``
  wins; no matching rule means allowed;
* patterns support ``*`` (any run) and a trailing ``$`` end anchor;
  an empty ``Disallow:`` line means allow-everything (no rule).

Scale shape: rule extraction is a narrow Arrow pass over the robots
TABLE (one small body per host — ~millions of rows, not corpus
scale); the page-side decision is a broadcast-able equi-join on host
followed by a per-(url) max_by over matched rules — the frontier
table never shuffles by anything except its own host key, and the
regex match runs JVM-side (codegen ``rlike``) on the already-joined
rows.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.url import url_host


def parse_robots_body(body: str, user_agent: str = "*") -> list[tuple[str, str]]:
    """One robots.txt body -> [(rule, path_pattern)] for the given
    agent, rule in {'allow', 'disallow'}.  Groups for the exact agent
    token override the ``*`` groups (RFC 9309 §2.2.1: the most
    specific matching group applies); comments and unknown directives
    are ignored; an empty Disallow contributes nothing."""
    ua = user_agent.lower()
    groups: dict[str, list[tuple[str, str]]] = {}
    current: list[str] = []
    last_was_ua = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not last_was_ua:
                current = []
            current.append(val.lower())
            for a in (val.lower(),):
                groups.setdefault(a, [])
            last_was_ua = True
            continue
        last_was_ua = False
        if key in ("allow", "disallow") and current:
            if key == "disallow" and val == "":
                continue
            for a in current:
                groups.setdefault(a, []).append((key, val))
    if ua in groups:
        return groups[ua]
    return groups.get("*", [])


def _pattern_regex(pattern: str) -> str:
    """robots path pattern -> anchored Java/RE2-safe regex."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    body = ".*".join(parts)
    return "^" + body + ("$" if anchored else "")


def robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """(host, rule, pattern, pattern_len, pattern_re) rule table for
    one crawler identity — the join side of :func:`robots_filter`."""

    def _rules(batches):
        for pdf in batches:
            hosts, rules, pats, res = [], [], [], []
            for h, b in zip(pdf[host_col], pdf[body_col]):
                for rule, pat in parse_robots_body(b or "", user_agent):
                    hosts.append(h)
                    rules.append(rule)
                    pats.append(pat)
                    res.append(_pattern_regex(pat))
            yield pd.DataFrame({
                "host": hosts, "rule": rules,
                "pattern": pats, "pattern_re": res,
            })

    out = robots.select(host_col, body_col).mapInPandas(
        _rules,
        schema="host string, rule string, pattern string, pattern_re string",
    )
    return out.select(
        "host", "rule", "pattern",
        F.length("pattern").alias("pattern_len"),
        "pattern_re",
    )


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Keep the pages RFC 9309 allows.  Longest-match wins, allow
    wins ties, unmatched/ruleless hosts pass.  ``rules`` comes from
    :func:`robots_rules`; set ``broadcast_rules=False`` when the rule
    table is too big to broadcast (the join falls back to shuffle on
    host and AQE handles hot hosts)."""
    path = F.regexp_extract(
        F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    keyed = pages.withColumn("_host", url_host(F.col(url_col))).withColumn(
        "_path", path)
    # the decision is a function of (host, path) ONLY — compute it on
    # the distinct key set (never drags text/html through a shuffle)
    # and join the verdict back
    keys = keyed.select("_host", "_path").distinct()
    r = F.broadcast(rules) if broadcast_rules else rules
    j = keys.join(r, keys["_host"] == r["host"], "left")
    matched = F.col("pattern_re").isNotNull() & F.expr(
        "_path rlike pattern_re")
    # priority: longest pattern first, allow beats disallow on ties
    prio = F.when(
        matched,
        F.col("pattern_len") * 2 + (F.col("rule") == "allow").cast("int"),
    ).otherwise(F.lit(-1))
    verdict = F.when(matched & (F.col("rule") == "disallow"), F.lit(0)) \
        .otherwise(F.lit(1))
    decisions = j.groupBy("_host", "_path").agg(
        F.max_by(verdict, prio).alias("_allowed"))
    return (
        keyed.join(decisions, ["_host", "_path"])
        .filter(F.col("_allowed") == 1)
        .drop("_host", "_path", "_allowed")
    )


# ---------------------------------------------------------------------------
# sitemaps (sitemaps.org XML + the robots.txt Sitemap: directive)
# ---------------------------------------------------------------------------


def sitemap_refs(robots: DataFrame, host_col: str = "host",
                 body_col: str = "robots_txt") -> DataFrame:
    """(host, sitemap_url) from ``Sitemap:`` directives — the
    discovery half of the protocol.  Directives are global (outside
    any user-agent group), so this is a pure per-line regex."""
    urls = F.expr(
        f"regexp_extract_all({body_col}, '(?im)^\\\\s*sitemap\\\\s*:\\\\s*(\\\\S+)', 1)"
    )
    return robots.select(
        F.col(host_col).alias("host"), F.explode(urls).alias("sitemap_url"))


def sitemap_entries(sitemaps: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Parse sitemaps.org XML bodies -> one row per ``<url>`` entry:
    (loc, lastmod, changefreq, priority) plus every other input
    column; ``<sitemapindex>`` children surface as rows with
    is_index=true (their loc is a nested sitemap to fetch).  Catalyst
    regexes over the (string or binary) xml column — scan-stage."""
    page = F.coalesce(F.col(xml_col).cast("string"), F.lit(""))
    blocks = F.expr(
        "regexp_extract_all(" + xml_col + "_s, '(?is)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>', 1)"
    )
    is_index = page.rlike("(?is)<sitemapindex")

    def field(b, tag):
        return F.nullif(
            F.trim(F.regexp_extract(b, f"(?is)<{tag}[^>]*>(.*?)</{tag}>", 1)),
            F.lit(""))

    exploded = sitemaps.withColumn(f"{xml_col}_s", page).withColumn(
        "_is_index", is_index).select(
        "*", F.explode(blocks).alias("_b")).drop(f"{xml_col}_s")
    return exploded.select(
        *[c for c in sitemaps.columns if c != xml_col],
        field(F.col("_b"), "loc").alias("loc"),
        field(F.col("_b"), "lastmod").alias("lastmod"),
        field(F.col("_b"), "changefreq").alias("changefreq"),
        field(F.col("_b"), "priority").cast("double").alias("priority"),
        F.col("_is_index").alias("is_index"),
    ).filter(F.col("loc").isNotNull())


def robots_rules_per_host(rules: DataFrame) -> DataFrame:
    """(host, rules: array<struct rule,pattern_len,pattern_re>) — the
    broadcastable per-host form for STREAMING gates.  The batch
    :func:`robots_filter` computes verdicts on the distinct (host,
    path) key set, which is a streaming aggregation and cannot run in
    append mode; folding a host's rules into one array turns the gate
    into a stateless broadcast join + per-row array fold."""
    return rules.groupBy("host").agg(
        F.collect_list(
            F.struct("rule", "pattern_len", "pattern_re")).alias("rules"))


def robots_allowed(path: Column, rules_col: Column) -> Column:
    """1/0 verdict of one path against one host's collected rules —
    RFC 9309 longest-match-wins, allow-on-tie, no-rules-pass; the
    same priority encoding as robots_filter (pattern_len*2 + allow
    bit) evaluated as an array fold instead of a max_by aggregate."""
    def prio(r):
        return (r["pattern_len"] * 2
                + (r["rule"] == "allow").cast("int"))

    def verdict(r):
        return F.when(r["rule"] == "disallow", F.lit(0)).otherwise(F.lit(1))

    matched = F.filter(
        rules_col, lambda r: F.regexp_like(path, r["pattern_re"]))
    best = F.aggregate(
        matched,
        F.struct(F.lit(-1).alias("prio"), F.lit(1).alias("verdict")),
        lambda acc, r: F.when(
            prio(r) > acc["prio"],
            F.struct(prio(r).alias("prio"), verdict(r).alias("verdict")),
        ).otherwise(acc),
    )
    return F.when(rules_col.isNull(), F.lit(1)).otherwise(best["verdict"])


# ---------------------------------------------------------------------------
# crawl-delay (de-facto extension) -> politeness timeline
# ---------------------------------------------------------------------------


def parse_crawl_delay(body: str, user_agent: str = "*") -> float | None:
    """One robots.txt body -> Crawl-delay seconds for the given agent,
    or None.  Not in RFC 9309, but the de-facto field large crawlers
    honor; group matching mirrors :func:`parse_robots_body` (the exact
    agent's group overrides ``*``); a malformed or negative value
    reads as absent."""
    ua = user_agent.lower()
    delays: dict[str, float] = {}
    current: list[str] = []
    last_was_ua = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not last_was_ua:
                current = []
            current.append(val.lower())
            last_was_ua = True
            continue
        last_was_ua = False
        if key == "crawl-delay" and current:
            try:
                d = float(val)
            except ValueError:
                continue
            if d >= 0:
                for a in current:
                    delays.setdefault(a, d)
    if ua in delays:
        return delays[ua]
    return delays.get("*")


def crawl_delays(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    user_agent: str = "*",
    default_s: float = 1.0,
) -> DataFrame:
    """(host, delay_s) per host for one crawler identity — hosts whose
    robots.txt carries no (valid) Crawl-delay get ``default_s``.  Same
    Arrow-batched parse shape as :func:`robots_rules`."""

    def _delays(batches):
        for pdf in batches:
            hosts, ds = [], []
            for h, b in zip(pdf[host_col], pdf[body_col]):
                d = parse_crawl_delay(b or "", user_agent)
                hosts.append(h)
                ds.append(default_s if d is None else d)
            yield pd.DataFrame({"host": hosts, "delay_s": ds})

    return robots.select(host_col, body_col).mapInPandas(
        _delays, schema="host string, delay_s double")


def schedule_fetch_times(
    plan: DataFrame,
    delays: DataFrame,
    default_s: float = 1.0,
) -> DataFrame:
    """Turn a :func:`frontier.frontier_schedule` wave plan into
    per-URL fetch OFFSETS honoring each host's crawl delay:
    ``fetch_at_s = wave * delay_s`` (wave w holds at most one URL per
    host, so consecutive waves are exactly one delay apart on every
    host — the politeness contract made into a timeline).  Hosts
    absent from ``delays`` fall back to ``default_s``.  One broadcast
    join; ordering within a wave is the fetcher's concern."""
    d = delays.select(F.col("host").alias("_h"), "delay_s")
    return (
        plan.join(F.broadcast(d), plan["host"] == F.col("_h"), "left")
        .drop("_h")
        .withColumn("delay_s", F.coalesce("delay_s", F.lit(default_s)))
        .withColumn("fetch_at_s", F.col("wave") * F.col("delay_s"))
    )


# ---------------------------------------------------------------------------
# time-aware gating: the capture in force at fetch time
# ---------------------------------------------------------------------------


def robots_rules_snapshots(
    captures: DataFrame,
    host_col: str = "host",
    ts_col: str = "captured_ts",
    body_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """(host, captured_ts, rules array) per robots.txt SNAPSHOT — the
    history-aware sibling of :func:`robots_rules` +
    :func:`robots_rules_per_host`.  Each capture's body parses to its
    own rule array inside ONE Arrow pass (the array is built row-local
    in pandas, so no groupBy/collect_list shuffle is needed — the
    per-host form needs one only because it merges rows)."""

    def _parse(batches):
        for pdf in batches:
            out_rules = []
            for b in pdf[body_col]:
                out_rules.append(
                    [
                        {
                            "rule": rule,
                            "pattern_len": len(pat),
                            "pattern_re": _pattern_regex(pat),
                        }
                        for rule, pat in parse_robots_body(b or "", user_agent)
                    ]
                )
            yield pd.DataFrame(
                {
                    "host": pdf[host_col],
                    "captured_ts": pdf[ts_col],
                    "rules": out_rules,
                }
            )

    cap_ts_type = captures.schema[ts_col].dataType.simpleString()
    return captures.select(host_col, ts_col, body_col).mapInPandas(
        _parse,
        schema=(
            f"host string, captured_ts {cap_ts_type}, rules "
            "array<struct<rule string, pattern_len int, pattern_re string>>"
        ),
    )


def robots_filter_at(
    pages: DataFrame,
    captures: DataFrame,
    url_col: str = "url",
    fetch_ts_col: str = "warc_ts",
    capture_ts_col: str = "captured_ts",
    body_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """Keep the pages the robots.txt capture IN FORCE AT FETCH TIME
    allows — the historically correct gate for replayed/archived
    crawls, where a host's policy changes between snapshots and
    gating every fetch with today's rules mislabels the past.

    Semantics: for each page, the newest capture with
    ``captured_ts <= fetch_ts`` on the same host governs; a fetch
    BEFORE the host's first capture (or on a host with no captures)
    passes, consistent with :func:`robots_filter`'s ruleless-host
    rule.  Within the governing capture, RFC 9309 longest-match /
    allow-on-tie / no-rule-pass via :func:`robots_allowed`.

    Plan shape: snapshots parse in one Arrow pass
    (:func:`robots_rules_snapshots`); the as-of match is the
    union-window plan (plans/asof.py — ONE exchange of keys+captures
    per host, no join node); page PAYLOADS never enter that sort —
    the decision computes on the distinct (host, path, ts) key set
    and joins back, the same keys-only discipline as
    :func:`robots_filter`."""
    from xarray_spatial_spark.plans.asof import asof_join

    path = F.regexp_extract(
        F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    keyed = pages.withColumn("_host", url_host(F.col(url_col))).withColumn(
        "_path", path
    )
    keys = keyed.select(
        "_host", "_path", F.col(fetch_ts_col).alias("_ts")
    ).distinct()

    snaps = robots_rules_snapshots(
        captures,
        ts_col=capture_ts_col,
        body_col=body_col,
        user_agent=user_agent,
    ).select(F.col("host").alias("_host"), F.col("captured_ts").alias("_ts"),
             "rules")

    governed = asof_join(keys, snaps, on="_ts", by="_host")
    verdict = governed.select(
        "_host",
        "_path",
        "_ts",
        (robots_allowed(F.col("_path"), F.col("rules")) == 1).alias("_keep"),
    )
    out = (
        keyed.withColumn("_ts", F.col(fetch_ts_col))
        .join(verdict, ["_host", "_path", "_ts"], "left")
        .filter(F.coalesce(F.col("_keep"), F.lit(True)))
        .drop("_host", "_path", "_ts", "_keep")
    )
    return out
