"""End-to-end corpus preparation — the composed training-data pass.

``prepare_corpus`` chains the engine's text-pipeline stages in the
order a production pretraining pipeline runs them (C4/RefinedWeb
shape):

1. quality gate   — :func:`text.gopher_keep` (codegen, scan stage)
2. language gate  — :func:`text.langid` == ``lang`` (optional)
3. exact dedup    — keep the smallest id per byte-identical text
                    (:func:`dedup.distinct_by_text`; only 8-byte
                    hashes shuffle)
4. PII redaction  — :func:`text.redact_pii` on the survivors

The stage ORDER is part of the contract and of the cost model:
filters run before the dedup shuffle (shrink the shuffle), redaction
runs last (only surviving rows pay the regex chain).  All stages are
single-scan Catalyst except the one dedup shuffle.

``corpus_stats`` summarizes any corpus frame in one aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xarray_spatial_spark.functions import dedup
from xarray_spatial_spark.functions import text as tx


def prepare_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100000,
    lang: str | None = None,
    redact: bool = True,
    url_col: str | None = None,
    host_cap_k: int | None = None,
    c4: bool = False,
    drop_ppl_tail: bool = False,
) -> DataFrame:
    """[C4 line/page cleanup] -> filter -> dedup -> [host cap] ->
    [drop perplexity tail] -> redact; returns the surviving rows with
    the text column rewritten in place.  See module docstring for the
    stage order rationale.  ``host_cap_k`` (with ``url_col``) inserts
    the per-host quality cap after dedup — capping before dedup would
    let duplicates consume a host's budget.  ``c4=True`` runs the C4
    rules FIRST (line cleanup changes the text every later stage
    sees — that is the C4 pipeline's own order); ``drop_ppl_tail``
    drops the worst perplexity bucket under the corpus's own KN LM
    (CCNet keeps head+middle) AFTER dedup so boilerplate copies don't
    distort the percentiles."""
    out = df
    if c4:
        out = tx.c4_filter(out, text_col=text_col)
    out = out.filter(
        tx.gopher_keep(F.col(text_col), min_words=min_words,
                       max_words=max_words)
    )
    if lang is not None:
        out = out.filter(tx.langid(F.col(text_col)) == lang)
    out = dedup.distinct_by_text(out, text_col=text_col, id_col=id_col)
    if host_cap_k is not None:
        if url_col is None:
            raise ValueError("host_cap_k needs url_col")
        out = host_cap(
            out.withColumn("_q", tx.quality_score(F.col(text_col))),
            k=host_cap_k, score_col="_q", url_col=url_col, id_col=id_col,
        ).drop("_q", "host_rank")
    if drop_ppl_tail:
        buckets = tx.perplexity_buckets(
            out.select(id_col, text_col), text_col=text_col, id_col=id_col)
        keep_ids = buckets.filter(
            F.col("bucket").isin("head", "middle", "unscored")
        ).select(id_col)
        out = out.join(keep_ids, id_col, "left_semi")
    if redact:
        out = out.withColumn(text_col, tx.redact_pii(F.col(text_col)))
    return out


def prepare_corpus_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "2 hours",
    min_words: int = 50,
    max_words: int = 100000,
    lang: str | None = None,
    redact: bool = True,
) -> DataFrame:
    """Streaming twin of :func:`prepare_corpus` for an unbounded crawl
    (``spark.readStream`` input).  Same stage order; the dedup stage is
    the watermark-bounded keep-FIRST-SEEN of
    :func:`streaming.events.streaming_dedup` (a global keep-smallest-id
    dedup over an unbounded stream is a batch job over the accumulated
    table — the state store must be horizon-bounded).  Stateless stages
    (quality gate, language gate, redaction) apply unchanged."""
    from xarray_spatial_spark.streaming.events import streaming_dedup

    out = docs.filter(
        tx.gopher_keep(F.col(text_col), min_words=min_words,
                       max_words=max_words)
    )
    if lang is not None:
        out = out.filter(tx.langid(F.col(text_col)) == lang)
    out = streaming_dedup(out, watermark=watermark, ts_col=ts_col,
                          text_col=text_col).drop("_content_hash")
    if redact:
        out = out.withColumn(text_col, tx.redact_pii(F.col(text_col)))
    return out


def pack_sequences(
    df: DataFrame,
    target_tokens: int,
    len_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy sequential sample packing: concatenate documents in
    ``id_col`` order and cut every ``target_tokens`` — each doc gets
    the ``bin_id`` of its starting offset (the standard pretraining
    packing rule; a doc may straddle its bin's end, exactly as the
    concatenated token stream would).

    Distributed scan, not a single-task window: the global running
    token count comes from :func:`plans.ranks.global_cumsum` (range
    partition + parallel local cumsum + broadcast offsets), so packing
    10^12 docs costs two small shuffles.  Adds ``n_tokens``,
    ``start_offset``, ``bin_id``."""
    if target_tokens <= 0:
        raise ValueError("target_tokens must be positive")
    from xarray_spatial_spark.plans.ranks import global_cumsum

    lens = df.withColumn(
        "n_tokens",
        F.col(len_col) if len_col else tx.token_count(F.col(text_col)),
    )
    cum = global_cumsum(lens, order_col=id_col, value_col="n_tokens",
                        out_col="_cum")
    return (
        cum.withColumn("start_offset", F.col("_cum") - F.col("n_tokens"))
        .withColumn(
            "bin_id", F.floor(F.col("start_offset") / target_tokens)
        )
        .drop("_cum")
    )


def sample_mixture(
    df: DataFrame,
    fractions: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Deterministic per-source subsampling to a target mixture
    (DoReMi-style static domain weights): keep a doc iff
    ``pmod(xxhash64(id, salt), 1e6) < frac(source) * 1e6``.

    Hash-based, not rand(): the same doc keeps/drops at any
    parallelism, on resume, and in the SQL oracle — the engine's
    determinism rule.  Sources absent from ``fractions`` get
    ``default``.  Pure codegen filter in the scan stage."""
    M = 1_000_000
    expr = F.lit(int(default * M))
    for src, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {src!r} must be in [0, 1]")
        expr = F.when(F.col(source_col) == src, F.lit(int(frac * M))).otherwise(expr)
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(M))
    return df.filter(bucket < expr)


def temperature_mixture(
    df: DataFrame,
    alpha: float,
    budget_tokens: int | None = None,
    source_col: str = "source",
    len_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Temperature-based mixture rebalancing (the mT5/XLM-R alpha
    recipe): target share of source i is p_i^alpha renormalized,
    where p_i is its token share — alpha=1 keeps the natural mix,
    alpha=0 forces uniform, 0<alpha<1 boosts low-resource sources.

    One per-source token aggregation (bounded by distinct sources)
    sizes the plan driver-side; each source then gets a REAL factor
    f_i = budget*q_i / tokens_i realized deterministically: every doc
    is kept floor(f_i) times plus one more iff
    pmod(xxhash64(id, salt), 1e6) < frac(f_i)*1e6 — the
    :func:`sample_mixture` hash rule extended to f_i > 1, so
    low-resource UPSAMPLING (docs repeated with a ``copy`` index) and
    high-resource downsampling come out of the same expression, at
    any parallelism, identically on resume.  ``budget_tokens``
    defaults to the corpus total (pure rebalance)."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    totals = {
        r["s"]: r["t"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.sum(len_col).alias("t")).collect()
        if r["t"]
    }
    if not totals:
        return df.withColumn("copy", F.lit(0)).limit(0)
    grand = sum(totals.values())
    budget = grand if budget_tokens is None else int(budget_tokens)
    q = {s_: (t / grand) ** alpha for s_, t in totals.items()}
    qsum = sum(q.values())
    M = 1_000_000
    factor = F.lit(0.0)
    for s_, t in totals.items():
        f_i = budget * (q[s_] / qsum) / t
        factor = F.when(F.col(source_col) == s_, F.lit(f_i)).otherwise(factor)
    whole = F.floor(factor).cast("int")
    frac_gate = (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(M))
        < ((factor - whole) * M).cast("long")
    ).cast("int")
    copies = (whole + frac_gate).alias("_copies")
    return (
        df.withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .withColumn("copy", F.explode(F.sequence(F.lit(0), F.col("_copies") - 1)))
        .drop("_copies")
    )


def _auto_salts(df: DataFrame, key) -> int | None:
    """Skew probe for the hot-key window ops: ONE counting job
    (map-side partial agg -> key-scale shuffle -> 1-row max) decides
    whether the biggest key would overflow its fair task share.

    Salt when ``max_key_rows > skewFactor * rows/shuffle_partitions``
    — the literal definition of a skewed window key — with
    ``n_salts = ceil(max_key / fair_share)`` capped at ``maxSalts``.
    The production-shaped default is therefore safe without caller
    hints: a zipfian megahost trips the pre-cut automatically, a
    balanced key map skips it (both pytest-asserted), and the pre-cut
    itself is EXACT for any salt count, so results never change.

    Cost note: the probe re-runs ``df``'s lineage once to count keys.
    Callers that already know the shape pass ``n_salts`` explicitly
    (or 0 to force unsalted), or set
    ``spark.xrspatial.salt.auto=false`` session-wide.

    Confs: ``spark.xrspatial.salt.auto`` (default true),
    ``.skewFactor`` (default 4), ``.maxSalts`` (default 64)."""
    spark = df.sparkSession
    if spark.conf.get("spark.xrspatial.salt.auto", "true").lower() != "true":
        return None
    factor = float(spark.conf.get("spark.xrspatial.salt.skewFactor", "4"))
    cap = int(spark.conf.get("spark.xrspatial.salt.maxSalts", "64"))
    row = (
        df.groupBy(key.alias("_k"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.sum("_n").alias("_tot"), F.max("_n").alias("_max"))
        .collect()[0]
    )
    if not row["_tot"]:
        return None
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    fair = max(1.0, row["_tot"] / parts)
    if row["_max"] <= factor * fair:
        return None
    return max(2, min(cap, -(-int(row["_max"]) // int(fair))))


def token_quota(
    df: DataFrame,
    per_source_tokens: int,
    source_col: str = "source",
    len_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_salts: int | None = None,
) -> DataFrame:
    """Cap each source's contribution at ``per_source_tokens``: docs
    are taken in ``id_col`` order until the source's running token sum
    would exceed the quota (the doc that crosses the line is the last
    one kept — quota is a soft cut at doc granularity).

    The cumsum here is a PARTITIONED window (per source), which Spark
    parallelizes across sources — no single-task global window.
    ``n_salts`` bounds a hot source's task with an EXACT two-phase
    pre-cut: a (source, salt) cumsum first drops docs whose
    salt-local prefix already exceeds the quota.  That is lossless:
    a doc's salt prefix is <= its global prefix, so every globally
    kept doc survives phase 1; and every phase-1-dropped doc has a
    LARGER id than every kept doc (its global prefix crossed the
    quota, so all later docs are dropped too), which means removing
    it cannot change any kept doc's prefix sum.  The hot-source task
    then cumsums ~n_salts * quota tokens' worth of rows, not the
    source's whole corpus share (equality is pytest-asserted).

    ``n_salts=None`` (default) probes for skew and salts
    automatically when one source would overflow its fair task share
    (:func:`_auto_salts`); pass 0 to force unsalted, an int to pin."""
    if per_source_tokens <= 0:
        raise ValueError("per_source_tokens must be positive")
    from pyspark.sql import Window

    if n_salts is None:
        n_salts = _auto_salts(df, F.col(source_col))
    lens = df.withColumn(
        "n_tokens",
        F.col(len_col) if len_col else tx.token_count(F.col(text_col)),
    )
    if n_salts:
        salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
        w1 = (
            Window.partitionBy(source_col, salt).orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        lens = (
            lens.withColumn("_c1", F.sum("n_tokens").over(w1))
            .filter(F.col("_c1") - F.col("n_tokens") < per_source_tokens)
            .drop("_c1")
        )
    w = (
        Window.partitionBy(source_col).orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = lens.withColumn("_cum", F.sum("n_tokens").over(w))
    return (
        cum.filter(F.col("_cum") - F.col("n_tokens") < per_source_tokens)
        .drop("_cum")
    )


def corpus_stats(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One-aggregate corpus summary: docs, tokens, chars, mean doc
    length — the numbers a pipeline run reports per stage."""
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tx.token_count(F.col(text_col))).alias("n_tokens"),
        F.sum(F.length(text_col)).alias("n_chars"),
        F.round(F.avg(tx.token_count(F.col(text_col))), 4).alias(
            "mean_tokens"
        ),
    )


def corpus_datasheet(
    df: DataFrame,
    dims: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """Data-card rollup: per-slice corpus statistics for EVERY prefix
    of ``dims`` plus the grand total — the table a dataset datasheet
    publishes (docs/tokens/chars by language, by language x source,
    overall).

    One ``rollup`` = ONE hash aggregate: Catalyst expands the grouping
    sets inside a single Expand+Aggregate pair with map-side partial
    combine, so N rollup levels cost one exchange of (dims, partials)
    rows, never N separate scans or groupBys.  At 100 TB the exchange
    carries one partial row per (task, occupied slice) — dims are
    low-cardinality labels, so this is KBs.

    ``level`` is the grouping id (0 = finest slice, bits set for
    aggregated-away dims); aggregated dims read ``(all)`` so a real
    NULL label never collides with a rollup total."""
    toks = tx.token_count(F.col(text_col))
    agg = df.rollup(*dims).agg(
        F.grouping_id().alias("level"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
        F.sum(F.length(text_col)).alias("n_chars"),
        F.round(F.avg(toks), 4).alias("mean_tokens"),
        F.max(toks).alias("max_tokens"),
    )
    # grouping_id bit (n-1-i) set <=> dim i aggregated away at this level
    n = len(dims)
    labeled = [
        F.when(
            F.col("level").bitwiseAND(F.lit(1 << (n - 1 - i))) != 0,
            F.lit("(all)"),
        )
        .otherwise(F.coalesce(F.col(d), F.lit("(null)")))
        .alias(d)
        for i, d in enumerate(dims)
    ]
    return agg.select(*labeled, "level", "n_docs", "n_tokens", "n_chars",
                      "mean_tokens", "max_tokens")


def host_disjoint_split(
    df: DataFrame,
    eval_frac: float = 0.01,
    url_col: str = "url",
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/eval split that is DISJOINT BY registered
    domain: every page of a site lands on the same side, so
    near-identical pages (mirrors, templates, re-crawls of one host)
    can never straddle the split and leak eval content into training
    — the leakage mode a row-level random split is blind to.

    Adds a ``split`` column ('train'/'eval').  The decision is a pure
    function of the domain: char-level portable hash -> Knuth remix ->
    unit interval (``text.portable_string_hash``; the identical rule
    runs in ANSI SQL, so the split is oracle-checkable and STABLE
    across runs, partitionings, and snapshots — a domain keeps its
    side as the corpus grows).  Pure Catalyst, scan-stage: no shuffle,
    no sampling pass, no state.  ``eval_frac`` is the expected
    domain-weighted fraction; realized page share varies with the
    size of the domains that hash into eval (inherent to any
    group-disjoint split)."""
    from xarray_spatial_spark.functions import url as uf

    P = tx.PSH_PRIME
    dom = uf.registered_domain(uf.url_host(F.col(url_col)))
    h = tx.portable_string_hash(dom)
    u = F.pmod((h + F.lit(int(seed) % P)) * F.lit(2_654_435_761), F.lit(P))
    return df.withColumn(
        "split",
        F.when(u < F.lit(int(eval_frac * P)), F.lit("eval"))
        .otherwise(F.lit("train")),
    )


def host_cap(
    df: DataFrame,
    k: int,
    score_col: str,
    url_col: str = "url",
    id_col: str = "doc_id",
    host_col: str | None = None,
    n_salts: int | None = None,
) -> DataFrame:
    """Keep at most ``k`` docs per host, best ``score_col`` first —
    the standard crawl-curation stage that stops a single domain from
    dominating the corpus (per-host caps in CC pipelines).

    Adds ``host_rank`` (1-based within host).  The rank is a
    host-partitioned window: hosts are numerous, so the window
    parallelizes.  A zipfian megahost concentrates ITS rows in one
    task; ``n_salts`` bounds that task with an EXACT two-phase
    pre-cut — a (host, salt) window first keeps each salt's top k
    (every true global top-k row is inside its salt's top k, so the
    final per-host window over the <= n_salts*k survivors returns
    byte-identical rows and ranks; equality is pytest-asserted).  The
    megahost task then sorts n_salts*k rows, not the host's corpus
    share.  Ties break by ``id_col`` for run-to-run and oracle
    determinism.

    ``n_salts=None`` (default) probes for skew and salts
    automatically when one host would overflow its fair task share
    (:func:`_auto_salts`); pass 0 to force unsalted, an int to pin."""
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql import Window

    from xarray_spatial_spark.functions.url import url_host

    host = F.col(host_col) if host_col else url_host(F.col(url_col))
    if n_salts is None:
        n_salts = _auto_salts(df, host)
    if n_salts:
        salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
        w1 = Window.partitionBy(host, salt).orderBy(
            F.col(score_col).desc(), F.col(id_col).asc()
        )
        df = (
            df.withColumn("_pr", F.row_number().over(w1))
            .filter(F.col("_pr") <= k)
            .drop("_pr")
        )
    w = Window.partitionBy(host).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= k)
    )


def host_cap_incremental(
    df: DataFrame,
    cap: int,
    prior_counts,
    score_col: str,
    url_col: str = "url",
    id_col: str = "doc_id",
    host_col: str | None = None,
    n_salts: int | None = None,
) -> DataFrame:
    """Cap each host's TOTAL page count across crawl snapshots without
    storing a per-host count table: ``prior_counts`` is the Count-Min
    sketch (functions/sketch.py) built over earlier snapshots' host
    stream; this snapshot keeps at most ``cap - estimate(host)`` of a
    host's pages, best ``score_col`` first.

    The CM estimate NEVER undercounts, so the combined total provably
    never exceeds ``cap`` — the sketch's one-sided error maps onto the
    cap's one-sided semantics (a rare over-estimate under-fills a
    host by at most eps*N pages; it can never over-fill).  The probe
    is one broadcast Arrow column — no join, no second shuffle: the
    plan is host_cap's single host-partitioned window plus a
    per-host-constant filter.

    Skew: same contract as :func:`host_cap` — a megahost trips the
    auto-salt probe and gets the EXACT (host, salt) pre-cut first; the
    pre-cut keeps each salt's top ``cap`` rows, a superset of any
    ``remaining <= cap`` final cut, so results are byte-identical at
    any salt count (pytest-asserted).  Feed survivors' hosts back
    through ``cms_build`` + ``cms_merge`` to roll the artifact
    forward."""
    if cap <= 0:
        raise ValueError("cap must be positive")
    from pyspark.sql import Window

    from xarray_spatial_spark.functions.sketch import cms_estimate
    from xarray_spatial_spark.functions.url import url_host

    host = (F.col(host_col) if host_col else url_host(F.col(url_col)))
    if n_salts is None:
        n_salts = _auto_salts(df, host)
    if n_salts:
        salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
        w1 = Window.partitionBy(host, salt).orderBy(
            F.col(score_col).desc(), F.col(id_col).asc()
        )
        df = (
            df.withColumn("_pr", F.row_number().over(w1))
            .filter(F.col("_pr") <= cap)
            .drop("_pr")
        )
    prior = cms_estimate(df.sparkSession, prior_counts, host)
    w = Window.partitionBy(host).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_remaining", F.greatest(F.lit(0), F.lit(cap) - prior))
        .withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= F.col("_remaining"))
        .drop("_remaining")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token windows (whitespace
    tokens) with optional overlap — the long-document stage before
    sequence packing: every chunk is at most ``chunk_tokens`` tokens,
    windows start every ``stride`` tokens (default = chunk_tokens,
    i.e. disjoint).

    One row per (doc, chunk): every source column except
    ``text_col`` passes through (carrying the full text on every
    chunk row would multiply shuffled bytes by the chunk count),
    plus (chunk_id, chunk_text, chunk_tokens).  Empty/whitespace-only
    docs keep one row with chunk_tokens = 0, so the doc roster is
    preserved and token budgets stay exact.  Pure Catalyst: split ->
    sequence of window starts -> posexplode -> slice/join — no
    Python, no shuffle (explode happens in the scan stage); the
    downstream packer handles global layout."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    stride = stride or chunk_tokens
    if stride <= 0:
        raise ValueError("stride must be positive")
    txt = F.coalesce(F.trim(F.col(text_col)), F.lit(""))
    toks = F.split(txt, r"\s+")
    # split('') yields [''] (size 1); NULL and empty docs are both 0
    # tokens (size(NULL) would be -1 / an ANSI drop — engine-splitting)
    n = F.when(txt == "", F.lit(0)).otherwise(F.size(toks))
    starts = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)
    )
    keep = [c for c in df.columns if c != text_col]
    out = (
        df.withColumn("_toks", toks)
        .withColumn("_n", n)
        .select(
            *keep, "_toks", "_n",
            F.posexplode(starts).alias("chunk_id", "_start"),
        )
        .withColumn(
            "chunk_text",
            F.concat_ws(
                " ", F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
            ),
        )
        .withColumn(
            "chunk_tokens",
            F.greatest(
                F.least(F.col("_n") - F.col("_start"), F.lit(chunk_tokens)),
                F.lit(0),
            ),
        )
        .drop("_toks", "_n", "_start")
    )
    return out


def stratified_sample(
    df: DataFrame,
    k: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    n_salts: int | None = None,
) -> DataFrame:
    """EXACTLY min(k, n_stratum) rows per stratum, chosen by a
    deterministic hash order — the fixed-budget evaluation/holdout
    sampler (``sample_mixture`` gives *fractions*; this gives exact
    counts).

    Order key is a Knuth multiplicative hash of ``id_col``, computed
    as ``((id % P) * 2654435761) % P`` with P = 1e9+7 so the product
    stays under 2^63 for ANY int64 id (a bare ``id * mult`` overflows
    at id ~3.5e9 — silently wrapping on non-ANSI Spark and ERRORING
    on DuckDB/ANSI, which would split the engines).  Pure integer
    arithmetic, so the identical rule runs in any engine — the SQL
    oracle reproduces the exact same sample.  Window is
    partitioned by stratum: parallel across strata; ``n_salts``
    bounds a hot stratum's task with the exact two-phase pre-cut
    (per-(stratum, salt) top k first — every global top-k row is in
    its salt's top k, so results and ranks are byte-identical).

    ``n_salts=None`` (default) probes for skew and salts
    automatically when one stratum would overflow its fair task share
    (:func:`_auto_salts`); pass 0 to force unsalted, an int to pin."""
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql import Window

    if n_salts is None:
        n_salts = _auto_salts(df, F.col(strata_col))
    P = 1_000_000_007
    order = F.pmod(F.pmod(F.col(id_col), F.lit(P)) * F.lit(2654435761),
                   F.lit(P))
    if n_salts:
        salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
        w1 = Window.partitionBy(strata_col, salt).orderBy(
            order.asc(), F.col(id_col).asc()
        )
        df = (
            df.withColumn("_pr", F.row_number().over(w1))
            .filter(F.col("_pr") <= k)
            .drop("_pr")
        )
    w = Window.partitionBy(strata_col).orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    u_col: Column | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, algorithm A-ES): each row draws ``es_key = ln(u) / w`` with
    u ~ U(0,1) and w its weight, and the n LARGEST keys are an exact
    weighted sample (the probability row i is drawn first is
    w_i / sum w — the mixture sampler's guarantee with an EXACT output
    size, which ``sample_mixture``'s Bernoulli fractions can't give).
    ln(u)/w is the monotone log of the paper's u^(1/w): same order,
    no underflow when web-scale weights push 1/w toward 0.

    u derives deterministically from the id — the same
    any-int64-safe Knuth multiplicative form as
    :func:`stratified_sample` (``((id + seed) % P * 2654435761) % P``
    with P = 1e9+7, then +0.5 and /P to land strictly inside (0,1)) —
    so reruns, resumes, and a SQL oracle all reproduce the identical
    sample; ``u_col`` overrides the generator, ``seed`` redraws it.
    Non-positive weights are excluded (zero weight = never sampled,
    per the paper's support).

    Scale: no normalisation pass (keys compare raw, so sum(w) is never
    needed) and ``orderBy(desc).limit(n)`` plans as
    TakeOrderedAndProject — per-partition partial top-n, one n-row
    merge, no corpus-scale sort or shuffle.  The whole sample is ONE
    job over one scan."""
    if n <= 0:
        raise ValueError("n must be positive")
    P = 1_000_000_007
    if u_col is None:
        h = F.pmod(
            F.pmod(F.col(id_col) + F.lit(seed), F.lit(P))
            * F.lit(2654435761),
            F.lit(P),
        )
        u_col = (h.cast("double") + F.lit(0.5)) / F.lit(float(P))
    key = F.log(u_col) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("es_key", key)
        .orderBy(F.col("es_key").desc(), F.col(id_col).asc())
        .limit(n)
    )


def shuffle_corpus(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic pre-training shuffle: assign every row a shard
    and a position inside it, both pure functions of (id, seed), so
    the training order is reproducible across reruns, resumes, and
    engines — the step between corpus curation and
    :func:`write_packed_shards` (a crawl is ordered by host/fetch
    time, which a trainer must never see as its batch order).

    shard = Knuth-hash(id, seed) mod n_shards; shard_pos = rank of a
    SECOND independent hash within the shard (re-using the shard key
    would sort each shard by its own bucket residue — correlated, not
    shuffled).  Both hashes are the any-int64-safe
    ``((x % P) * 2654435761) % P`` form (P = 1e9+7, product < 2^63 —
    see :func:`stratified_sample`), so a SQL oracle replays the
    identical permutation.

    Scale shape: NO global sort — one hash exchange on ``shard`` and
    a per-shard in-partition sort (window per shard), parallel across
    all ``n_shards``; a global row_number would serialize the corpus
    through one task.  Downstream, a trainer reads shards
    independently in shard_pos order."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    from pyspark.sql import Window

    P = 1_000_000_007
    h1 = F.pmod(
        F.pmod(F.col(id_col) + F.lit(seed), F.lit(P)) * F.lit(2654435761),
        F.lit(P))
    h2 = F.pmod(
        F.pmod(F.col(id_col) + F.lit(seed + 1), F.lit(P))
        * F.lit(2654435761), F.lit(P))
    shard = F.pmod(h1, F.lit(n_shards))
    w = Window.partitionBy(shard).orderBy(h2.asc(), F.col(id_col).asc())
    return (
        df.withColumn("shard_id", shard.cast("int"))
        .withColumn("shard_pos", F.row_number().over(w))
    )


def crawl_to_corpus(
    records: DataFrame,
    min_words: int = 50,
    max_words: int = 100000,
    lang: str | None = None,
    redact: bool = True,
    host_cap_k: int | None = None,
) -> DataFrame:
    """The whole crawl-to-training-corpus path in one call:
    ``read_warc`` records (sources/warc.py) ->

    1. project to the input_hint document shape (``warc_documents``:
       response html -> extract_text, WET conversion text as-is,
       langid);
    2. keep the LATEST capture per url (``snapshot_dedup`` — the
       recrawl rule, map-side-combining max_by);
    3. quality gate -> exact text dedup -> [per-host cap] -> PII
       redaction (``prepare_corpus``, production stage order).

    Returns (url, warc_ts, html, text, lang) surviving rows.  Every
    stage is a narrow map or a map-side-combined exchange on a short
    key (url hash / host) — the html/text payload shuffles exactly
    once (the snapshot max_by carries the winning row's struct)."""
    from xarray_spatial_spark.functions.dedup import snapshot_dedup
    from xarray_spatial_spark.sources.warc import warc_documents

    docs = warc_documents(records)
    docs = snapshot_dedup(docs, key_cols="url", ts_col="warc_ts")
    return prepare_corpus(
        docs,
        text_col="text",
        id_col="url",
        min_words=min_words,
        max_words=max_words,
        lang=lang,
        redact=redact,
        url_col="url" if host_cap_k is not None else None,
        host_cap_k=host_cap_k,
    )


def write_packed_shards(
    spark,
    df: DataFrame,
    stage_dir: str,
    target_tokens: int,
    bins_per_shard: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    len_col: str | None = None,
) -> DataFrame:
    """The trainer hand-off: pack the corpus into fixed-token bins
    (:func:`pack_sequences` — distributed prefix sum, two small
    shuffles) and write it as token-budgeted parquet SHARDS
    (``shard_id = bin_id // bins_per_shard``, so every shard holds
    ~``bins_per_shard * target_tokens`` tokens) through
    ``plans.manifest.run_stage`` — per-shard lineage rows
    (row_count + order-insensitive content hash) and fingerprint
    resume: re-running with the same params reads the existing
    shards instead of recomputing.  Returns the shard table."""
    from xarray_spatial_spark.plans.manifest import run_stage

    def _build() -> DataFrame:
        packed = pack_sequences(
            df, target_tokens=target_tokens, len_col=len_col,
            text_col=text_col, id_col=id_col)
        return packed.withColumn(
            "shard_id",
            (F.col("bin_id") / bins_per_shard).cast("long"))

    return run_stage(
        spark, stage_dir, _build, key="shard_id",
        params={
            "target_tokens": target_tokens,
            "bins_per_shard": bins_per_shard,
            "text_col": text_col,
        },
    )


def corpus_drift(
    old: DataFrame,
    new: DataFrame,
    by: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Crawl-over-crawl DISTRIBUTION drift per ``by`` group: Jensen-
    Shannon divergence between the two snapshots' word distributions,
    plus doc/vocab deltas — the monitoring gate that catches a broken
    extractor or a collapsed source before a corpus ships.

    Shape at 100 TB: one explode->hash-agg per snapshot (map-side
    combined, exchanges (group, word, count) partials), one full outer
    join on (group, word) co-partitioned by the same key, and a final
    per-group aggregation of the pointwise JS contributions.  Every
    log runs in Catalyst; nothing per-token reaches the driver.

    JS(P, Q) = 0.5 KL(P||M) + 0.5 KL(Q||M), M = (P+Q)/2 — symmetric,
    bounded by ln 2 (reached on disjoint vocabularies)."""
    from xarray_spatial_spark.functions.text import tokens

    def hist(df: DataFrame, cnt: str) -> DataFrame:
        return (
            df.select(F.col(by).alias("grp"),
                      F.explode(tokens(F.col(text_col))).alias("word"))
            .groupBy("grp", "word")
            .agg(F.count(F.lit(1)).alias(cnt))
        )

    h_old = hist(old, "n_old")
    h_new = hist(new, "n_new")
    j = h_old.join(h_new, ["grp", "word"], "full_outer").select(
        "grp", "word",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    tot = j.groupBy("grp").agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new"),
        F.sum((F.col("n_old") > 0).cast("long")).alias("vocab_old"),
        F.sum((F.col("n_new") > 0).cast("long")).alias("vocab_new"),
    )
    t = j.join(tot, "grp")
    p = F.col("n_old") / F.col("t_old")
    q = F.col("n_new") / F.col("t_new")
    m = (p + q) / 2
    contrib = (
        F.when(F.col("n_old") > 0, 0.5 * p * F.log(p / m)).otherwise(0.0)
        + F.when(F.col("n_new") > 0, 0.5 * q * F.log(q / m)).otherwise(0.0)
    )
    docs_old = old.groupBy(F.col(by).alias("grp")).agg(
        F.count(F.lit(1)).alias("docs_old"))
    docs_new = new.groupBy(F.col(by).alias("grp")).agg(
        F.count(F.lit(1)).alias("docs_new"))
    return (
        t.groupBy("grp", "t_old", "t_new", "vocab_old", "vocab_new")
        .agg(F.round(F.sum(contrib), 6).alias("js_divergence"))
        .join(docs_old, "grp", "full_outer")
        .join(docs_new, "grp", "full_outer")
        .select(
            "grp", "js_divergence",
            F.coalesce("docs_old", F.lit(0)).alias("docs_old"),
            F.coalesce("docs_new", F.lit(0)).alias("docs_new"),
            F.coalesce("vocab_old", F.lit(0)).alias("vocab_old"),
            F.coalesce("vocab_new", F.lit(0)).alias("vocab_new"),
        )
    )


def crawl_to_iceberg(
    records: DataFrame,
    table_dir: str,
    tile_level: int = 8,
    cell_level: int = 16,
    geocode_key: str = "url",
    **corpus_kwargs,
) -> int:
    """The whole north-star pipeline in one call: WARC records ->
    :func:`crawl_to_corpus` (latest-capture dedup, quality gate, text
    dedup, redaction) -> deterministic geocode -> genuine S2 cell +
    tile assignment (Arrow batch encode, s2.cell_col) -> committed as
    an append snapshot of a spec-compliant ICEBERG table identity-
    partitioned by ``s2_tile``.

    Downstream, a tile predicate prunes at the METADATA layer
    (iceberg_format.read_iceberg partition_filter / data_files) —
    the file list of a 10^12-page table never reaches an executor.
    Returns the committed snapshot id."""
    from pyspark.sql import functions as F

    from xarray_spatial_spark import s2
    from xarray_spatial_spark.functions.geo import geocode_lat, geocode_lon
    from xarray_spatial_spark.functions.text import portable_string_hash
    from xarray_spatial_spark.sources.iceberg_format import write_iceberg

    corpus = crawl_to_corpus(records, **corpus_kwargs)
    key = portable_string_hash(F.col(geocode_key))
    geo = (
        corpus.withColumn("lat", geocode_lat(key))
        .withColumn("lon", geocode_lon(key))
    )
    cells = geo.withColumn(
        "s2_cell", s2.cell_col(F.col("lon"), F.col("lat"), cell_level)
    ).withColumn("s2_tile", s2.parent_col(F.col("s2_cell"), tile_level))
    return write_iceberg(
        cells.select("url", "warc_ts", "text", "lang", "lat", "lon",
                     "s2_cell", "s2_tile"),
        table_dir,
        partition_by=["s2_tile"],
    )


def incremental_crawl_round(
    records: DataFrame,
    table_dir: str,
    state_dir: str,
    host_cap_total: int | None = None,
    cms_w: int = 1 << 16,
    cms_d: int = 5,
    tile_level: int = 8,
    cell_level: int = 16,
    geocode_key: str = "url",
    **corpus_kwargs,
) -> dict:
    """One round of the CONTINUOUS crawl-ingest loop — the incremental
    twin of :func:`crawl_to_iceberg`, stitching the durable-state
    pieces together:

    1. ``crawl_to_corpus`` gates this round's WARC records;
    2. ``host_cap_incremental`` enforces ``host_cap_total`` pages per
       host ACROSS ALL ROUNDS from the Count-Min artifact in
       ``state_dir`` (never over-fills — the sketch overestimates);
    3. geocode + S2 cell/tile assignment (the crawl_to_iceberg shape);
    4. ``merge_into`` upserts on url — a recrawled page REPLACES its
       old version in ONE atomic snapshot instead of duplicating it,
       new urls insert, time travel keeps the pre-round state;
    5. the host CM sketch rolls forward (cms_merge is exactly the
       sketch of the concatenated rounds) and kept urls OR into the
       Bloom seen-filter the frontier consumes — both artifacts
       rewritten atomically.

    First round bootstraps: missing table -> plain partitioned write,
    missing sketches -> zero CM / fresh Bloom.  Returns
    {"snapshot_id", "rows", "hosts"}."""
    import os

    import numpy as np

    from xarray_spatial_spark import s2
    from xarray_spatial_spark.functions import sketch as sk
    from xarray_spatial_spark.functions.dedup import (
        bloom_build, bloom_load, bloom_merge, bloom_params, bloom_save,
    )
    from xarray_spatial_spark.functions.geo import geocode_lat, geocode_lon
    from xarray_spatial_spark.functions.text import portable_string_hash
    from xarray_spatial_spark.functions.url import url_host
    from xarray_spatial_spark.sources.iceberg_format import (
        merge_into, write_iceberg,
    )

    os.makedirs(state_dir, exist_ok=True)
    cms_path = os.path.join(state_dir, "host_counts.parquet")
    bloom_path = os.path.join(state_dir, "seen_urls.parquet")

    corpus = crawl_to_corpus(records, **corpus_kwargs)
    if host_cap_total is not None:
        prior = (sk.cms_load(cms_path) if os.path.exists(cms_path)
                 else np.zeros((cms_d, cms_w), np.int64))
        corpus = host_cap_incremental(
            corpus, cap=host_cap_total, prior_counts=prior,
            score_col="warc_ts", id_col="url").drop("host_rank")

    key = portable_string_hash(F.col(geocode_key))
    geo = (corpus.withColumn("lat", geocode_lat(key))
           .withColumn("lon", geocode_lon(key)))
    cells = geo.withColumn(
        "s2_cell", s2.cell_col(F.col("lon"), F.col("lat"), cell_level)
    ).withColumn("s2_tile", s2.parent_col(F.col("s2_cell"), tile_level))
    out = cells.select("url", "warc_ts", "text", "lang", "lat", "lon",
                       "s2_cell", "s2_tile").localCheckpoint()

    exists = os.path.exists(os.path.join(table_dir, "metadata",
                                         "version-hint.text"))
    if exists:
        snap_id = merge_into(out, table_dir, on=["url"])
    else:
        snap_id = write_iceberg(out, table_dir, partition_by=["s2_tile"])

    hosts = out.select(url_host(F.col("url")).alias("host"))
    delta = sk.cms_build(hosts, "host", cms_w, cms_d)
    if os.path.exists(cms_path):
        delta = sk.cms_merge(sk.cms_load(cms_path), delta)
    sk.cms_save(np.ascontiguousarray(delta), cms_path + ".tmp")
    os.replace(cms_path + ".tmp", cms_path)

    n_bits, k = bloom_params(1_000_000, 0.001)
    seen = bloom_build(out, "url", n_bits, k)
    if os.path.exists(bloom_path):
        prev, k_prev = bloom_load(bloom_path)
        if k_prev == k and len(prev) * 64 == n_bits:
            seen = bloom_merge(prev, seen)
    bloom_save(seen, k, bloom_path + ".tmp")
    os.replace(bloom_path + ".tmp", bloom_path)

    n_rows = out.count()
    return {"snapshot_id": snap_id, "rows": n_rows,
            "hosts": int((delta[0] > 0).sum())}


def corpus_funnel(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100000,
    lang: str | None = None,
    c4: bool = False,
    host_cap_k: int | None = None,
    url_col: str | None = None,
) -> DataFrame:
    """Per-stage attrition report for the :func:`prepare_corpus`
    pipeline — the observability table every curation run publishes
    ("started with N pages, the quality gate kept X%, dedup kept
    Y%...").  Returns ``(stage_idx, stage, n_kept)`` with one row per
    stage in pipeline order, ``n_kept`` = documents that survive all
    stages up to and including that one, computed with EXACTLY the
    predicates :func:`prepare_corpus` applies (same helpers, same
    order), so the funnel is the pipeline's own arithmetic, not a
    re-implementation that can drift.

    Scale design: every gate stage is a boolean column on the single
    scan, so the whole gate funnel is ONE aggregate job with map-side
    partial combine — no per-stage count() jobs (k stages as separate
    counts would scan the corpus k times).  The dedup stage rides the
    same aggregate as ``count(DISTINCT xxhash64(text))`` over gate
    survivors: only 8-byte hashes shuffle, matching
    :func:`dedup.distinct_by_text`'s key.  The optional host-cap
    stage needs the survivor->host assignment (the dedup winner is
    the smallest-id copy, and THAT row's host owns the doc), which is
    one more hash aggregate keyed by text hash, then
    ``sum(least(k, survivors_per_host))`` — still no windows and no
    text bytes in any exchange.
    """
    if host_cap_k is not None and url_col is None:
        raise ValueError("host_cap_k needs url_col")
    t = F.col(text_col)
    if c4:
        cleaned = tx.c4_clean(t)
        k_cur = tx.c4_page_keep(t, cleaned)
        t = cleaned
    else:
        k_cur = F.lit(True)
    stages: list[tuple[str, Column]] = [("c4", k_cur)] if c4 else []
    k_cur = k_cur & tx.gopher_keep(t, min_words=min_words,
                                   max_words=max_words)
    stages.append(("gopher", k_cur))
    if lang is not None:
        k_cur = k_cur & (tx.langid(t) == lang)
        stages.append(("lang", k_cur))

    flagged = df.select(
        F.col(id_col).alias("_id"),
        *([F.col(url_col).alias("_url")] if host_cap_k is not None else []),
        F.xxhash64(t).alias("_h"),
        *[k.alias(f"_k{i}") for i, (_, k) in enumerate(stages)],
    )
    final_k = F.col(f"_k{len(stages) - 1}")
    aggs = [F.count(F.lit(1)).alias("n_input")] + [
        F.sum(F.col(f"_k{i}").cast("long")).alias(f"n_{name}")
        for i, (name, _) in enumerate(stages)
    ] + [
        F.count_distinct(F.when(final_k, F.col("_h"))).alias("n_dedup")
    ]
    names = ["input"] + [name for name, _ in stages] + ["dedup"]
    one = flagged.agg(*aggs)
    stacked = one.selectExpr(
        "stack({n}, {args}) as (stage_idx, stage, n_kept)".format(
            n=len(names),
            args=", ".join(
                f"{i}, '{nm}', cast(n_{nm} as long)"
                for i, nm in enumerate(names)
            ),
        )
    )
    if host_cap_k is None:
        return stacked
    from xarray_spatial_spark.functions.url import url_host

    survivors = (
        flagged.filter(final_k)
        .groupBy("_h")
        .agg(F.min_by("_url", F.col("_id")).alias("_url"))
        .select(url_host(F.col("_url")).alias("_host"))
    )
    capped = survivors.groupBy("_host").agg(
        F.count(F.lit(1)).alias("_n")
    ).agg(
        F.sum(F.least(F.col("_n"), F.lit(host_cap_k))).alias("n_kept")
    ).select(
        F.lit(len(names)).cast("int").alias("stage_idx"),
        F.lit("host_cap").alias("stage"),
        F.col("n_kept").cast("long"),
    )
    return stacked.unionByName(capped)
