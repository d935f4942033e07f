"""Text analysis for web-scale training-data pipelines — all
Catalyst-native expressions (JVM, codegen'd), designed for the
``documents`` payload table (input_hint).

Components: token counting (whitespace + regex word-ish), quality
scoring (length / punctuation / stopword / alpha ratios), language ID
(stopword-hit heuristic over a fixed per-language lexicon), and
document fingerprinting (rolling polynomial hash over tokens).

Everything is a pure function of the text column: identical results at
any parallelism, and each has a direct ANSI-SQL equivalent for oracle
checking (modular arithmetic instead of native hashes where the oracle
must agree).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lexicons (public common function words).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "que"],
    "es": ["el", "la", "los", "es", "en", "por", "para", "una"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}

# largest prime < 2^53: h*131 + c < 2^63 under ANSI overflow checking,
# and the value survives a float64 round-trip (JSON/Arrow safety)
FP_PRIME = 9007199254740881


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def _toks_of(df: "DataFrame", text_col: str) -> Column:
    """``text_col`` as a token array: pre-tokenized array<string>
    columns pass through untouched, strings get :func:`tokens`.  Lets
    callers that feed several LM/gram passes tokenize the corpus ONCE
    (q_lm_score shares one tokenized frame between both smoothers)."""
    from pyspark.sql.types import ArrayType

    if isinstance(df.schema[text_col].dataType, ArrayType):
        return F.col(text_col)
    return tokens(F.col(text_col))


def _bigrams_arr(toks: Column) -> Column:
    """'w1 w2' bigram strings from an existing token array (the body
    of :func:`bigrams`, split out so pre-tokenized callers skip the
    re-tokenization)."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_token_count(text: Column) -> Column:
    """BPE-ish regex count: word runs + standalone punctuation, the
    usual pre-tokenizer shape."""
    return F.regexp_count(text, F.lit(r"\w+|[^\w\s]"))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def alpha_ratio(text: Column) -> Column:
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    return F.when(n > 0, alpha / n).otherwise(F.lit(0.0))


def lines(text: Column) -> Column:
    return F.split(text, "\n")


def dup_line_fraction(text: Column) -> Column:
    """Gopher-style repetition signal: fraction of a document's lines
    that are repeats of an earlier line (0 for <= 1 line).  Pure
    Catalyst array ops — no shuffle, no UDF."""
    ls = lines(text)
    n = F.size(ls)
    return F.when(
        n > 1, (n - F.size(F.array_distinct(ls))) / n.cast("double")
    ).otherwise(F.lit(0.0))


def dup_line_char_fraction(text: Column) -> Column:
    """Fraction of characters sitting in duplicated lines: total chars
    minus one copy of each distinct line, over total chars (separators
    excluded).  The Gopher/Dolma `duplicate_line_character_fraction`
    rule."""
    ls = lines(text)
    total = F.aggregate(ls, F.lit(0), lambda a, t: a + F.length(t))
    dis = F.aggregate(F.array_distinct(ls), F.lit(0),
                      lambda a, t: a + F.length(t))
    return F.when(
        total > 0, (total - dis) / total.cast("double")
    ).otherwise(F.lit(0.0))


def _alternation(words) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def stopword_hits(text: Column, lang: str = "en") -> Column:
    """Number of stopword occurrences (word-boundary matches).

    ONE regex pass with an alternation instead of one
    ``regexp_count`` per word: the \b anchors make the alternation
    unambiguous (a prefix word cannot match inside a longer word), so
    the combined count equals the per-word sum exactly — same result,
    8x fewer scans of the text."""
    return F.size(F.regexp_extract_all(text, F.lit(_alternation(STOPWORDS[lang])), 1))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    n = token_count(text)
    return F.when(n > 0, stopword_hits(text, lang) / n).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column, lang: str = "en") -> Column:
    """Composite [0, 1] quality heuristic: favors mid-length documents
    with low punctuation density, healthy stopword rate, and plausible
    word lengths — the standard cheap pre-filter shape for web text."""
    n_tok = token_count(text)
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - 4.0 * punct_ratio(text))
    stop_score = F.least(F.lit(4.0) * stopword_ratio(text, lang), F.lit(1.0))
    mwl = mean_word_length(text)
    wl_score = F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.25))
    return (len_score + punct_score + stop_score + wl_score) / 4.0


def langid_scores(text: Column) -> list[Column]:
    """Per-language stopword-hit counts (aliased hits_<lang>)."""
    return [stopword_hits(text, lg).alias(f"hits_{lg}") for lg in STOPWORDS]


def langid(text: Column) -> Column:
    """Most-hit language; ties break by lexicon order; no hits -> 'und'.

    Single-pass plan: ONE combined-alternation ``regexp_extract_all``
    over every language's lexicon (Catalyst CSE evaluates the shared
    subtree once per row), then per-language counts are array filters
    over the matched words — 1 regex scan of the text instead of the
    40 (8 words x 5 languages) of the naive form.  A word appearing in
    two lexicons (e.g. 'la' in fr and es) is counted for both, exactly
    like per-language counting."""
    all_words = [w for lg in STOPWORDS for w in STOPWORDS[lg]]
    matches = F.regexp_extract_all(text, F.lit(_alternation(all_words)), 1)
    pairs = F.array(
        *[
            F.struct(
                (-F.size(F.filter(
                    matches,
                    lambda m: m.isin(*STOPWORDS[lg]),
                ))).alias("neg"),
                F.lit(i).alias("ord"),
                F.lit(lg).alias("lang"),
            )
            for i, lg in enumerate(STOPWORDS)
        ]
    )
    best = F.array_min(pairs)
    return F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling hash over tokens:
    h = (h * 131 + ascii(first char) * 31 + len(token)) mod FP_PRIME.
    Pure modular arithmetic -> bit-identical in any SQL engine."""
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda h, t: F.pmod(
            h * F.lit(131) + F.ascii(t) * F.lit(31) + F.length(t), F.lit(FP_PRIME)
        ),
    )


# ---------------------------------------------------------------------------
# PII redaction + Gopher-style quality gates
# ---------------------------------------------------------------------------

# (kind, pattern, replacement) — patterns restricted to the regex
# subset Java (Spark) and RE2 (DuckDB) agree on, so the oracle twin is
# the same pattern verbatim.  Order matters and is part of the
# contract: emails before phones (an email's digits must not be eaten
# as a phone), IPs before phones (dotted quads are not phone numbers).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
]


# Card-shaped digit run: 13-19 digits, single space/dash separators
# allowed.  The trailing \b (no lookarounds — RE2 has none) means a
# 20+-digit run matches NOWHERE (no 19-digit prefix is falsely taken):
# every candidate is a maximal run.  Same pattern verbatim both engines.
CARD_PATTERN = r"\b(?:\d[ -]?){12,18}\d\b"


def luhn_valid(candidate: Column) -> Column:
    """Luhn checksum (ISO/IEC 7812) over the digits of a card-shaped
    string, plus the 13-19 digit length rule — pure Catalyst: digits
    via regexp_extract_all on the REVERSED string (so index i counts
    from the rightmost digit, the direction Luhn doubles in), an
    indexed ``transform`` doubling odd positions, one ``aggregate``
    sum.  Lambda ops run interpreted but over <=19 elements per
    candidate, and only on regex-matched candidates."""
    digits = F.regexp_extract_all(F.reverse(candidate), F.lit("[0-9]"), 0)

    def dval(x: Column) -> Column:
        return F.ascii(x) - 48

    vals = F.transform(
        digits,
        lambda x, i: F.when(
            i % 2 == 1,
            F.when(dval(x) * 2 > 9, dval(x) * 2 - 9).otherwise(dval(x) * 2),
        ).otherwise(dval(x)),
    )
    total = F.aggregate(vals, F.lit(0), lambda a, b: a + b)
    return (total % 10 == 0) & F.size(digits).between(13, 19)


def redact_cards(text: Column, token: str = "<CARD>") -> Column:
    """Replace Luhn-VALID card numbers with ``token``; card-shaped
    digit runs that fail the checksum (or fall outside 13-19 digits)
    survive untouched — checksum validation a bare regexp_replace
    can't express, so this is the one PII kind that isn't a
    PII_PATTERNS row.  Candidates fold left-to-right in regex match
    order (deterministic; re-replacing a repeated literal is a no-op),
    all scan-stage with no extra exchange."""
    cands = F.regexp_extract_all(text, F.lit(CARD_PATTERN), 0)
    valid = F.filter(cands, luhn_valid)
    return F.aggregate(
        valid, text, lambda acc, c: F.replace(acc, c, F.lit(token)))


def redact_cards_sql(text_expr: str, token: str = "<CARD>") -> str:
    """DuckDB twin of :func:`redact_cards` — identical candidate
    regex, Luhn arithmetic (DuckDB list indexes are 1-based, so the
    doubled positions are the EVEN i), and left-to-right replace fold
    (list_reduce seeded by prepending the text itself)."""
    luhn = (
        "list_sum(list_transform(regexp_extract_all(reverse(c), '[0-9]'),"
        " (x, i) -> CASE WHEN i % 2 = 0 THEN"
        " CASE WHEN (ascii(x)-48)*2 > 9 THEN (ascii(x)-48)*2 - 9"
        " ELSE (ascii(x)-48)*2 END"
        " ELSE ascii(x)-48 END)) % 10 = 0"
        " AND len(regexp_extract_all(reverse(c), '[0-9]'))"
        " BETWEEN 13 AND 19"
    )
    return (
        f"list_reduce(list_prepend({text_expr},"
        f" list_filter(regexp_extract_all({text_expr}, '{CARD_PATTERN}'),"
        f" c -> {luhn})), (acc, c) -> replace(acc, c, '{token}'))"
    )


def redact_pii(text: Column, kinds: tuple[str, ...] = ("email", "ip", "phone")) -> Column:
    """Scrub emails / IPv4s / phone-shaped digit runs with typed
    placeholders — the standard pre-training privacy pass.  A chain of
    ``regexp_replace`` (codegen, scan-stage); heuristic by design —
    swap patterns per policy, keep the ordering rule above.  Include
    ``"card"`` in ``kinds`` for Luhn-validated card redaction
    (:func:`redact_cards`); it runs FIRST so the phone pattern can't
    eat a valid card's digits."""
    out = redact_cards(text) if "card" in kinds else text
    for kind, pat, rep in PII_PATTERNS:
        if kind in kinds:
            out = F.regexp_replace(out, pat, rep)
    return out


def redact_pii_sql(text_expr: str, kinds: tuple[str, ...] = ("email", "ip", "phone")) -> str:
    """DuckDB twin of :func:`redact_pii` (same patterns, same order;
    'g' flag because DuckDB replaces first-match by default)."""
    out = redact_cards_sql(text_expr) if "card" in kinds else text_expr
    for kind, pat, rep in PII_PATTERNS:
        if kind in kinds:
            sql_pat = pat.replace("'", "''")
            out = f"regexp_replace({out}, '{sql_pat}', '{rep}', 'g')"
    return out


# Gopher's "must contain 2 of these" word list (Rae et al. 2021, §A1.1).
GOPHER_STOP = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _gopher_signal_map(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    n_words = F.size(toks)
    ls = lines(text)
    n_lines = F.size(ls)
    sym = F.regexp_count(text, F.lit(r"#|\.\.\.|…"))
    bullets = F.size(F.filter(ls, lambda l: l.rlike(r"^\s*[-*•]")))
    ellipses = F.size(F.filter(ls, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    stop_hits = F.size(
        F.array_distinct(F.regexp_extract_all(text, F.lit(_alternation(GOPHER_STOP)), 1))
    )

    def nz(num: Column, den: Column) -> Column:
        return F.when(den > 0, num / den.cast("double")).otherwise(F.lit(0.0))

    return {
        "n_words": n_words,
        "mean_word_len": mean_word_length(text),
        "symbol_word_ratio": nz(sym, n_words),
        "bullet_line_frac": nz(bullets, n_lines),
        "ellipsis_line_frac": nz(ellipses, n_lines),
        "alpha_word_frac": nz(alpha_words, n_words),
        "stop_hits": stop_hits,
    }


def gopher_signals(text: Column) -> list[Column]:
    """The Gopher quality-filter signal set as aliased columns, all
    pure Catalyst (one row in, a handful of scans, no shuffle/UDF):

    - ``n_words``, ``mean_word_len``
    - ``symbol_word_ratio``  — '#'/ellipsis symbols per word
    - ``bullet_line_frac``   — lines starting with a bullet
    - ``ellipsis_line_frac`` — lines ending with an ellipsis
    - ``alpha_word_frac``    — words containing an alphabetic char
    - ``stop_hits``          — DISTINCT Gopher stop words present
    """
    return [c.alias(name) for name, c in _gopher_signal_map(text).items()]


def gopher_keep(text: Column, min_words: int = 50, max_words: int = 100000) -> Column:
    """Gopher keep rule over the :func:`gopher_signals` thresholds
    (word count window, mean word length 3-10, symbol ratio <= 0.1,
    <= 90% bullet lines, <= 30% ellipsis lines, >= 80% alpha words,
    >= 2 distinct stop words)."""
    s = _gopher_signal_map(text)
    return (
        (s["n_words"] >= min_words)
        & (s["n_words"] <= max_words)
        & (s["mean_word_len"] >= 3.0)
        & (s["mean_word_len"] <= 10.0)
        & (s["symbol_word_ratio"] <= 0.1)
        & (s["bullet_line_frac"] <= 0.9)
        & (s["ellipsis_line_frac"] <= 0.3)
        & (s["alpha_word_frac"] >= 0.8)
        & (s["stop_hits"] >= 2)
    )


# placeholder subset of the public "List of Dirty, Naughty, Obscene…"
# blocklist C4 uses — swap the full list in for production; the rule
# mechanics (word-boundary match on the lowercased page) are identical
C4_BADWORDS = ("porn", "xxx", "viagra", "casino", "escort")


def c4_clean(text: Column, min_line_words: int = 5) -> Column:
    """C4's LINE-level cleanup (Raffel et al. 2020 §2.2), pure
    Catalyst: keep only lines that end in terminal punctuation
    (``. ! ? "``), carry at least ``min_line_words`` words, and do
    not mention "javascript"; survivors re-join with newlines.  (The
    paper's three-sentence-span dedup step is corpus-level — that is
    :func:`~xarray_spatial_spark.functions.dedup.duplicate_spans`.)"""
    ls = lines(text)
    kept = F.filter(
        ls,
        lambda l: l.rlike(r'[.!?"]\s*$')
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_line_words)
        & ~F.lower(l).contains("javascript"),
    )
    return F.array_join(kept, "\n")


def c4_page_keep(text: Column, cleaned: Column | None = None) -> Column:
    """C4's PAGE-level keep rule over the cleaned text: at least 3
    sentences (terminal-punctuation count as the sentence proxy — the
    paper uses a sentence splitter; same monotone signal), no
    blocklisted word (word-boundary, lowercased), no "lorem ipsum",
    no curly brace (code leakage)."""
    if cleaned is None:
        cleaned = c4_clean(text)
    low = F.lower(text)
    n_sent = F.regexp_count(cleaned, F.lit(r"[.!?]"))
    bad = low.rlike(r"\b(" + "|".join(C4_BADWORDS) + r")\b")
    return (
        (n_sent >= 3)
        & ~bad
        & ~low.contains("lorem ipsum")
        & ~text.contains("{")
    )


def c4_filter(df, text_col: str = "text", min_line_words: int = 5):
    """Apply the full C4 transform: line cleanup + page keep.
    Returns the kept rows with ``text_col`` REPLACED by the cleaned
    text — everything stays in the scan stage (no shuffle, no UDF)."""
    cleaned = c4_clean(F.col(text_col), min_line_words)
    out = df.withColumn("_c4", cleaned).filter(
        c4_page_keep(F.col(text_col), F.col("_c4"))
    )
    return out.drop(text_col).withColumnRenamed("_c4", text_col)


def tf_idf(
    df, top_k: int = 10, text_col: str = "text", id_col: str = "doc_id"
):
    """Top-k terms per document by smoothed tf-idf:

        tfidf(t, d) = (count(t in d) / len(d)) * (ln((N+1)/(df_t+1)) + 1)

    (the sklearn-style smooth idf).  Ties break (score desc, term asc)
    so output is deterministic.  Scale shape: term counts are hash
    aggregates; the idf join is an equi-join on the term (frequent
    terms are AQE skew-join keys; a small vocabulary auto-broadcasts);
    the top-k window partitions BY DOCUMENT — never a global sort.
    Returns (id, term, tf_idf, rank)."""
    terms = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("_tc"))
    doclen = terms.groupBy(id_col).agg(F.count(F.lit(1)).alias("_dl"))
    # N rides the plan as a broadcast 1-row aggregate instead of an
    # eager .count() job at BUILD time (one fewer fixed-cost job; the
    # value is identical)
    n_docs_df = df.select(id_col).distinct().agg(
        F.count(F.lit(1)).cast("double").alias("_N"))
    dfreq = (
        terms.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    )
    from pyspark.sql import Window

    scored = (
        tf.join(doclen, id_col)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs_df))
        .withColumn(
            "tf_idf",
            (F.col("_tc") / F.col("_dl"))
            * (F.log((F.col("_N") + 1.0) / (F.col("_df") + 1)) + 1.0),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf_idf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "term", "tf_idf", "rank")
    )


def bm25_topk(
    docs,
    queries,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_col: str = "query",
    qid_col: str = "query_id",
):
    """Okapi BM25 top-k retrieval: for each query row, the k highest-
    scoring documents.

        idf(t)     = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        score(q,d) = sum over DISTINCT query terms t of
                     idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    (Lucene's non-negative idf; duplicate query terms count once.)

    Scale shape — this is the inverted-index probe expressed in
    Catalyst: tf/doclen/df are map-side-combined hash aggregates over
    one explode of the corpus; the query-term table BROADCASTS, so
    the tf->query join discards every posting not matching a query
    term at the scan side of the exchange (the 100-TB property: work
    after the broadcast semi-filter is proportional to matching
    postings, not corpus size); N and avgdl ride the final job as a
    broadcast 1-row aggregate (no build-time count job); top-k is a
    window PARTITIONED BY QUERY — never a global sort.  Ties break
    (score desc, id asc) so ranks are deterministic.

    Returns (qid, id, score, n_terms_hit, rank)."""
    terms = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("_tf"))
    doclen = terms.groupBy(id_col).agg(F.count(F.lit(1)).alias("_dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("_N"),
        F.avg("_dl").alias("_avgdl"),
    )
    dfreq = terms.distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("_df"))
    qterms = queries.select(
        F.col(qid_col), F.explode(tokens(F.col(query_col))).alias("term")
    ).distinct()
    postings = tf.join(F.broadcast(qterms), "term")
    scored = (
        postings.join(dfreq, "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_s",
            F.log(1.0 + (F.col("_N") - F.col("_df") + 0.5)
                  / (F.col("_df") + 0.5))
            * F.col("_tf") * (k1 + 1.0)
            / (F.col("_tf")
               + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))),
        )
    )
    agg = scored.groupBy(qid_col, id_col).agg(
        F.sum("_s").alias("score"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(qid_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "score", "n_terms_hit", "rank")
    )


# ---------------------------------------------------------------------------
# n-gram LM cross-entropy (CCNet-style perplexity quality signal)
# ---------------------------------------------------------------------------


def bigrams(text: Column) -> Column:
    """Array of 'w1 w2' token bigrams ([] for < 2 tokens)."""
    return _bigrams_arr(tokens(text))


def ngrams(text: Column, n: int) -> Column:
    """Array of space-joined token n-grams ([] for < n tokens) —
    pure Catalyst (transform over slice windows), generalizing
    :func:`bigrams`."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = tokens(text)
    sz = F.size(toks)
    return F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_counts(
    df: DataFrame,
    n: int = 3,
    top_k: int | None = None,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Corpus-wide n-gram frequency table — the contamination-index /
    corpus-analysis primitive: (gram, count [, rank]).

    Scale shape: explode -> hash aggregate, so the shuffle carries
    (gram, partial-count) pairs with map-side combine absorbing
    frequent grams (a zipfian hot gram is exactly one partial row per
    task).  ``top_k`` ranks with a GLOBAL count ordering but never a
    global row sort of the gram table: it takes the driver-side cheap
    path of orderBy().limit(k), which Spark executes as a per-
    partition TopK + a k-row final merge (TakeOrderedAndProject), not
    a full exchange."""
    grams = df.select(F.explode(ngrams(F.col(text_col), n)).alias("gram"))
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("count"))
    if min_count > 1:
        counts = counts.filter(F.col("count") >= min_count)
    if top_k is None:
        return counts
    from pyspark.sql import Window

    # the unpartitioned rank window runs over the ALREADY k-row-limited
    # result (TakeOrderedAndProject upstream), never the gram table
    w = Window.orderBy(F.col("count").desc(), F.col("gram").asc())
    return (
        counts.orderBy(F.col("count").desc(), F.col("gram").asc())
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w))
    )


def lm_cross_entropy(
    train, score=None, alpha: float = 0.5,
    text_col: str = "text", id_col: str = "doc_id",
):
    """Per-doc cross-entropy under an add-alpha-smoothed bigram LM
    counted from ``train`` — the CCNet-style perplexity filter shape
    (score docs against a reference corpus LM; here the LM is built
    with the same engine instead of an external KenLM binary):

        H(doc) = mean over bigrams of -ln (c(w1 w2) + a) / (c(w1) + a V)

    Low H ~= fluent in-domain text; high H ~= gibberish/outliers.

    Scale design: the LM is two count tables (unigrams, bigrams) built
    by hash aggregation — counts, never text, shuffle.  Scoring is two
    equi-joins on the gram string; frequent-gram skew is an AQE
    skew-join case, and a small LM broadcasts automatically under the
    session's autoBroadcast threshold.  Returns
    ``(id, n_bigrams, cross_entropy)``; docs with < 2 tokens score
    NULL.  ``score`` defaults to ``train`` (self-perplexity)."""
    from pyspark.sql import DataFrame  # noqa: F401  (doc typing)

    from xarray_spatial_spark.functions.spread import spread

    # Tokenize ONCE into a persisted (id, toks) frame: the three gram
    # passes (unigram counts, bigram counts, doc bigrams) used to each
    # re-scan the text and re-run the tokenizer — at suite scale the
    # repeated tokenize+scan was the dominant cost, not the counting.
    # spread() (see spread.py) keeps a single-row-group input from
    # serializing the explode passes on one task; the exchange carries
    # only (id, toks).
    self_mode = score is None
    tk = spread(
        train.select(F.col(id_col), _toks_of(train, text_col).alias("_toks"))
    ).persist()
    stk = tk if self_mode else spread(
        score.select(F.col(id_col), _toks_of(score, text_col).alias("_toks"))
    )
    uni = (
        tk.select(F.explode("_toks").alias("w1"))
        .groupBy("w1").agg(F.count(F.lit(1)).alias("_c1"))
        .persist()
    )
    # V rides the plan as a broadcast 1-row aggregate over the
    # persisted unigram table instead of an eager .count() job at
    # BUILD time (one fewer fixed-cost job; identical value)
    vocab_df = uni.agg(F.count(F.lit(1)).cast("double").alias("_V"))
    bi = (
        tk.select(F.explode(_bigrams_arr(F.col("_toks"))).alias("gram"))
        .groupBy("gram").agg(F.count(F.lit(1)).alias("_c12"))
    )
    doc_bi = stk.select(
        F.col(id_col), F.explode(_bigrams_arr(F.col("_toks"))).alias("gram")
    )
    nll = -F.log(
        (F.coalesce("_c12", F.lit(0)) + F.lit(alpha))
        / (F.coalesce("_c1", F.lit(0)) + F.lit(alpha) * F.col("_V"))
    )
    if self_mode:
        # every scored gram is in `bi` and its w1 in `uni` (train ==
        # score), so the lookups consolidate at LM (gram-type) scale
        # and -ln P pre-computes there: the corpus pays ONE doc-scale
        # equi-join that attaches a single double (identical
        # expression, different stage — pytest pins equality with the
        # cascade path)
        lm = (
            bi.withColumn("w1", F.split(F.col("gram"), " ").getItem(0))
            .join(uni, "w1")
            .crossJoin(F.broadcast(vocab_df))
            .select("gram", nll.alias("_nll"))
        )
        joined = doc_bi.join(lm, "gram")
    else:
        joined = (
            doc_bi.withColumn("w1", F.split(F.col("gram"), " ").getItem(0))
            .join(bi, "gram", "left")
            .join(uni, "w1", "left")
            .crossJoin(F.broadcast(vocab_df))
            .withColumn("_nll", nll)
        )
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("_nll").alias("cross_entropy"),
    )
    ids = stk.select(id_col).distinct()
    return ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.col("cross_entropy"),
    )


def kn_cross_entropy(
    train, score=None, discount: float = 0.75,
    text_col: str = "text", id_col: str = "doc_id",
):
    """Per-doc cross-entropy under an interpolated Kneser-Ney TRIGRAM
    LM counted from ``train`` — the smoothing KenLM/CCNet actually use
    (add-alpha :func:`lm_cross_entropy` is the didactic baseline; KN
    is the production one: lower orders model *how many contexts* a
    gram continues, not how often it occurs).

    Three levels, fixed discount ``D`` (Kneser & Ney 1995; Chen &
    Goodman 1999 interpolated form).  ``discount`` is a fixed D in
    (0, 1), or ``"auto"`` for the Ney counts-of-counts estimate
    D = n1 / (n1 + 2 n2) over trigram types (what KenLM computes
    per order; one discount shared across orders is the documented
    simplification) — the estimate rides the scoring job as a
    broadcast 1-row aggregate over the persisted trigram table, so
    auto mode adds NO corpus pass and stays deterministic:

    - trigram: P3(w3|w1 w2) = max(c(w1w2w3) - D, 0) / c(w1w2*)
      + D * N1+(w1w2.) / c(w1w2*) * P2(w3|w2), where c(w1w2*) =
      sum_w3 c(w1w2w3) (context totals from OBSERVED trigrams, so the
      interpolation weight is > 0 whenever the denominator is — a raw
      bigram count would zero out contexts only seen at doc ends);
      unseen context -> P3 = P2.
    - bigram (continuation counts over trigram TYPES):
      P2(w3|w2) = max(N1+(.w2w3) - D, 0) / N1+(.w2.)
      + D * N1+(w2.*) / N1+(.w2.) * P1(w3); unseen middle -> P2 = P1.
    - unigram (continuation counts over corpus bigram TYPES, uniform
      base reserving one type of mass for OOV):
      P1(w3) = max(N1+(.w3) - D, 0) / N1+(..)
      + D * W1 / N1+(..) * 1 / (V + 1), with W1 = |{w : N1+(.w) > 0}|,
      V = vocabulary size.  P1 > 0 for every word incl. OOV, so no
      -ln(0) anywhere.

    Scale design: the LM is four count tables built by hash
    aggregation over exploded grams — counts, never text, shuffle, and
    map-side combine absorbs zipfian hot grams.  Scoring joins key on
    gram/word strings (AQE skew-join handles hot function words; small
    LMs broadcast under the session threshold) plus three broadcast
    1-row scalars — no eager job at build time.  SELF-perplexity
    (``score=None``, the corpus-filter shape) takes a consolidated
    path: every scored trigram is by construction IN the trigram
    table, so the five lookup tables pre-join at LM (gram-type) scale
    and the corpus pays ONE doc-scale equi-join instead of five; the
    cascade expressions are identical, only the join shape changes
    (equality pytest-pinned).  Returns ``(id, n_grams,
    cross_entropy)``; docs with < 3 tokens score NULL."""
    from xarray_spatial_spark.functions.spread import spread

    self_mode = score is None
    if discount == "auto":
        D = None  # Ney estimate from trigram counts-of-counts, below
    else:
        D = float(discount)
        if not (0.0 < D < 1.0):
            raise ValueError(f"discount must be in (0, 1), got {discount}")

    # Tokenize ONCE into a persisted (id, toks) frame — v_df,
    # bi_types, tri and (in self mode) doc_tri each used to re-scan
    # the text and re-run the tokenizer; the 4 redundant passes were
    # the dominant suite-scale cost.  spread() keeps a single-row-
    # group input from serializing the explode passes on one task.
    tk = spread(
        train.select(F.col(id_col), _toks_of(train, text_col).alias("_toks"))
    ).persist()
    stk = tk if self_mode else spread(
        score.select(F.col(id_col), _toks_of(score, text_col).alias("_toks"))
    )
    t_toks = tk.select(F.col("_toks").alias("toks"))
    # vocab size V (1-row broadcast)
    v_df = (
        t_toks.select(F.explode("toks").alias("w"))
        .agg(F.count_distinct("w").cast("double").alias("_V"))
    )
    # corpus bigram TYPES -> unigram continuation counts
    bi_types = (
        t_toks.select(F.explode(
            _gram_parts(F.col("toks"), 2)).alias("g"))
        .select(F.col("g").getItem(0).alias("w1"),
                F.col("g").getItem(1).alias("w3"))
        .distinct()
    )
    uni_cont = bi_types.groupBy("w3").agg(
        F.count(F.lit(1)).cast("double").alias("_n1w3"))
    # feeds uni_tot AND the scoring join: persist the gram-scale
    # result or the corpus-scale bigram-type distinct runs twice
    uni_cont = uni_cont.persist()
    uni_tot = uni_cont.agg(
        F.sum("_n1w3").alias("_n1all"),
        F.count(F.lit(1)).cast("double").alias("_W1"),
    )
    # trigram raw counts
    tri = (
        t_toks.select(F.explode(
            _gram_parts(F.col("toks"), 3)).alias("g"))
        .select(F.col("g").getItem(0).alias("w1"),
                F.col("g").getItem(1).alias("w2"),
                F.col("g").getItem(2).alias("w3"))
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("double").alias("_c123"))
        .persist()  # feeds 3 derived tables below
    )
    # context totals + distinct continuations, keyed (w1, w2)
    ctx = tri.groupBy("w1", "w2").agg(
        F.sum("_c123").alias("_c12"),
        F.count(F.lit(1)).cast("double").alias("_f12"),
    )
    # trigram TYPES -> bigram-level continuation tables
    mid = tri.groupBy("w2", "w3").agg(
        F.count(F.lit(1)).cast("double").alias("_n1mid"))
    midw2 = mid.groupBy("w2").agg(
        F.sum("_n1mid").alias("_midctx"),
        F.count(F.lit(1)).cast("double").alias("_midf"),
    )

    doc_tri = (
        stk.select(F.col(id_col), F.explode(
            _gram_parts(F.col("_toks"), 3)).alias("g"))
        .select(id_col,
                F.col("g").getItem(0).alias("w1"),
                F.col("g").getItem(1).alias("w2"),
                F.col("g").getItem(2).alias("w3"))
    )
    if D is not None:
        dL = F.lit(D)
        d_df = None
    else:
        d_df = tri.agg(
            F.sum((F.col("_c123") == 1).cast("double")).alias("_n1"),
            F.sum((F.col("_c123") == 2).cast("double")).alias("_n2"),
        ).select(
            F.least(
                F.greatest(
                    F.coalesce(
                        F.col("_n1") / (F.col("_n1") + 2 * F.col("_n2")),
                        F.lit(0.75),
                    ),
                    F.lit(0.001),
                ),
                F.lit(0.999),
            ).alias("_D")
        )
        dL = F.col("_D")
    if self_mode:
        # every scored trigram exists in `tri`, so all five lookups
        # consolidate into one trigram-keyed table at LM scale; the
        # KN cascade (p1/p2/p3 below) ALSO evaluates there, so the
        # corpus pays a single doc-scale join that attaches one
        # pre-computed -ln P3 double (identical expressions, different
        # stage — pytest pins equality with the cascade path)
        j = (
            tri.join(ctx, ["w1", "w2"])
            .join(mid, ["w2", "w3"])
            .join(midw2, ["w2"])
            .join(uni_cont, ["w3"])
            .crossJoin(F.broadcast(uni_tot))
            .crossJoin(F.broadcast(v_df))
        )
    else:
        j = (
            doc_tri.join(tri, ["w1", "w2", "w3"], "left")
            .join(ctx, ["w1", "w2"], "left")
            .join(mid, ["w2", "w3"], "left")
            .join(midw2, ["w2"], "left")
            .join(uni_cont, ["w3"], "left")
            .crossJoin(F.broadcast(uni_tot))
            .crossJoin(F.broadcast(v_df))
        )
    if d_df is not None:
        j = j.crossJoin(F.broadcast(d_df))
    p1 = F.when(
        F.col("_n1all") > 0,
        F.greatest(F.coalesce("_n1w3", F.lit(0.0)) - dL, F.lit(0.0))
        / F.col("_n1all")
        + dL * F.col("_W1") / F.col("_n1all") / (F.col("_V") + 1),
    ).otherwise(1.0 / (F.coalesce("_V", F.lit(0.0)) + 1))
    p2 = F.when(
        F.col("_midctx").isNotNull(),
        F.greatest(F.coalesce("_n1mid", F.lit(0.0)) - dL, F.lit(0.0))
        / F.col("_midctx")
        + dL * F.col("_midf") / F.col("_midctx") * p1,
    ).otherwise(p1)
    p3 = F.when(
        F.col("_c12").isNotNull(),
        F.greatest(F.coalesce("_c123", F.lit(0.0)) - dL, F.lit(0.0))
        / F.col("_c12")
        + dL * F.col("_f12") / F.col("_c12") * p2,
    ).otherwise(p2)
    if self_mode:
        lm_nll = j.select("w1", "w2", "w3", (-F.log(p3)).alias("_nll"))
        scored = doc_tri.join(lm_nll, ["w1", "w2", "w3"])
    else:
        scored = j.withColumn("_nll", -F.log(p3))
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.avg("_nll").alias("cross_entropy"),
    )
    ids = stk.select(id_col).distinct()
    return ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.col("cross_entropy"),
    )


def perplexity_buckets(
    df,
    weights=None,
    by: str | None = None,
    fracs: tuple[float, float] = (1.0 / 3, 2.0 / 3),
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """CCNet's signature filtering step: label every doc head /
    middle / tail by LM-perplexity percentile (head = LOWEST
    cross-entropy = most in-domain; CCNet keeps head+middle and drops
    tail).  ``weights`` defaults to KN self-perplexity
    (:func:`kn_cross_entropy` on ``df``); pass any (id, cross_entropy)
    frame to bucket under a different LM.  ``by`` buckets within a
    partition column (CCNet computes percentiles per LANGUAGE shard —
    pass the langid column for that); None = one global threshold
    pair.

    Scale shape: NO global sort — thresholds are one exact-percentile
    aggregation (grouped by ``by`` when given) broadcast/joined back,
    so the labeling pass is embarrassingly parallel.  Cross-entropy is
    rounded to 6 dp BEFORE thresholding and the thresholds are rounded
    the same, so the bucketing is reproducible across engines (sum
    order perturbs the raw double at ~1e-13; comparisons run on the
    rounded values).  Docs the LM cannot score (< 3 tokens) label
    'unscored'.  Returns (id[, by], cross_entropy, bucket)."""
    if weights is None:
        weights = kn_cross_entropy(df, text_col=text_col, id_col=id_col)
    # feeds BOTH the threshold aggregation and the labeling join:
    # persist the (id, rounded-H) frame or the whole LM computation
    # upstream runs twice (measured 2x the slot cost)
    w = weights.select(
        id_col, F.round("cross_entropy", 6).alias("cross_entropy")
    ).persist()
    if by is not None:
        w = w.join(df.select(id_col, by), id_col)
        thr = w.groupBy(by).agg(
            F.round(F.percentile("cross_entropy", fracs[0]), 6).alias("_t1"),
            F.round(F.percentile("cross_entropy", fracs[1]), 6).alias("_t2"),
        )
        j = w.join(F.broadcast(thr), by, "left")
    else:
        thr = w.agg(
            F.round(F.percentile("cross_entropy", fracs[0]), 6).alias("_t1"),
            F.round(F.percentile("cross_entropy", fracs[1]), 6).alias("_t2"),
        )
        j = w.crossJoin(F.broadcast(thr))
    bucket = (
        F.when(F.col("cross_entropy").isNull(), "unscored")
        .when(F.col("cross_entropy") <= F.col("_t1"), "head")
        .when(F.col("cross_entropy") <= F.col("_t2"), "middle")
        .otherwise("tail")
    )
    cols = [id_col] + ([by] if by is not None else [])
    return j.select(*cols, "cross_entropy", bucket.alias("bucket"))


def _gram_parts(toks: Column, n: int) -> Column:
    """Array of n-gram token STRUCT-free arrays (array<array<string>>)
    — like :func:`ngrams` but keeping the parts split, so callers can
    key joins on individual positions without re-splitting."""
    sz = F.size(toks)
    return F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - n + 1),
            lambda i: F.slice(toks, i, n),
        ),
    ).otherwise(F.array().cast("array<array<string>>"))


def fingerprint_sql(text_expr: str) -> str:
    """The identical fingerprint as DuckDB SQL: map tokens to their
    numeric contribution, then fold with a prepended 0 as the initial
    accumulator (DuckDB list_reduce seeds from the first element)."""
    toks = (
        f"CASE WHEN trim({text_expr}) = '' THEN []::VARCHAR[] "
        f"ELSE string_split_regex(trim({text_expr}), '\\s+') END"
    )
    vals = f"list_transform({toks}, t -> CAST(ascii(t) * 31 + length(t) AS BIGINT))"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {vals}), "
        f"(h, x) -> (h * 131 + x) % {FP_PRIME})"
    )


#: modulus for the char-level portable hash (shared with
#: corpus.stratified_sample / dsir: products stay under 2^63)
PSH_PRIME = 1_000_000_007


def portable_string_hash(c: Column) -> Column:
    """Char-level rolling hash h = (h*131 + codepoint) mod 1e9+7 —
    full-string dispersion (unlike :func:`fingerprint`'s per-token
    first-char+length shape) and exactly reproducible in ANSI SQL, so
    hash-keyed decisions (splits, folds) are oracle-checkable.  Pure
    Catalyst HOF over the char array; keys this feeds (domains, urls)
    are short, so the fold stays cheap."""
    return F.aggregate(
        F.filter(F.split(c, ""), lambda ch: ch != ""),
        F.lit(0).cast("long"),
        lambda h, ch: (h * 131 + F.ascii(ch)) % PSH_PRIME,
    )


def portable_string_hash_sql(expr: str) -> str:
    """DuckDB twin of :func:`portable_string_hash` (verified char-split
    and codepoint parity, including the empty string)."""
    chars = f"list_filter(string_split({expr}, ''), c -> c <> '')"
    vals = f"list_transform({chars}, c -> CAST(ascii(c) AS BIGINT))"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {vals}), "
        f"(h, x) -> (h * 131 + x) % {PSH_PRIME})"
    )


# ---------------------------------------------------------------------------
# dedup-key normalization (CCNet/C4-style)
# ---------------------------------------------------------------------------

#: common Latin accented chars -> ASCII (documented subset; full
#: Unicode NFD folding is a data table, not an algorithm — extend the
#: pair below for more scripts)
_ACCENT_SRC = "\u00e0\u00e1\u00e2\u00e3\u00e4\u00e5\u00e8\u00e9\u00ea\u00eb\u00ec\u00ed\u00ee\u00ef\u00f2\u00f3\u00f4\u00f5\u00f6\u00f9\u00fa\u00fb\u00fc\u00e7\u00f1\u00fd\u00ff"
_ACCENT_DST = "aaaaaaeeeeiiiiooooouuuucnyy"


def normalize_for_dedup(text: Column) -> Column:
    """CCNet-style normalization for FUZZY dedup keys: lower-case,
    fold common Latin accents, digits -> 0, punctuation -> space,
    collapse whitespace.  Two near-identical crawls of a page (casing,
    timestamps, counters, punctuation drift) normalize to the same
    key; hash THIS column instead of raw text in exact_duplicates /
    distinct_by_text for the standard fuzzy-exact middle ground.
    Pure Catalyst — stays in the scan stage."""
    t = F.lower(text)
    t = F.translate(t, _ACCENT_SRC, _ACCENT_DST)
    t = F.regexp_replace(t, "[0-9]", "0")
    t = F.regexp_replace(t, "[^a-z0\\u00c0-\\u024f ]", " ")
    t = F.regexp_replace(t, "\\s+", " ")
    return F.trim(t)


# ---------------------------------------------------------------------------
# mojibake (UTF-8 read as windows-1252) — the ftfy core case
# ---------------------------------------------------------------------------
#
# The single most common crawl text corruption: a page whose UTF-8
# bytes were decoded as windows-1252 somewhere upstream ("Ã©" for é,
# "â€™" for ’).  Detection is a pure-Catalyst artifact counter (the
# characteristic lead-char + continuation-char shapes below);
# repair re-encodes through the WHATWG windows-1252 byte map and
# accepts the result ONLY when it decodes as strict UTF-8 — the safe
# inverse, a no-op on clean text.

# chars that windows-1252 (WHATWG flavor: undefined bytes pass through
# as C1 controls) produces for UTF-8 continuation bytes 0x80-0xBF --
# built from the codec table so every char is byte-exact (NBSP vs
# space, soft hyphen vs '-' are invisible in source)
_MOJI_CONT = "".join(
    chr(b) if b in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
    else bytes([b]).decode("cp1252")
    for b in range(0x80, 0xC0)
)
#: UTF-8-as-cp1252 artifact shapes: a 2-byte lead (Â/Ã: bytes C2/C3,
#: the Latin-1 supplement everything European hits) or the 3-byte E2
#: lead (â: general punctuation — curly quotes, dashes) followed by
#: continuation-shaped chars.  Java and RE2 agree on this subset, so
#: the oracle twin is the pattern verbatim.
MOJIBAKE_PATTERN = f"[ÂÃ][{_MOJI_CONT}]|â[{_MOJI_CONT}][{_MOJI_CONT}]"


def mojibake_hits(text: Column) -> Column:
    """Count of double-encoding artifacts in ``text`` (0 = clean).
    Codegen ``regexp_count`` — runs in the scan stage; gate repair on
    ``mojibake_hits > 0`` so clean pages never pay the Python pass."""
    return F.regexp_count(text, F.lit(MOJIBAKE_PATTERN))


def mojibake_hits_sql(text_expr: str) -> str:
    """DuckDB twin of :func:`mojibake_hits` (same pattern verbatim)."""
    return (
        "len(regexp_extract_all("
        f"{text_expr}, '{MOJIBAKE_PATTERN}'))"
    )


def fix_mojibake(text: Column, passes: int = 2) -> Column:
    """Undo UTF-8-as-windows-1252 double encoding: encode back through
    the WHATWG cp1252 byte map (undefined bytes 81/8D/8F/90/9D travel
    as their C1 codepoints) and keep the result only if the bytes
    decode as STRICT UTF-8 — clean text fails that gate and passes
    through untouched, so the repair is safe to run corpus-wide.
    ``passes`` > 1 unwinds doubly-mojibaked text (each pass is one
    decode level); a fixed point stops early.

    Arrow-batched ``pandas_udf`` (Python owns the codec tables).
    NOTE: wrapping this in ``F.when(mojibake_hits(c) > 0, ...)`` does
    NOT skip the Python pass — Catalyst extracts Python UDFs into an
    unconditional ArrowEvalPython node and the `when` only selects
    afterward.  To keep clean pages off the Arrow path at scale,
    SPLIT the frame: repair ``df.filter(mojibake_hits(c) > 0)`` and
    union the untouched remainder (both halves of the filter prune at
    the scan, so the corpus is still read once per half-plan)."""
    import codecs

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _c1pass(err):
        # cp1252 leaves 5 bytes undefined; WHATWG maps them to the C1
        # controls, so encode those codepoints back to their byte value
        chunk = err.object[err.start:err.end]
        if all(ord(c) < 0x100 for c in chunk):
            return bytes(ord(c) for c in chunk), err.end
        raise err

    try:
        codecs.lookup_error("xrspatial_c1pass")
    except LookupError:
        codecs.register_error("xrspatial_c1pass", _c1pass)

    n_passes = passes

    @pandas_udf("string")
    def _fix(col):
        try:
            codecs.lookup_error("xrspatial_c1pass")
        except LookupError:
            codecs.register_error("xrspatial_c1pass", _c1pass)
        out = []
        for s in col:
            if s is None:
                out.append(None)
                continue
            for _ in range(n_passes):
                try:
                    b = s.encode("cp1252", "xrspatial_c1pass")
                    fixed = b.decode("utf-8", "strict")
                except (UnicodeEncodeError, UnicodeDecodeError):
                    break
                if fixed == s:
                    break
                s = fixed
            out.append(s)
        return pd.Series(out)

    return _fix(text)
