"""Text-analysis functions: numpy/python oracles + determinism."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from xarray_spatial_spark.functions import text as tx


def _df(spark, rows):
    return spark.createDataFrame(pd.DataFrame({"text": rows}))


def test_token_counts(spark):
    df = _df(spark, ["the cat sat", "", "  spaced   out  ", "one"])
    got = df.select(
        tx.token_count(F.col("text")).alias("tc"),
        tx.word_token_count(F.col("text")).alias("wc"),
    ).collect()
    assert [r["tc"] for r in got] == [3, 0, 2, 1]
    assert got[0]["wc"] == 3


def test_word_token_count_punct(spark):
    df = _df(spark, ["hello, world! it's fine."])
    # regex \w+|[^\w\s]: hello , world ! it ' s fine . -> 9
    assert df.select(tx.word_token_count(F.col("text"))).collect()[0][0] == 9


def test_ratios(spark):
    df = _df(spark, ["abc!?", "abcde"])
    got = df.select(
        tx.punct_ratio(F.col("text")).alias("p"),
        tx.alpha_ratio(F.col("text")).alias("a"),
    ).collect()
    assert got[0]["p"] == 2 / 5 and got[1]["p"] == 0.0
    assert got[0]["a"] == 3 / 5 and got[1]["a"] == 1.0


def test_langid(spark):
    df = _df(
        spark,
        [
            "the cat is in the house and that is fine",
            "der hund ist nicht mit der katze",
            "le chat est dans la maison pour les fetes",
            "el perro es en la casa por una noche",
            "totally unmatched tokens xyzzy",
        ],
    )
    got = [r[0] for r in df.select(tx.langid(F.col("text"))).collect()]
    assert got == ["en", "de", "fr", "es", "und"]


def test_quality_score_ordering(spark):
    good = "the quick brown fox jumps over the lazy dog and that is fine " * 6
    bad = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"
    df = _df(spark, [good, bad])
    got = [r[0] for r in df.select(tx.quality_score(F.col("text"))).collect()]
    assert got[0] > 0.8 > got[1]
    assert 0.0 <= got[1] <= 1.0


def test_fingerprint_deterministic_and_order_sensitive(spark):
    df = _df(spark, ["a b c", "c b a", "a b c"])
    got = [r[0] for r in df.select(tx.fingerprint(F.col("text"))).collect()]
    assert got[0] == got[2] != got[1]
    # python replication of the rolling hash
    h = 0
    for t in "a b c".split():
        h = (h * 131 + ord(t[0]) * 31 + len(t)) % tx.FP_PRIME
    assert got[0] == h


def test_fingerprint_sql_parity(spark):
    import duckdb

    texts = ["the cat sat on the mat", "hello world", "a", ""]
    df = _df(spark, texts)
    got = [r[0] for r in df.select(tx.fingerprint(F.col("text"))).collect()]
    want = [
        duckdb.sql(
            f"SELECT {tx.fingerprint_sql('?')}",
            params=[t],
        ).fetchone()[0] if False else None
        for t in texts
    ]
    # duckdb param binding inside the generated expr: inline instead
    want = [
        duckdb.sql(
            "SELECT " + tx.fingerprint_sql(f"'{t}'")
        ).fetchone()[0]
        for t in texts
    ]
    assert got == want


def test_bands_to_img_matches_reference_semantics(spark):
    """Packed RGBA == the reference's uint32 view of its (h,w,4)
    uint8 image (utils.py:363-371)."""
    import numpy as np
    from pyspark.sql import functions as F
    from xarray_spatial_spark.functions import viz

    rng = np.random.default_rng(5)
    n = 200
    r = rng.uniform(0, 255, n); r[::17] = np.nan; r[::23] = 0.5
    g = rng.integers(0, 256, n).astype(float)
    b = rng.integers(0, 256, n).astype(float)
    rows = [(i, None if np.isnan(r[i]) else float(r[i]), float(g[i]), float(b[i]))
            for i in range(n)]
    df = spark.createDataFrame(rows, schema="i long, r double, g double, b double")
    out = {x["i"]: x["rgba"] for x in df.select(
        "i", viz.bands_to_img_expr(F.col("r"), F.col("g"), F.col("b"),
                                   nodata=1).alias("rgba")).collect()}
    for i in range(n):
        rr = 0 if np.isnan(r[i]) else int(np.uint8(r[i]))
        gg, bb = int(np.uint8(g[i])), int(np.uint8(b[i]))
        a = 0 if (np.isnan(r[i]) or r[i] <= 1) else 255
        expect = rr | (gg << 8) | (bb << 16) | (a << 24)
        assert out[i] == expect, i


def test_color_values_expr(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from xarray_spatial_spark.functions import viz

    df = spark.createDataFrame(
        [(float(v),) for v in [1, 2, 3, 9]], schema="v double"
    )
    key = {1.0: "red", 2.0: "#00ff00", 3.0: (12, 34, 56)}
    got = [r["c"] for r in df.select(
        viz.color_values_expr(F.col("v"), key).alias("c")).collect()]
    assert got[0] == 255 | (255 << 24)
    assert got[1] == (255 << 8) | (255 << 24)
    assert got[2] == 12 | (34 << 8) | (56 << 16) | (255 << 24)
    assert got[3] == 0  # outside the key


def test_dup_line_fractions(spark):
    from xarray_spatial_spark.functions import text as tx

    rows = [
        (0, "a\nb\nc"),            # no repeats
        (1, "a\na\na\nb"),         # 2 of 4 lines are repeats
        (2, "xx\nxx"),             # 1 of 2; chars: 4 total, 2 dup
        (3, ""),                   # empty
        (4, "only one line"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    got = {r["doc_id"]: (r["lf"], r["cf"]) for r in df.select(
        "doc_id",
        tx.dup_line_fraction(F.col("text")).alias("lf"),
        tx.dup_line_char_fraction(F.col("text")).alias("cf"),
    ).collect()}
    assert got[0] == (0.0, 0.0)
    assert got[1] == (0.5, 0.5)    # 'a' repeats twice: 2/4 lines, 2/4 chars
    assert got[2] == (0.5, 0.5)
    assert got[3] == (0.0, 0.0)
    assert got[4] == (0.0, 0.0)


def test_redact_pii(spark):
    from xarray_spatial_spark.functions import text as tx

    rows = [
        (0, "mail me at john.doe+spam@sub.example.co.uk thanks"),
        (1, "server at 192.168.0.1 and 8.8.8.8."),
        (2, "call +1 (555) 123-4567 or 020 7946 0958 now"),
        (3, "no pii here"),
        # the email's digits must not survive as a phone fragment
        (4, "x123456789@example.com"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    got = {r["doc_id"]: r["red"] for r in df.select(
        "doc_id", tx.redact_pii(F.col("text")).alias("red")).collect()}
    assert got[0] == "mail me at <EMAIL> thanks"
    assert got[1] == "server at <IP> and <IP>."
    assert got[2] == "call <PHONE> or <PHONE> now"
    assert got[3] == "no pii here"
    assert got[4] == "<EMAIL>"


def test_gopher_signals_and_keep(spark):
    from xarray_spatial_spark.functions import text as tx

    good = ("the quick brown fox jumps over that lazy dog and runs off "
            "with the bone of contention for everyone ") * 3
    bullets = "\n".join("- item %d" % i for i in range(20))
    symbols = "# ".join("word" for _ in range(60))
    short = "too short"
    df = spark.createDataFrame(
        [(0, good), (1, bullets), (2, symbols), (3, short)],
        schema="doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", *tx.gopher_signals(F.col("text")),
        tx.gopher_keep(F.col("text")).alias("keep")).collect()}
    assert out[0]["keep"] is True
    assert out[0]["stop_hits"] >= 2 and out[0]["alpha_word_frac"] == 1.0
    assert out[1]["keep"] is False and out[1]["bullet_line_frac"] == 1.0
    assert out[2]["keep"] is False and out[2]["symbol_word_ratio"] > 0.1
    assert out[3]["keep"] is False and out[3]["n_words"] == 2


def test_lm_cross_entropy_orders_fluency(spark):
    from xarray_spatial_spark.functions import text as tx

    common = "the cat sat on the mat and the dog sat on the rug"
    train_rows = [(i, common) for i in range(20)] + [
        (100 + i, f"doc number {i} about cats and dogs on mats") for i in range(10)
    ]
    train = spark.createDataFrame(train_rows, schema="doc_id long, text string")
    score_rows = [
        (0, "the cat sat on the mat"),        # in-domain: low H
        (1, "zqx vlk wmp qrs ttv bbn"),       # gibberish: high H
        (2, "one"),                           # < 2 tokens: NULL
    ]
    score = spark.createDataFrame(score_rows, schema="doc_id long, text string")
    got = {r["doc_id"]: r for r in
           tx.lm_cross_entropy(train, score).collect()}
    assert got[0]["cross_entropy"] < got[1]["cross_entropy"]
    assert got[2]["n_bigrams"] == 0 and got[2]["cross_entropy"] is None
    # hand-check one bigram's probability: 'the cat' vs smoothing math
    import math
    uni = {}
    bi = {}
    for _, t in train_rows:
        ws = t.split()
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    V = len(uni)
    doc = score_rows[0][1].split()
    nll = [-math.log((bi.get((a, b), 0) + 0.5) / (uni.get(a, 0) + 0.5 * V))
           for a, b in zip(doc, doc[1:])]
    assert abs(got[0]["cross_entropy"] - sum(nll) / len(nll)) < 1e-9


def test_tf_idf_top_terms(spark):
    from xarray_spatial_spark.functions import text as tx
    import math

    rows = [
        (0, "apple apple apple banana the the"),
        (1, "banana cherry the the the"),
        (2, "the the the the"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tf_idf"])
           for r in tx.tf_idf(df, top_k=2).collect()}
    # doc 0's top term is 'apple' (frequent in-doc, rare in corpus)
    assert got[(0, 1)][0] == "apple"
    # smooth idf floors at 1.0: doc 1's dominant 'the' (tf 0.6) still
    # outranks the rare terms; among those, cherry (df=1, idf 1.69)
    # beats banana (df=2, idf 1.29) at equal tf
    assert got[(1, 1)][0] == "the"
    assert got[(1, 2)][0] == "cherry"
    # exact values: doc0 apple = 3/6 * (ln(4/2)+1); doc1 the = 3/5 * 1
    assert abs(got[(0, 1)][1] - (3 / 6) * (math.log(4 / 2) + 1)) < 1e-12
    assert abs(got[(1, 1)][1] - 3 / 5) < 1e-12


def test_ngrams_expr(spark):
    from xarray_spatial_spark.functions.text import ngrams

    df = spark.createDataFrame(
        [("a b c d",), ("x y",), ("solo",), ("",)], "text string")
    got = [r[0] for r in df.select(ngrams(F.col("text"), 3)).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == [] and got[2] == [] and got[3] == []
    got2 = [r[0] for r in df.select(ngrams(F.col("text"), 1)).collect()]
    assert got2[0] == ["a", "b", "c", "d"] and got2[2] == ["solo"]


def test_ngram_counts_topk(spark):
    from xarray_spatial_spark.functions.text import ngram_counts

    rows = [("the cat sat",)] * 5 + [("the cat ran",)] * 3 + [("dogs bark",)] * 2
    df = spark.createDataFrame(rows, "text string")
    top = ngram_counts(df, n=2, top_k=3).collect()
    assert [(r["gram"], r["count"], r["rank"]) for r in top] == [
        ("the cat", 8, 1), ("cat sat", 5, 2), ("cat ran", 3, 3)]
    # full table + min_count
    full = {r["gram"]: r["count"]
            for r in ngram_counts(df, n=2, min_count=3).collect()}
    assert full == {"the cat": 8, "cat sat": 5, "cat ran": 3}
    # TopK plan: no full exchange for the limit path
    plan = ngram_counts(df, n=2, top_k=3)._jdf.queryExecution(
        ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_hand_computed(spark):
    """3-doc corpus, one query — score checked against a by-hand
    numpy BM25 (k1=1.2, b=0.75, Lucene idf)."""
    import math

    from xarray_spatial_spark.functions.text import bm25_topk

    corpus = ["cat sat mat", "cat cat dog", "dog runs far away now"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    qs = spark.createDataFrame([(0, "cat dog")], "query_id int, query string")
    got = {r["doc_id"]: r for r in bm25_topk(docs, qs, k=3).collect()}

    toks = [c.split() for c in corpus]
    N, avgdl = 3.0, sum(map(len, toks)) / 3.0
    def idf(t):
        dfreq = sum(t in d for d in toks)
        return math.log(1 + (N - dfreq + 0.5) / (dfreq + 0.5))
    def s(d, t):
        tf = toks[d].count(t)
        if not tf:
            return 0.0
        return idf(t) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(toks[d]) / avgdl))
    for d in range(3):
        want = s(d, "cat") + s(d, "dog")
        assert abs(got[d]["score"] - want) < 1e-9, (d, got[d]["score"], want)
    # doc 1 has both terms (cat x2, dog x1) -> rank 1
    assert got[1]["rank"] == 1 and got[1]["n_terms_hit"] == 2
    assert got[0]["n_terms_hit"] == 1 and got[2]["n_terms_hit"] == 1


def test_bm25_topk_and_tie_determinism(spark):
    from xarray_spatial_spark.functions.text import bm25_topk

    # 6 identical docs -> identical scores; rank must follow doc_id
    docs = spark.createDataFrame(
        [(i, "same words here") for i in range(6)],
        "doc_id long, text string")
    qs = spark.createDataFrame([(7, "words")], "query_id int, query string")
    got = bm25_topk(docs, qs, k=4).orderBy("rank").collect()
    assert [r["doc_id"] for r in got] == [0, 1, 2, 3]
    assert len({round(r["score"], 9) for r in got}) == 1
    # duplicate query terms count once
    qs2 = spark.createDataFrame(
        [(1, "words words words")], "query_id int, query string")
    one = bm25_topk(docs, qs2, k=1).collect()[0]
    assert abs(one["score"] - got[0]["score"]) < 1e-12
    assert one["n_terms_hit"] == 1


def test_bm25_plan_broadcasts_query_terms(spark):
    from xarray_spatial_spark.functions.text import bm25_topk

    docs = spark.createDataFrame(
        [(i, f"w{i} common") for i in range(50)], "doc_id long, text string")
    qs = spark.createDataFrame([(0, "common w3")], "query_id int, query string")
    plan = bm25_topk(docs, qs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # postings x query-terms probe


def _kn_reference(train_texts, score_docs, D=0.75):
    """Independent pure-python interpolated-KN trigram reference
    (recounts everything from scratch; no shared code with text.py)."""
    import math
    from collections import defaultdict

    tri = defaultdict(int)
    bi_types = set()
    vocab = set()
    for t in train_texts:
        ws = t.split()
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            bi_types.add((a, b))
        for a, b, c in zip(ws, ws[1:], ws[2:]):
            tri[(a, b, c)] += 1
    V = len(vocab)
    n1w3 = defaultdict(int)
    for a, b in bi_types:
        n1w3[b] += 1
    n1all = len(bi_types)
    W1 = len(n1w3)
    ctx_tot = defaultdict(float)
    ctx_follow = defaultdict(int)
    n1mid = defaultdict(int)
    for (a, b, c), n in tri.items():
        ctx_tot[(a, b)] += n
        ctx_follow[(a, b)] += 1
        n1mid[(b, c)] += 1
    midctx = defaultdict(float)
    midf = defaultdict(int)
    for (b, c), n in n1mid.items():
        midctx[b] += n
        midf[b] += 1

    def p1(w):
        if n1all == 0:
            return 1.0 / (V + 1)
        return (max(n1w3.get(w, 0) - D, 0.0) / n1all
                + D * W1 / n1all / (V + 1))

    def p2(w2, w3):
        if w2 not in midctx:
            return p1(w3)
        return (max(n1mid.get((w2, w3), 0) - D, 0.0) / midctx[w2]
                + D * midf[w2] / midctx[w2] * p1(w3))

    def p3(w1, w2, w3):
        if (w1, w2) not in ctx_tot:
            return p2(w2, w3)
        return (max(tri.get((w1, w2, w3), 0) - D, 0.0) / ctx_tot[(w1, w2)]
                + D * ctx_follow[(w1, w2)] / ctx_tot[(w1, w2)] * p2(w2, w3))

    out = {}
    for doc_id, t in score_docs:
        ws = t.split()
        if len(ws) < 3:
            out[doc_id] = (0, None)
            continue
        nll = [-math.log(p3(a, b, c))
               for a, b, c in zip(ws, ws[1:], ws[2:])]
        out[doc_id] = (len(nll), sum(nll) / len(nll))
    return out


def test_kn_cross_entropy_matches_reference(spark):
    train_rows = [(i, "the cat sat on the mat and the dog sat on the rug")
                  for i in range(8)] + [
        (100 + i, f"doc number {i} about cats and dogs on mats")
        for i in range(5)
    ] + [(200, "tail bigram only"), (201, "xy zz")]
    score_rows = [
        (0, "the cat sat on the mat"),          # in-domain
        (1, "zqx vlk wmp qrs ttv bbn"),         # all-OOV gibberish
        (2, "one two"),                         # < 3 tokens: NULL
        (3, "the cat flew over unseen things"), # mixed seen/unseen
        (4, "mats the cat"),                    # unseen context, seen words
    ]
    train = spark.createDataFrame(train_rows, schema="doc_id long, text string")
    score = spark.createDataFrame(score_rows, schema="doc_id long, text string")
    got = {r["doc_id"]: r for r in
           tx.kn_cross_entropy(train, score).collect()}
    ref = _kn_reference([t for _, t in train_rows], score_rows)
    for doc_id, (n, h) in ref.items():
        assert got[doc_id]["n_grams"] == n
        if h is None:
            assert got[doc_id]["cross_entropy"] is None
        else:
            assert abs(got[doc_id]["cross_entropy"] - h) < 1e-9, doc_id
    # fluency ordering survives smoothing
    assert got[0]["cross_entropy"] < got[1]["cross_entropy"]
    # gibberish must still be finite (no -ln(0) anywhere)
    import math
    assert math.isfinite(got[1]["cross_entropy"])


def test_kn_cross_entropy_self_and_validation(spark):
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(4)]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    got = {r["doc_id"]: r for r in tx.kn_cross_entropy(df).collect()}
    # identical docs -> identical self-perplexity, 4 trigrams each
    vals = {round(r["cross_entropy"], 12) for r in got.values()}
    assert len(vals) == 1 and all(r["n_grams"] == 4 for r in got.values())
    import pytest
    with pytest.raises(ValueError):
        tx.kn_cross_entropy(df, discount=1.5)


def test_kn_self_mode_consolidated_equals_cascade(spark):
    """score=None (one consolidated LM join) == score=train (the
    5-join cascade) — the fast path must be a pure plan change."""
    rows = [(i, t) for i, t in enumerate([
        "the cat sat on the mat and the dog sat on the rug",
        "doc about cats and dogs on mats",
        "tail bigram only here",
        "alpha beta gamma delta alpha beta",
        "", "one two",
    ])]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    fast = {r["doc_id"]: r for r in tx.kn_cross_entropy(df).collect()}
    slow = {r["doc_id"]: r for r in tx.kn_cross_entropy(df, df).collect()}
    assert set(fast) == set(slow)
    for did in fast:
        assert fast[did]["n_grams"] == slow[did]["n_grams"], did
        a, b = fast[did]["cross_entropy"], slow[did]["cross_entropy"]
        assert (a is None) == (b is None), did
        if a is not None:
            assert abs(a - b) < 1e-9, did


def test_perplexity_buckets_ccnet(spark):
    rows = [(i, "the cat sat on the mat and the dog sat here too")
            for i in range(6)] + [
        (10, "cats dogs mats rugs and the usual words"),
        (11, "zqx vlk wmp qrs ttv bbn gibberish stream"),
        (12, "ok"),  # unscorable: < 3 tokens
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {r["doc_id"]: r for r in tx.perplexity_buckets(df).collect()}
    assert out[12]["bucket"] == "unscored"
    assert out[11]["bucket"] == "tail"          # gibberish lands in tail
    assert out[0]["bucket"] == "head"           # the repeated doc is head
    # counts respect the percentile split over the 8 scored docs
    from collections import Counter
    c = Counter(r["bucket"] for r in out.values())
    assert c["unscored"] == 1 and c["tail"] >= 1 and c["head"] >= 1
    # thresholds recompute identically at different parallelism
    out2 = {r["doc_id"]: r["bucket"] for r in
            tx.perplexity_buckets(df.repartition(5)).collect()}
    assert out2 == {k: v["bucket"] for k, v in out.items()}


def test_perplexity_buckets_by_language(spark):
    en = [(i, "the cat and the dog sat on the mat " + "again " * (i % 3))
          for i in range(6)]
    de = [(100 + i, "der hund und die katze ist nicht hier " + "mehr " * (i % 3))
          for i in range(6)]
    df = spark.createDataFrame(en + de, schema="doc_id long, text string")
    df = df.withColumn("lang", (F.col("doc_id") < 100).cast("string"))
    out = tx.perplexity_buckets(df, by="lang").collect()
    # per-language thresholds: each language gets its own head docs
    langs_with_head = {r["lang"] for r in out if r["bucket"] == "head"}
    assert langs_with_head == {"true", "false"}


def test_c4_filters(spark):
    page_good = (
        "This is a fine first sentence with enough words here.\n"
        "short line\n"
        "Enable javascript to view this content properly please.\n"
        "- bullet fragment without punctuation\n"
        "A second proper sentence also ends with punctuation.\n"
        "And here is a third complete sentence for the counter."
    )
    rows = [
        (0, page_good),
        (1, page_good + "\nBuy viagra online today at a great price."),
        (2, page_good.replace("fine first", "lorem ipsum")),
        (3, page_good + "\nfunction f() { return 1; }"),
        (4, "Only one good sentence lives on this page today."),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    kept = tx.c4_filter(df)
    got = {r["doc_id"]: r["text"] for r in kept.collect()}
    assert set(got) == {0}
    cleaned = got[0].split("\n")
    # terminal-punct + >=5-word + no-javascript lines survive, in order
    assert cleaned == [
        "This is a fine first sentence with enough words here.",
        "A second proper sentence also ends with punctuation.",
        "And here is a third complete sentence for the counter.",
    ]
    # keep-flag column form agrees with the filter form
    flags = {r["doc_id"]: r["keep"] for r in df.select(
        "doc_id", tx.c4_page_keep(F.col("text")).alias("keep")).collect()}
    assert flags == {0: True, 1: False, 2: False, 3: False, 4: False}


def test_kn_auto_discount_matches_ney_estimate(spark):
    rows = [(i, "the cat sat on the mat and the dog sat on the rug")
            for i in range(3)] + [
        (10, "one two three four five six"),
        (11, "one two three seven eight nine"),
        (12, "cats chase dogs around green gardens"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    # Ney estimate from trigram counts-of-counts
    from collections import Counter
    tri = Counter()
    for _, t in [(i, t) for i, t in rows]:
        ws = t.split()
        for g in zip(ws, ws[1:], ws[2:]):
            tri[g] += 1
    n1 = sum(1 for c in tri.values() if c == 1)
    n2 = sum(1 for c in tri.values() if c == 2)
    D = n1 / (n1 + 2 * n2)
    auto = {r["doc_id"]: r["cross_entropy"] for r in
            tx.kn_cross_entropy(df, discount="auto").collect()}
    fixed = {r["doc_id"]: r["cross_entropy"] for r in
             tx.kn_cross_entropy(df, discount=D).collect()}
    assert set(auto) == set(fixed)
    for k in auto:
        if auto[k] is None:
            assert fixed[k] is None
        else:
            assert abs(auto[k] - fixed[k]) < 1e-9, k
    # cascade path accepts auto too
    casc = {r["doc_id"]: r["cross_entropy"] for r in
            tx.kn_cross_entropy(df, df, discount="auto").collect()}
    for k in auto:
        if auto[k] is not None:
            assert abs(auto[k] - casc[k]) < 1e-9, k


def test_kn_build_runs_no_job(spark):
    """kn_cross_entropy (incl. discount='auto') must not trigger a job
    at BUILD time — V, W1, n1all and the Ney discount all ride the
    scoring job as broadcast 1-row aggregates."""
    acc = spark.sparkContext.accumulator(0)

    def canary(batches):
        for pdf in batches:
            acc.add(1)
            yield pdf

    base = spark.createDataFrame(
        [(i, "the cat sat on the mat again and again") for i in range(20)],
        "doc_id long, text string",
    )
    src = base.mapInPandas(canary, base.schema)
    out = tx.kn_cross_entropy(src, discount="auto")  # build only
    assert acc.value == 0
    out.count()
    assert acc.value > 0


# ---------------------------------------------------------------------------
# mojibake detect + repair
# ---------------------------------------------------------------------------


def _moji(s: str) -> str:
    """Simulate the corruption: UTF-8 bytes read as WHATWG
    windows-1252 (the 5 undefined bytes pass through as C1 controls,
    exactly what browsers and lenient decoders do)."""
    out = []
    for b in s.encode("utf-8"):
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


def test_mojibake_detect_and_fix(spark):
    from xarray_spatial_spark.functions import text as tx

    clean = [
        "plain ascii only",
        "café résumé naïve",          # real accents must NOT trip repair
        "curly ’quotes’ and — dashes",
        "中文页面内容",                  # cp1252-unencodable -> untouched
        "",
    ]
    cases = [(c, c, 0) for c in clean] + [
        (_moji("café"), "café", None),
        (_moji("it’s — fine… “q”"), "it’s — fine… “q”", None),
        (_moji(_moji("café")), "café", None),   # double mojibake, 2 passes
        (_moji("naïve Ünïcödé"), "naïve Ünïcödé", None),
    ]
    df = spark.createDataFrame([(t,) for t, _, _ in cases], "t string")
    out = df.select(
        "t",
        tx.mojibake_hits(F.col("t")).alias("hits"),
        tx.fix_mojibake(F.col("t")).alias("fixed"),
    ).collect()
    got = {r["t"]: r for r in out}
    for t, want, want_hits in cases:
        r = got[t]
        assert r["fixed"] == want, (t, r["fixed"], want)
        if want_hits is not None:
            assert r["hits"] == want_hits, (t, r["hits"])
        else:
            assert r["hits"] > 0, t


def test_mojibake_hits_sql_twin_matches(spark):
    """The DuckDB mirror counts the same artifacts on the same rows."""
    import duckdb
    from xarray_spatial_spark.functions import text as tx

    texts = [
        "clean", _moji("café"), _moji("it’s — fine"), _moji(_moji("é")),
        "café résumé", "中文", "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    spark_counts = [
        (r["t"], r["h"])
        for r in df.select("t", tx.mojibake_hits(F.col("t")).alias("h"))
        .collect()
    ]
    con = duckdb.connect()
    for t, h in spark_counts:
        (dh,) = con.execute(
            f"SELECT {tx.mojibake_hits_sql('?')}", [t]).fetchone()
        assert dh == h, (t, dh, h)


def test_fix_mojibake_null_and_idempotent(spark):
    from xarray_spatial_spark.functions import text as tx

    df = spark.createDataFrame([(None,), (_moji("café"),)], "t string")
    fixed = df.select(tx.fix_mojibake(F.col("t")).alias("f"))
    rows = {r["f"] for r in fixed.collect()}
    assert rows == {None, "café"}
    # repairing repaired text is a no-op
    twice = fixed.select(tx.fix_mojibake(F.col("f")).alias("g")).collect()
    assert {r["g"] for r in twice} == {None, "café"}


def test_redact_cards_luhn_validation(spark):
    """Luhn-valid card numbers (space/dash/bare separators, Visa 16,
    Amex 15) are replaced; checksum-failing or over-long digit runs
    survive; 'card' in redact_pii kinds runs before the phone rule."""
    from xarray_spatial_spark.functions.text import redact_cards, redact_pii

    rows = [
        (1, "pay 4111 1111 1111 1111 now"),      # valid Visa, spaces
        (2, "pay 4111 1111 1111 1112 now"),      # checksum fails
        (3, "two 4111-1111-1111-1111 and 5500 0000 0000 0004 ok"),
        (4, "amex 378282246310005 yes"),          # valid, 15 bare digits
        (5, "id 1234567890123456789012 long"),    # 22 digits: no match
        (6, "plain text no digits"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["r"] for r in df.select(
        "doc_id", redact_cards(F.col("text")).alias("r")).collect()}
    assert got[1] == "pay <CARD> now"
    assert got[2] == rows[1][1]
    assert got[3] == "two <CARD> and <CARD> ok"
    assert got[4] == "amex <CARD> yes"
    assert got[5] == rows[4][1]
    assert got[6] == rows[5][1]

    # via redact_pii kinds: card redaction wins over the phone pattern
    full = df.filter("doc_id = 1").select(redact_pii(
        F.col("text"), kinds=("email", "ip", "phone", "card")).alias("r")
    ).first()["r"]
    assert full == "pay <CARD> now"
