"""BPE tokenizer: distributed train + vectorized apply (functions/bpe.py)."""

from pyspark.sql import functions as F

from xarray_spatial_spark.functions.bpe import (
    EOW,
    bpe_encode,
    bpe_token_count,
    detokenize,
    segment_word,
    train_bpe,
    word_histogram,
)


def _naive_train(word_counts, n_merges, min_pair_count=2):
    """Independent reference: recount every pair from scratch each
    round (no incremental updates) — validates train_bpe's
    delta-maintenance against the textbook definition."""
    words = {tuple(list(w) + [EOW]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, c in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        a, b = best
        nxt = {}
        for syms, c in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        words = nxt
    return merges


CORPUS = ("low low low low low lower lower newest newest newest "
          "newest newest newest widest widest widest happier happily")


def test_word_histogram(spark):
    df = spark.createDataFrame([(CORPUS,), ("low  widest\nlow",), (None,)],
                               "text string")
    got = {r["word"]: r["n"] for r in word_histogram(df).collect()}
    assert got["low"] == 7 and got["newest"] == 6 and got["widest"] == 4
    # cap keeps most frequent first
    top = word_histogram(df, max_words=2).collect()
    assert [r["word"] for r in top] == ["low", "newest"]


def test_train_matches_naive_reference(spark):
    df = spark.createDataFrame([(CORPUS,)], "text string")
    hist = word_histogram(df)
    got = train_bpe(hist, n_merges=30)
    wc = {r["word"]: r["n"] for r in hist.collect()}
    assert got == _naive_train(wc, 30)
    # sennrich's canonical first merges on this corpus shape
    assert ("e", "s") in got[:4] and ("es", "t") in got[:5]


def test_train_matches_naive_on_varied_corpus(spark):
    # deterministic pseudo-random words: many tie situations
    rows = [(" ".join(f"w{(i * 7 + j) % 23:x}{(i + j) % 5}"
                      for j in range(12)),) for i in range(40)]
    df = spark.createDataFrame(rows, "text string")
    hist = word_histogram(df)
    wc = {r["word"]: r["n"] for r in hist.collect()}
    assert train_bpe(hist, n_merges=60) == _naive_train(wc, 60)


def test_segment_matches_training(spark):
    """A word seen in training segments exactly as training left it."""
    df = spark.createDataFrame([(CORPUS,)], "text string")
    merges = train_bpe(word_histogram(df), n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    # replay training's merge result for 'newest' by hand
    syms = list("newest") + [EOW]
    for a, b in merges:
        out, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    assert segment_word("newest", ranks) == syms


def test_encode_roundtrip_and_count(spark):
    df = spark.createDataFrame(
        [(0, CORPUS), (1, "unseen bizarreword low"), (2, ""), (3, None)],
        "doc_id long, text string")
    merges = train_bpe(word_histogram(df.filter("doc_id = 0")), n_merges=25)
    enc = bpe_encode(df, merges)
    out = {r["doc_id"]: r for r in enc.select(
        "doc_id", "bpe_tokens",
        detokenize(F.col("bpe_tokens")).alias("rt")).collect()}
    # round trip: detokenize == whitespace-normalized original
    assert out[0]["rt"] == " ".join(CORPUS.split())
    assert out[1]["rt"] == "unseen bizarreword low"
    # frequent trained word is one token; unseen word falls apart
    assert "low" + EOW in out[0]["bpe_tokens"]
    assert len([t for t in out[1]["bpe_tokens"] if "bizarre" in t]) == 0
    assert out[2]["bpe_tokens"] == [] and out[3]["bpe_tokens"] is None
    cnt = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_token_count(df, merges).collect()}
    assert cnt[0] == len(out[0]["bpe_tokens"])
    assert cnt[2] == 0


def test_distributed_apply_consistent(spark):
    """Same text in different partitions segments identically."""
    df = spark.createDataFrame(
        [(i, CORPUS) for i in range(64)], "doc_id long, text string"
    ).repartition(16)
    merges = train_bpe(word_histogram(df), n_merges=20)
    got = bpe_encode(df, merges).select(
        F.array_join("bpe_tokens", " ").alias("s")).distinct().collect()
    assert len(got) == 1


def test_vocab_and_ids(spark):
    from xarray_spatial_spark.functions.bpe import (bpe_encode_ids,
                                                    build_vocab)

    df = spark.createDataFrame([(CORPUS,)], "text string")
    hist = word_histogram(df)
    merges = train_bpe(hist, n_merges=15)
    vocab = build_vocab(hist, merges)
    # layout: 4 specials, sorted alphabet, EOW, merges in order
    assert vocab["<unk>"] == 0 and vocab["<pad>"] == 1
    alphabet = sorted(set("".join(CORPUS.split())))
    assert [k for k, v in sorted(vocab.items(), key=lambda kv: kv[1])][
        4:4 + len(alphabet)] == alphabet
    assert len(vocab) == 4 + len(alphabet) + 1 + len(merges)
    # ids invert back to the segmentation; unseen char -> <unk>
    enc = bpe_encode_ids(
        spark.createDataFrame([(0, "low newest"), (1, "lowZ")],
                              "doc_id long, text string"),
        merges, vocab)
    inv = {v: k for k, v in vocab.items()}
    rows = {r["doc_id"]: r["token_ids"] for r in enc.collect()}
    toks = [inv[i] for i in rows[0]]
    assert "".join(toks).replace(EOW, " ").strip() == "low newest"
    assert 0 in rows[1]  # 'Z' never seen in training
