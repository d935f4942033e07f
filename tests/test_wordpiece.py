"""WordPiece tokenizer (functions/wordpiece.py): incremental trainer
pinned step-for-step against a recount-from-scratch reference, the
PMI-not-frequency objective, BERT greedy longest-match apply, and the
distributed Arrow paths."""

import os

from pyspark.sql import functions as F

from xarray_spatial_spark.functions import wordpiece as wp
from xarray_spatial_spark.functions.bpe import word_histogram
from xarray_spatial_spark.functions.wordpiece import (
    CONT, UNK, _merge_symbol, _word_symbols, load_wordpiece,
    save_wordpiece, segment_word, train_wordpiece, wordpiece_encode,
    wordpiece_encode_ids,
)


def _ref_train(hist_rows, vocab_size, min_pair_count=2):
    """Reference trainer: recomputes every pair and symbol count from
    scratch each round (no incremental deltas), same argmax rule."""
    words, counts = [], []
    for w, n in hist_rows:
        if w:
            words.append(_word_symbols(w))
            counts.append(int(n))
    order, seen = [], set()
    for syms in words:
        for s in syms:
            if s not in seen:
                seen.add(s)
                order.append(s)
    vocab = [UNK] + order
    while len(vocab) < vocab_size:
        pc, sc = {}, {}
        for syms, c in zip(words, counts):
            for s in syms:
                sc[s] = sc.get(s, 0) + c
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + c
        best, bn, bd = None, 0, 0
        for p, n in sorted(pc.items()):
            if n < min_pair_count:
                continue
            d = sc[p[0]] * sc[p[1]]
            if best is None:
                best, bn, bd = p, n, d
                continue
            lhs, rhs = n * bd, bn * d
            if lhs > rhs or (lhs == rhs and (n > bn or
                                             (n == bn and p < best))):
                best, bn, bd = p, n, d
        if best is None:
            break
        a, b = best
        ab = _merge_symbol(a, b)
        vocab.append(ab)
        for i, syms in enumerate(words):
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(ab)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
    return vocab


def test_trainer_matches_recount_reference(spark):
    rows = [("spark", 40), ("spatial", 30), ("sparse", 25),
            ("part", 25), ("spat", 20), ("art", 18), ("rasp", 11),
            ("tilt", 9), ("lilt", 9), ("till", 9)]  # tie-heavy tail
    hist = spark.createDataFrame(rows, "word string, n long")
    got = train_wordpiece(hist, vocab_size=60, min_pair_count=2)
    exp = _ref_train(rows, vocab_size=60, min_pair_count=2)
    assert got == exp
    assert got[0] == UNK and len(got) == len(set(got))


def test_objective_is_pmi_not_frequency(spark):
    """'th' is the most FREQUENT pair but both t and h are everywhere
    (low PMI); 'qz' occurs less but ONLY together (PMI-max).  BPE
    merges th first; WordPiece must merge the exclusive pair first."""
    rows = [("the", 50), ("that", 40), ("tot", 30), ("hat", 30),
            ("qz", 8)]
    hist = spark.createDataFrame(rows, "word string, n long")
    # alphabet is 9 symbols (+[UNK]); 12 leaves room for 2 merges
    vocab = train_wordpiece(hist, vocab_size=12, min_pair_count=2)
    first_merge = vocab[1 + len({s for w, _ in rows
                                 for s in _word_symbols(w)})]
    assert first_merge == "qz"
    from xarray_spatial_spark.functions.bpe import train_bpe
    bpe_first = train_bpe(hist, n_merges=1)[0]
    assert "".join(bpe_first).replace(CONT, "") != "qz"


def test_greedy_longest_match_and_unk():
    vocab = {UNK, "un", "##aff", "##able", "##ab", "a", "b",
             "hello", "hell", "##o"}
    assert segment_word("unaffable", vocab) == ["un", "##aff", "##able"]
    assert segment_word("hello", vocab) == ["hello"]  # longest wins
    # continuation must carry ##: bare 'b' in vocab does NOT cover
    # position 1, so the word is unmatchable
    assert segment_word("ab", vocab) == [UNK]
    # any unmatchable position -> whole word UNK
    assert segment_word("unXaff", vocab) == [UNK]
    assert segment_word("", vocab) == []
    assert segment_word("x" * 200, vocab) == [UNK]  # length guard


def test_distributed_encode_matches_driver(spark):
    docs = spark.createDataFrame(
        [(1, "spark spatial spark"), (2, "sparse part"), (3, None)],
        "doc_id long, text string")
    hist = word_histogram(docs)
    vocab = train_wordpiece(hist, vocab_size=40)
    got = {r["doc_id"]: r["pieces"] for r in
           wordpiece_encode(docs, vocab).collect()}
    vset = set(vocab)
    for did, text in [(1, "spark spatial spark"), (2, "sparse part")]:
        exp = [p for w in text.split() for p in segment_word(w, vset)]
        assert got[did] == exp
    assert got[3] is None


def test_encode_ids_and_detokenize(spark):
    docs = spark.createDataFrame(
        [(1, "spark spark spatial")], "doc_id long, text string")
    vocab = train_wordpiece(word_histogram(docs), vocab_size=30)
    out = wordpiece_encode_ids(wordpiece_encode(docs, vocab), vocab)
    r = out.select(
        "pieces", "ids",
        wp.detokenize(F.col("pieces")).alias("rt"), "text").collect()[0]
    assert r["ids"] == [vocab.index(p) for p in r["pieces"]]
    assert r["rt"] == r["text"]  # vocab covers the corpus it trained on


def test_save_load_roundtrip(tmp_path, spark):
    hist = spark.createDataFrame([("abc", 5), ("abd", 4)],
                                 "word string, n long")
    vocab = train_wordpiece(hist, vocab_size=12)
    p = os.path.join(tmp_path, "wp.json")
    save_wordpiece(vocab, p)
    assert load_wordpiece(p) == vocab
