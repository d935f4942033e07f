"""Unigram-LM tokenizer (functions/unigram.py), pinned step-for-step
against an INDEPENDENT pure-python reference trainer (recomputes seed
counts, EM expectations and prune losses from scratch, dict-based, no
shared lattice code beyond the module under test's public API being
the thing compared), the same strategy that pinned the BPE trainer.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.functions import unigram as U
from xarray_spatial_spark.functions.bpe import word_histogram

CORPUS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a cat and a rat and a bat",
    "the rat sat on a cat",
    "mats and rats and bats and cats",
    "the bat and the rat sat",
]


# ---------------------------------------------------------------------------
# reference implementation (independent: plain dicts, quadratic scans)
# ---------------------------------------------------------------------------


def ref_histogram(corpus):
    h = {}
    for line in corpus:
        for w in line.split():
            h[w] = h.get(w, 0) + 1
    return h


def ref_seed(hist, seed_size, max_len):
    acc = {}
    for w, n in hist.items():
        for a in range(len(w)):
            for b in range(a + 1, min(a + max_len, len(w)) + 1):
                acc[w[a:b]] = acc.get(w[a:b], 0) + n
    singles = {p: c for p, c in acc.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in acc.items() if len(p) > 1),
        key=lambda kv: (-kv[1] * len(kv[0]), kv[0]),
    )[:seed_size]
    return {**singles, **dict(multis)}


def ref_forward_backward(word, logp, max_len):
    n = len(word)
    alpha = [-math.inf] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        vals = []
        for l in range(1, min(max_len, i) + 1):
            lp = logp.get(word[i - l: i])
            if lp is not None:
                vals.append(alpha[i - l] + lp)
        if vals:
            m = max(vals)
            alpha[i] = m + math.log(sum(math.exp(v - m) for v in vals))
    beta = [-math.inf] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        vals = []
        for l in range(1, min(max_len, n - i) + 1):
            lp = logp.get(word[i: i + l])
            if lp is not None:
                vals.append(lp + beta[i + l])
        if vals:
            m = max(vals)
            beta[i] = m + math.log(sum(math.exp(v - m) for v in vals))
    exp = {}
    for i in range(n):
        for l in range(1, min(max_len, n - i) + 1):
            p = word[i: i + l]
            lp = logp.get(p)
            if lp is not None:
                exp[p] = exp.get(p, 0.0) + math.exp(
                    alpha[i] + lp + beta[i + l] - alpha[n]
                )
    return exp, alpha[n]


def ref_em_iter(hist, logp, max_len):
    ecounts = {}
    for w, n in hist.items():
        exp, _ = ref_forward_backward(w, logp, max_len)
        for p, c in exp.items():
            ecounts[p] = ecounts.get(p, 0.0) + n * c
    total = sum(ecounts.values())
    floor = math.log(1e-12)
    return (
        {
            p: (math.log(ecounts[p] / total) if ecounts.get(p, 0.0) > 0 else floor)
            for p in logp
        },
        ecounts,
    )


def ref_viterbi(word, logp, max_len):
    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [None] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for l in range(1, min(max_len, i) + 1):
            p = word[i - l: i]
            lp = logp.get(p)
            if lp is None:
                lp = -1e3 if l == 1 else None
            if lp is None:
                continue
            if best[i - l] + lp > best[i]:
                best[i] = best[i - l] + lp
                back[i] = (i - l, p)
    out = []
    i = n
    while i:
        j, p = back[i]
        out.append(p)
        i = j
    return out[::-1], best[n]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                                 "doc_id: long, text: string")


def test_seed_matches_reference(spark, docs):
    hist = word_histogram(docs)
    seed = U._seed_vocab(hist, seed_size=40, max_piece_len=5)
    want = ref_seed(ref_histogram(CORPUS), 40, 5)
    assert seed == want


def test_estep_matches_reference(spark, docs):
    hist = word_histogram(docs)
    rhist = ref_histogram(CORPUS)
    seed = ref_seed(rhist, 40, 5)
    total = sum(seed.values())
    logp = {p: math.log(c / total) for p, c in seed.items()}
    for _ in range(3):  # three EM steps, each compared exactly
        ecounts, ll = U._estep(hist, logp, 5)
        want_logp, want_ec = ref_em_iter(rhist, logp, 5)
        want_ll = sum(
            n * ref_forward_backward(w, logp, 5)[1] for w, n in rhist.items()
        )
        assert set(ecounts) == set(want_ec)
        for p in ecounts:
            assert ecounts[p] == pytest.approx(want_ec[p], rel=1e-9)
        assert ll == pytest.approx(want_ll, rel=1e-9)
        logp = U._mstep(logp, ecounts)
        for p in logp:
            assert logp[p] == pytest.approx(want_logp[p], rel=1e-9)


def test_full_training_matches_reference(spark, docs):
    hist = word_histogram(docs)
    got = U.train_unigram(hist, vocab_size=30, seed_size=40,
                          max_piece_len=5, em_iters=2, shrink=0.7)
    # reference run of the same protocol
    rhist = ref_histogram(CORPUS)
    seed = ref_seed(rhist, 40, 5)
    total = sum(seed.values())
    logp = {p: math.log(c / total) for p, c in seed.items()}
    while True:
        ec = {}
        for _ in range(2):
            logp, ec = ref_em_iter(rhist, logp, 5)
        if len(logp) <= 30:
            break
        keep = max(30, int(len(logp) * 0.7))
        singles = {p for p in logp if len(p) == 1}
        losses = []
        for p in [q for q in logp if len(q) > 1]:
            rest = dict(logp)
            del rest[p]
            _, alt = ref_viterbi(p, rest, 5)
            losses.append((round(ec.get(p, 0.0) * (logp[p] - alt), 9), p))
        losses.sort(key=lambda t: (-t[0], t[1]))
        kept = [p for _, p in losses[: max(keep - len(singles), 0)]]
        logp = {p: logp[p] for p in list(singles) + kept}
        if len(logp) <= 30:
            logp, ec = ref_em_iter(rhist, logp, 5)
            break
    assert set(got) == set(logp)
    for p in got:
        assert got[p] == pytest.approx(logp[p], rel=1e-9)
    # singles survived, vocab target met
    assert len(got) <= max(30, sum(1 for p in got if len(p) == 1))
    assert all(c in got for c in set("".join(ref_histogram(CORPUS))))


def test_viterbi_is_max_likelihood_bruteforce():
    """Viterbi score equals the best over ALL enumerated segmentations."""
    logp = {"a": -2.0, "b": -2.5, "ab": -3.0, "ba": -3.2, "aba": -4.0,
            "bab": -6.0}

    def all_segs(w):
        if not w:
            yield []
            return
        for l in range(1, len(w) + 1):
            if w[:l] in logp:
                for rest in all_segs(w[l:]):
                    yield [w[:l]] + rest

    for w in ("ababab", "aabba", "abababa", "bbb"):
        pieces, score = U.viterbi_segment(w, logp, 8)
        assert "".join(pieces) == w
        best = max(
            (sum(logp[p] for p in seg) for seg in all_segs(w)),
            default=None,
        )
        if best is not None:
            assert score == pytest.approx(best)
            assert sum(logp[p] for p in pieces) == pytest.approx(best)


def test_encode_roundtrip_and_ids(spark, docs):
    hist = word_histogram(docs)
    logp = U.train_unigram(hist, vocab_size=30, seed_size=40,
                           max_piece_len=5, em_iters=1, shrink=0.7)
    enc = U.unigram_encode(docs, logp, max_piece_len=5).orderBy("doc_id")
    rows = enc.collect()
    for r, text in zip(rows, CORPUS):
        # detokenize invariant: pieces concatenate back to the words
        assert "".join(r["pieces"]) == text.replace(" ", "")
    vocab = U.unigram_vocab(logp)
    ids = U.unigram_encode_ids(docs, logp, vocab, max_piece_len=5).orderBy(
        "doc_id").collect()
    inv = {v: k for k, v in vocab.items()}
    for rp, ri in zip(rows, ids):
        assert [inv[i] for i in ri["ids"]] == rp["pieces"]
    # unknown characters hit <unk> at id time, segment as themselves
    odd = spark.createDataFrame([(0, "cat zqx")], "doc_id: long, text: string")
    out = U.unigram_encode_ids(odd, logp, vocab, max_piece_len=5).collect()[0]
    assert vocab["<unk>"] in out["ids"]
    n = U.unigram_token_count(odd, logp, max_piece_len=5).collect()[0]
    assert n["n_tokens"] == len(out["ids"])


def test_train_validates_shrink(spark, docs):
    with pytest.raises(ValueError):
        U.train_unigram(word_histogram(docs), shrink=1.5)


def test_tokenizer_persistence_roundtrip(spark, docs, tmp_path):
    """Saved models reload to identical segmentations — the artifact
    contract between the training job and tokenizer workers."""
    from xarray_spatial_spark.functions.bpe import (
        bpe_encode, load_bpe, save_bpe, train_bpe)

    hist = word_histogram(docs)
    logp = U.train_unigram(hist, vocab_size=30, seed_size=40,
                           max_piece_len=5, em_iters=1, shrink=0.7)
    p1 = str(tmp_path / "uni.json")
    U.save_unigram(logp, p1)
    back = U.load_unigram(p1)
    assert back == logp
    a = U.unigram_encode(docs, logp, max_piece_len=5).orderBy("doc_id").collect()
    b = U.unigram_encode(docs, back, max_piece_len=5).orderBy("doc_id").collect()
    assert [r["pieces"] for r in a] == [r["pieces"] for r in b]

    merges = train_bpe(hist, n_merges=50)
    p2 = str(tmp_path / "bpe.json")
    save_bpe(merges, p2)
    merges2 = load_bpe(p2)
    assert merges2 == merges
    x = bpe_encode(docs, merges).orderBy("doc_id").collect()
    y = bpe_encode(docs, merges2).orderBy("doc_id").collect()
    assert [r["bpe_tokens"] for r in x] == [r["bpe_tokens"] for r in y]
    with pytest.raises(ValueError):
        U.load_unigram(p2)
