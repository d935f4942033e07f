"""Unigram-LM tokenizer (SentencePiece-style) — distributed EM train,
vectorized Viterbi apply.

Algorithm per Kudo 2018 (ACL, "Subword Regularization") — the second
of the two production tokenizer families (functions/bpe.py is the
other):

1. seed a large candidate vocabulary from frequent substrings (scored
   count x length, all single characters always kept),
2. EM over the unigram language model: the E-step computes expected
   piece counts with forward-backward over each word's segmentation
   lattice, the M-step renormalizes,
3. prune rounds: drop the pieces whose removal costs the least
   likelihood (each piece's occurrences re-segmented by the remaining
   vocabulary — Viterbi over the piece string itself), shrinking
   toward ``vocab_size``,
4. encode by Viterbi (max-likelihood) segmentation.

Scale shape: the corpus-scale work is ONE word-histogram aggregation
(shared with BPE, functions/bpe.py:word_histogram).  Unlike BPE's
inherently sequential merge loop, the unigram E-step is perfectly
parallel over distinct words, so EVERY EM iteration runs as one Spark
job over the persisted histogram (bounded by Heaps' law, not corpus
size) with the piece table broadcast in the UDF closure; only the
M-step renormalization and the prune ranking — vocabulary-sized work —
run on the driver.  At 100 TB nothing per-token ever reaches the
driver.

Differences from the sentencepiece binary, documented not hidden: ML
EM (no implicit-Dirichlet digamma smoothing), no subword
regularization sampling at encode time (Viterbi only), and whitespace
pre-tokenization identical to the rest of this repo (bpe.word_histogram)
instead of sentencepiece's raw-sentence mode.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LL = "\x00<ll>"  # sentinel row carrying the corpus log-likelihood


# ---------------------------------------------------------------------------
# lattice maths (plain python — runs inside executors over histogram rows)
# ---------------------------------------------------------------------------


def _logsumexp(vals):
    m = max(vals)
    if m == -math.inf:
        return m
    return m + math.log(sum(math.exp(v - m) for v in vals))


def _word_expectations(word: str, logp: dict[str, float], max_len: int):
    """Forward-backward over the segmentation lattice: returns
    ({piece: expected count}, word log-likelihood).  Unsegmentable
    words (a character missing from the vocabulary) contribute
    nothing and are reported as None."""
    n = len(word)
    edges = []  # (start, end, piece, lp)
    for i in range(1, n + 1):
        for l in range(1, min(max_len, i) + 1):
            piece = word[i - l: i]
            lp = logp.get(piece)
            if lp is not None:
                edges.append((i - l, i, piece, lp))
    alpha = [-math.inf] * (n + 1)
    alpha[0] = 0.0
    by_end: list[list] = [[] for _ in range(n + 1)]
    by_start: list[list] = [[] for _ in range(n + 1)]
    for e in edges:
        by_end[e[1]].append(e)
        by_start[e[0]].append(e)
    for i in range(1, n + 1):
        alpha[i] = _logsumexp([alpha[j] + lp for j, _, _, lp in by_end[i]] or [-math.inf])
    if alpha[n] == -math.inf:
        return None, None
    beta = [-math.inf] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        beta[i] = _logsumexp([lp + beta[k] for _, k, _, lp in by_start[i]] or [-math.inf])
    out: dict[str, float] = {}
    z = alpha[n]
    for j, k, piece, lp in edges:
        c = math.exp(alpha[j] + lp + beta[k] - z)
        out[piece] = out.get(piece, 0.0) + c
    return out, z


def viterbi_segment(word: str, logp: dict[str, float], max_len: int):
    """Max-likelihood segmentation; characters missing from the
    vocabulary surface as themselves (the <unk> convention is applied
    at id-encoding time).  Returns (pieces, score)."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back: list = [None] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for l in range(1, min(max_len, i) + 1):
            piece = word[i - l: i]
            lp = logp.get(piece)
            if lp is None:
                if l == 1:  # unknown char: traverse with a floor score
                    lp = -1e3
                else:
                    continue
            s = best[i - l] + lp
            if s > best[i]:
                best[i] = s
                back[i] = (i - l, piece)
    pieces = []
    i = n
    while i > 0:
        j, piece = back[i]
        pieces.append(piece)
        i = j
    pieces.reverse()
    return pieces, best[n]


# ---------------------------------------------------------------------------
# distributed training
# ---------------------------------------------------------------------------


def _seed_vocab(histogram: DataFrame, seed_size: int, max_piece_len: int):
    """One Spark job: substring candidate counts over the histogram.
    Returns {piece: count} with the top ``seed_size`` substrings by
    count x length (ties lexical) plus ALL single characters."""

    def _subs(batches):
        for pdf in batches:
            acc: dict[str, int] = {}
            for word, n in zip(pdf["word"], pdf["n"]):
                n = int(n)
                L = len(word)
                for a in range(L):
                    for b in range(a + 1, min(a + max_piece_len, L) + 1):
                        p = word[a:b]
                        acc[p] = acc.get(p, 0) + n
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "cnt": list(acc.values())}
            )

    counts = (
        histogram.mapInPandas(_subs, "piece string, cnt long")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("score", F.col("cnt") * F.length("piece"))
    )
    singles = counts.filter(F.length("piece") == 1)
    multis = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.col("score").desc(), F.col("piece").asc())
        .limit(seed_size)
    )
    rows = singles.unionByName(multis).select("piece", "cnt").collect()
    return {r["piece"]: int(r["cnt"]) for r in rows}


def _estep(histogram: DataFrame, logp: dict[str, float], max_len: int):
    """One Spark job: expected piece counts + total log-likelihood."""

    def _fn(batches):
        for pdf in batches:
            acc: dict[str, float] = {}
            ll = 0.0
            for word, n in zip(pdf["word"], pdf["n"]):
                contribs, word_ll = _word_expectations(word, logp, max_len)
                if contribs is None:
                    continue
                n = int(n)
                ll += n * word_ll
                for p, c in contribs.items():
                    acc[p] = acc.get(p, 0.0) + n * c
            acc[_LL] = acc.get(_LL, 0.0) + ll
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "ecount": list(acc.values())}
            )

    rows = (
        histogram.mapInPandas(_fn, "piece string, ecount double")
        .groupBy("piece")
        .agg(F.sum("ecount").alias("ecount"))
        .collect()
    )
    ecounts = {r["piece"]: r["ecount"] for r in rows}
    ll = ecounts.pop(_LL, 0.0)
    return ecounts, ll


def _mstep(pieces: dict[str, float], ecounts: dict[str, float]):
    """Renormalize; pieces with zero expectation keep a floor so they
    stay prunable rather than -inf (matches an additive epsilon)."""
    total = sum(ecounts.values())
    floor = math.log(1e-12)
    return {
        p: (math.log(ecounts[p] / total) if ecounts.get(p, 0.0) > 0 else floor)
        for p in pieces
    }


def _prune(logp: dict[str, float], ecounts: dict[str, float],
           keep: int, max_len: int):
    """Drop the multi-char pieces whose removal costs the least
    likelihood: loss = ecount x (logp(piece) - best alternative
    segmentation of the piece by the REST of the vocabulary).  Single
    characters are never pruned (they guarantee segmentability)."""
    singles = {p for p in logp if len(p) == 1}
    multis = [p for p in logp if len(p) > 1]
    losses = []
    for p in multis:
        lp = logp[p]
        rest = dict(logp)
        del rest[p]
        _, alt = viterbi_segment(p, rest, max_len)
        loss = ecounts.get(p, 0.0) * (lp - alt)
        losses.append((round(loss, 9), p))
    losses.sort(key=lambda t: (-t[0], t[1]))
    keep_multis = [p for _, p in losses[: max(keep - len(singles), 0)]]
    return {p: logp[p] for p in list(singles) + keep_multis}


def train_unigram(
    histogram: DataFrame,
    vocab_size: int = 8000,
    seed_size: int = 20000,
    max_piece_len: int = 8,
    em_iters: int = 2,
    shrink: float = 0.75,
) -> dict[str, float]:
    """Train over a (word, n) histogram (bpe.word_histogram).  Returns
    {piece: log probability}.  Job count: 1 seed + em_iters x rounds
    E-steps, every one a histogram-scale mapInPandas + hash agg."""
    if not 0 < shrink < 1:
        raise ValueError("shrink must be in (0, 1)")
    hist = histogram.persist()
    try:
        seed = _seed_vocab(hist, seed_size, max_piece_len)
        total = sum(seed.values())
        logp = {p: math.log(c / total) for p, c in seed.items()}
        while True:
            ecounts = {}
            for _ in range(em_iters):
                ecounts, _ll = _estep(hist, logp, max_piece_len)
                logp = _mstep(logp, ecounts)
            if len(logp) <= vocab_size:
                break
            keep = max(vocab_size, int(len(logp) * shrink))
            logp = _prune(logp, ecounts, keep, max_piece_len)
            if len(logp) <= vocab_size:
                # one final EM over the pruned vocabulary
                ecounts, _ll = _estep(hist, logp, max_piece_len)
                logp = _mstep(logp, ecounts)
                break
    finally:
        hist.unpersist()
    return logp


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def unigram_vocab(logp: dict[str, float], specials=("<unk>",)) -> dict[str, int]:
    """piece -> id table: specials first, then pieces by descending
    log-probability (ties lexical) — the frequent-is-small layout."""
    ordered = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    out = {s: i for i, s in enumerate(specials)}
    for i, (p, _) in enumerate(ordered):
        out[p] = i + len(specials)
    return out


def unigram_encode(
    df: DataFrame,
    logp: dict[str, float],
    text_col: str = "text",
    out_col: str = "pieces",
    max_piece_len: int = 8,
    lowercase: bool = False,
) -> DataFrame:
    """Viterbi segmentation as a vectorized Arrow UDF with a per-batch
    word cache (zipfian words: each distinct word segments once per
    batch).  The piece table ships in the UDF closure."""

    @F.pandas_udf("array<string>")
    def _seg(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            t = (t or "")
            if lowercase:
                t = t.lower()
            toks: list[str] = []
            for w in t.split():
                got = cache.get(w)
                if got is None:
                    got, _ = viterbi_segment(w, logp, max_piece_len)
                    cache[w] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, _seg(F.coalesce(F.col(text_col), F.lit(""))))


def unigram_encode_ids(
    df: DataFrame,
    logp: dict[str, float],
    vocab: dict[str, int],
    text_col: str = "text",
    out_col: str = "ids",
    max_piece_len: int = 8,
    lowercase: bool = False,
    unk: str = "<unk>",
) -> DataFrame:
    """Piece ids under ``vocab`` (unigram_vocab); pieces outside the
    table (unknown characters) map to the <unk> id."""
    unk_id = vocab[unk]

    @F.pandas_udf("array<int>")
    def _ids(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[int]] = {}
        out = []
        for t in texts:
            t = (t or "")
            if lowercase:
                t = t.lower()
            ids: list[int] = []
            for w in t.split():
                got = cache.get(w)
                if got is None:
                    pieces, _ = viterbi_segment(w, logp, max_piece_len)
                    got = [vocab.get(p, unk_id) for p in pieces]
                    cache[w] = got
                ids.extend(got)
            out.append(ids)
        return pd.Series(out)

    return df.withColumn(out_col, _ids(F.coalesce(F.col(text_col), F.lit(""))))


def unigram_token_count(
    df: DataFrame,
    logp: dict[str, float],
    text_col: str = "text",
    out_col: str = "n_tokens",
    max_piece_len: int = 8,
) -> DataFrame:
    enc = unigram_encode(df, logp, text_col, "__pieces", max_piece_len)
    return enc.withColumn(out_col, F.size("__pieces")).drop("__pieces")


def save_unigram(logp: dict[str, float], path: str) -> None:
    """Persist the piece table as deterministic JSON (sorted keys) —
    the artifact a training job ships to its tokenizer workers."""
    import json
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"type": "unigram", "pieces": dict(sorted(logp.items()))},
                  f, ensure_ascii=False, sort_keys=True)


def load_unigram(path: str) -> dict[str, float]:
    import json

    with open(path) as f:
        d = json.load(f)
    if d.get("type") != "unigram":
        raise ValueError(f"not a unigram model file: {path}")
    return {str(k): float(v) for k, v in d["pieces"].items()}
