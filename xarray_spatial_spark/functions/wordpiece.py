"""WordPiece tokenizer — distributed train, vectorized apply.

Completes the production tokenizer triad next to BPE (functions/
bpe.py, merge-count objective) and unigram-LM (functions/unigram.py,
EM): WordPiece is the BERT-family scheme (Schuster & Nakajima 2012;
Wu et al. 2016).  Training is BPE-shaped — iteratively merge the best
adjacent symbol pair over a word histogram — but the selection
objective is the LIKELIHOOD gain of the merge under a unigram model,
score(a,b) = count(ab) / (count(a) * count(b)): merge the pair whose
joint occurrence is most surprising given its parts (pointwise mutual
information), not merely the most frequent one.

Scale boundary is identical to BPE's and is the one sentencepiece /
HF tokenizers draw: ONE distributed word-count aggregation (reused
verbatim from bpe.word_histogram — map-side combined, the only
corpus-scale pass), then a driver merge loop over the collected
histogram with incremental pair/symbol count maintenance, pinned
step-for-step against a recount-from-scratch reference trainer in
tests.  Scores compare as exact rationals (cross-multiplied Python
bigints) — float division would make tie-breaks platform-lore.

Apply is the greedy longest-match-first algorithm BERT ships (NOT the
merge replay BPE uses): each word is consumed left to right, taking
the longest vocab entry at each position, continuation pieces carry
the ``##`` prefix, and a word with any unmatchable position becomes
``[UNK]`` whole — vectorized over Arrow batches with a per-batch word
cache (zipfian reuse), vocab shipped in the UDF closure.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.bpe import word_histogram  # noqa: F401

UNK = "[UNK]"
CONT = "##"


def _word_symbols(word: str) -> list[str]:
    """'hello' -> ['h', '##e', '##l', '##l', '##o'] — the WordPiece
    continuation convention (position 0 plain, rest ##-prefixed)."""
    return [word[0]] + [CONT + ch for ch in word[1:]]


def _merge_symbol(a: str, b: str) -> str:
    """Joint symbol of adjacent (a, b): b's ## marker vanishes into
    the concatenation ('h' + '##e' -> 'he'; '##l' + '##o' -> '##lo')."""
    return a + (b[len(CONT):] if b.startswith(CONT) else b)


def train_wordpiece(
    histogram: DataFrame,
    vocab_size: int = 1000,
    min_pair_count: int = 2,
) -> list[str]:
    """Learn a WordPiece vocabulary from a (word, n) histogram.

    Returns the vocab as a list: ``[UNK]``, then the alphabet pieces
    in first-seen frequency order, then merged pieces in merge order
    (so the list is also the training transcript).  Each round picks
    argmax count(ab) / (count(a)*count(b)) over adjacent pairs, with
    exact-rational comparison and deterministic ties (higher pair
    count, then lexicographically smallest pair); stops when the
    vocab reaches ``vocab_size`` or no pair has ``min_pair_count``
    occurrences.  Driver loop with the same incremental delta updates
    as bpe.train_bpe, plus per-SYMBOL counts (the denominator) folded
    into every retouch."""
    rows = histogram.collect()
    words: list[list[str]] = []
    counts: list[int] = []
    for r in rows:
        w, n = r[0], int(r[1])
        if not w:
            continue
        words.append(_word_symbols(w))
        counts.append(n)

    pair_counts: dict[tuple[str, str], int] = {}
    sym_counts: dict[str, int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    alphabet: list[str] = []
    for i, syms in enumerate(words):
        c = counts[i]
        for s in syms:
            if s not in sym_counts:
                alphabet.append(s)
            sym_counts[s] = sym_counts.get(s, 0) + c
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            where.setdefault(p, set()).add(i)

    vocab = [UNK] + alphabet
    while len(vocab) < vocab_size and pair_counts:
        # exact-rational argmax of n_ab / (n_a * n_b):
        # best if n * d_best > n_best * d  (bigints, never floats)
        best = None
        best_n = best_d = 0
        for p, n in pair_counts.items():
            if n < min_pair_count:
                continue
            d = sym_counts[p[0]] * sym_counts[p[1]]
            if best is None:
                best, best_n, best_d = p, n, d
                continue
            lhs, rhs = n * best_d, best_n * d
            if lhs > rhs or (lhs == rhs and (n > best_n or
                                             (n == best_n and p < best))):
                best, best_n, best_d = p, n, d
        if best is None:
            break
        a, b = best
        ab = _merge_symbol(a, b)
        vocab.append(ab)
        for i in list(where.get(best, ())):
            syms, c = words[i], counts[i]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = where.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        del where[p]
            for s in syms:
                sym_counts[s] -= c
            out = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(ab)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            for s in out:
                sym_counts[s] = sym_counts.get(s, 0) + c
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                where.setdefault(p, set()).add(i)
        # symbols that no longer occur anywhere must not keep a stale
        # denominator (and a zero denominator must not divide)
        for s in (a, b):
            if sym_counts.get(s, 0) <= 0:
                sym_counts.pop(s, None)
    return vocab


def segment_word(word: str, vocab: set[str],
                 max_word_len: int = 100) -> list[str]:
    """BERT's greedy longest-match-first: consume the word left to
    right taking the longest vocab piece at each position (pieces
    after position 0 carry ##); any unmatchable position makes the
    WHOLE word ``[UNK]`` (the reference behavior — partial pieces of
    an unknown word would corrupt downstream counts)."""
    if not word:
        return []
    if len(word) > max_word_len:
        return [UNK]
    out: list[str] = []
    start = 0
    while start < len(word):
        end = len(word)
        piece = None
        while end > start:
            sub = word[start:end]
            if start > 0:
                sub = CONT + sub
            if sub in vocab:
                piece = sub
                break
            end -= 1
        if piece is None:
            return [UNK]
        out.append(piece)
        start = end
    return out


def wordpiece_segmenter(vocab: list[str], lowercase: bool = False):
    """texts -> array<string> of pieces, as a vectorized Arrow UDF
    with a per-batch word cache (zipfian word reuse: each distinct
    word in a batch is segmented once)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    vset = set(vocab)

    @pandas_udf("array<string>")
    def _seg(texts):
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            if lowercase:
                t = t.lower()
            toks: list[str] = []
            for w in t.split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = segment_word(w, vset)
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return _seg


def wordpiece_encode(df: DataFrame, vocab: list[str],
                     text_col: str = "text", out_col: str = "pieces",
                     lowercase: bool = False) -> DataFrame:
    """Add ``out_col`` with each row's WordPiece segmentation —
    scan-stage Arrow pass, no shuffle."""
    seg = wordpiece_segmenter(vocab, lowercase=lowercase)
    return df.withColumn(out_col, seg(F.col(text_col)))


def wordpiece_encode_ids(df: DataFrame, vocab: list[str],
                         text_col: str = "text", out_col: str = "ids",
                         lowercase: bool = False) -> DataFrame:
    """Pieces -> int32 ids by vocab position (``[UNK]`` = 0 by
    construction of :func:`train_wordpiece`'s layout)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    vset = set(vocab)
    ids = {p: i for i, p in enumerate(vocab)}

    @pandas_udf("array<int>")
    def _ids(texts):
        cache: dict[str, list[int]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            if lowercase:
                t = t.lower()
            row: list[int] = []
            for w in t.split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = [ids[p]
                                      for p in segment_word(w, vset)]
                row.extend(got)
            out.append(row)
        return pd.Series(out)

    return df.withColumn(out_col, _ids(F.col(text_col)))


def detokenize(pieces: Column) -> Column:
    """Pieces -> text: drop ## joins, space between words — the
    round-trip inverse for vocab-covered text (pure Catalyst)."""
    joined = F.array_join(pieces, " ")
    return F.replace(joined, F.lit(" " + CONT), F.lit(""))


def save_wordpiece(vocab: list[str], path: str) -> None:
    """Training-job -> tokenizer-worker artifact (deterministic JSON,
    same contract as bpe.save_bpe/unigram save)."""
    with open(path, "w", encoding="utf-8") as f:
        json.dump({"format": "wordpiece-v1", "vocab": vocab}, f,
                  ensure_ascii=False, sort_keys=True)


def load_wordpiece(path: str) -> list[str]:
    with open(path, encoding="utf-8") as f:
        d = json.load(f)
    if d.get("format") != "wordpiece-v1":
        raise ValueError(f"not a wordpiece artifact: {path}")
    return list(d["vocab"])
