"""Byte-pair-encoding tokenizer — distributed train, vectorized apply.

Training follows Sennrich et al. 2016 (ACL, "Neural Machine
Translation of Rare Words with Subword Units") over a WORD HISTOGRAM,
the way production tokenizer trainers do: the corpus-scale work is
ONE distributed word-count aggregation (map-side combined — at 100 TB
this is the only pass over the data, and it is the same shape as any
groupBy-count), while the merge loop runs over the collected
histogram, whose row count is bounded by vocabulary growth (Heaps'
law — millions of distinct words, not trillions of tokens) and capped
by ``max_words``.  The merge loop itself is inherently sequential
(merge *i* depends on merge *i-1*), so distributing it would add a
shuffle per merge for no parallelism; the histogram collect is the
correct scale boundary, and is exactly where sentencepiece/GPT-2
training draws it.

Apply is a vectorized Arrow UDF with a per-batch word cache: word
frequencies are zipfian, so a few thousand cache entries cover almost
every token of a batch, and each distinct word is segmented once.
Merges ship to executors inside the UDF closure (broadcast by Spark's
task serialization — the table is a few hundred kB at vocab 32k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# end-of-word marker, a separate trailing symbol (Sennrich-style) so
# merges can distinguish word-final from word-internal contexts
EOW = "</w>"


def word_histogram(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = False,
    max_words: int = 1_000_000,
) -> DataFrame:
    """(word, n) frequency table — the one corpus-scale pass of BPE
    training.  Whitespace tokenization (matching functions.text.
    tokens); ``max_words`` keeps the most frequent words (ties broken
    lexically) so the driver collect is bounded: at web scale the
    long tail of hapax words contributes almost nothing to merge
    counts but dominates distinct-word cardinality."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    if lowercase:
        t = F.lower(t)
    words = df.select(
        F.explode(F.split(F.trim(t), "\\s+")).alias("word")
    ).filter(F.col("word") != "")
    hist = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    # TakeOrderedAndProject: partial top-k per partition, no full sort
    return hist.orderBy(F.col("n").desc(), F.col("word").asc()).limit(
        max_words)


def train_bpe(
    histogram: DataFrame,
    n_merges: int = 1000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, n) histogram.

    Driver-side merge loop with incremental pair-count maintenance
    (only words CONTAINING the merged pair are retouched each round —
    the textbook delta-update that makes training O(merges * affected)
    instead of O(merges * vocabulary)).  Ties break on the
    lexicographically smallest pair so training is deterministic
    across runs and partitionings.  Stops early when no pair reaches
    ``min_pair_count``."""
    rows = histogram.collect()
    words: list[list[str]] = []
    counts: list[int] = []
    for r in rows:
        w, n = r[0], int(r[1])
        words.append(list(w) + [EOW])
        counts.append(n)

    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        c = counts[i]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            where.setdefault((a, b), set()).add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best = max(pair_counts.items(), key=lambda kv: (kv[1], _inv(kv[0])))
        pair, cnt = best
        if cnt < min_pair_count:
            break
        merges.append(pair)
        a, b = pair
        ab = a + b
        for i in list(where.get(pair, ())):
            syms, c = words[i], counts[i]
            # remove this word's old pair contributions
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = where.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        del where[p]
            # merge every occurrence of (a, b) in the word
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
            # add the new contributions back
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                where.setdefault(p, set()).add(i)
    return merges


class _Inv:
    """Reverses comparison so max() prefers the lexically SMALLEST
    pair among equal counts."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return self.v > other.v

    def __eq__(self, other):
        return self.v == other.v


def _inv(pair):
    return _Inv(pair)


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merging of one word — the canonical
    BPE inference (identical to training order, so a word seen in
    training segments exactly as training left it)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_j = None, -1
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        syms[best_j:best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    return syms


def bpe_segmenter(merges: list[tuple[str, str]], lowercase: bool = False):
    """array<string>-returning vectorized UDF applying a learned merge
    table.  Per-batch word cache: zipfian word frequencies mean a few
    thousand entries cover almost all tokens, and each DISTINCT word
    is segmented once per batch."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

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
                hit = cache.get(w)
                if hit is None:
                    hit = segment_word(w, ranks)
                    cache[w] = hit
                toks.extend(hit)
            out.append(toks)
        return pd.Series(out)

    return _seg


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = False,
) -> DataFrame:
    """Attach the BPE token array for ``text_col``."""
    seg = bpe_segmenter(merges, lowercase=lowercase)
    return df.withColumn(out_col, seg(F.col(text_col)))


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
    lowercase: bool = False,
) -> DataFrame:
    """Token-count-only variant (the pretraining budgeting number):
    same UDF, but only the array size survives the projection."""
    seg = bpe_segmenter(merges, lowercase=lowercase)
    return df.withColumn(out_col, F.size(seg(F.col(text_col))))


def detokenize(tokens: Column) -> Column:
    """BPE tokens -> text: concatenate and turn end-of-word markers
    back into spaces (the round-trip invariant under test)."""
    return F.trim(F.replace(F.array_join(tokens, ""), F.lit(EOW),
                            F.lit(" ")))


def build_vocab(
    histogram: DataFrame,
    merges: list[tuple[str, str]],
    specials: tuple[str, ...] = ("<unk>", "<pad>", "<bos>", "<eos>"),
) -> dict[str, int]:
    """token -> id table, GPT-convention layout: specials, then the
    base alphabet (every char seen in the training histogram + the
    end-of-word marker, sorted for determinism), then one entry per
    merge in merge order — so vocab size = |specials| + |alphabet| +
    n_merges and ids are stable across runs.  The alphabet comes off
    the histogram with one distinct-chars aggregation (scan-stage
    explode of 1-char substrings, tiny result)."""
    chars = sorted(
        r["c"] for r in histogram.select(
            F.explode(F.split(F.col("word"), "")).alias("c"))
        .filter(F.col("c") != "").distinct().collect())
    vocab: dict[str, int] = {}
    for s in specials:
        vocab[s] = len(vocab)
    for c in chars:
        vocab.setdefault(c, len(vocab))
    vocab.setdefault(EOW, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return vocab


def bpe_encode_ids(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    text_col: str = "text",
    out_col: str = "token_ids",
    lowercase: bool = False,
    unk: str = "<unk>",
) -> DataFrame:
    """Attach array<int> token ids — segmentation and id lookup fused
    in one vectorized UDF (same per-batch word cache), so the string
    tokens never materialize in the plan.  Symbols outside the vocab
    (a char unseen in training) map to ``unk``."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    unk_id = vocab[unk]

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
            ids: list[int] = []
            for w in t.split():
                hit = cache.get(w)
                if hit is None:
                    hit = [vocab.get(s, unk_id)
                           for s in segment_word(w, ranks)]
                    cache[w] = hit
                ids.extend(hit)
            out.append(ids)
        return pd.Series(out)

    return df.withColumn(out_col, _ids(F.col(text_col)))


def save_bpe(merges: list[tuple[str, str]], path: str) -> None:
    """Persist the ordered merge list as deterministic JSON."""
    import json
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"type": "bpe", "merges": [list(m) for m in merges]},
                  f, ensure_ascii=False)


def load_bpe(path: str) -> list[tuple[str, str]]:
    import json

    with open(path) as f:
        d = json.load(f)
    if d.get("type") != "bpe":
        raise ValueError(f"not a bpe model file: {path}")
    return [tuple(m) for m in d["merges"]]
