"""DSIR data selection — Data Selection via Importance Resampling
(Xie et al. 2023, NeurIPS): pick raw-corpus documents whose hashed
n-gram feature distribution looks like a small TARGET corpus, the
standard method for steering a 100-TB crawl toward a quality domain
(Wikipedia+books in the paper) without training a model.

Shape of the computation (all Catalyst until the final top-k):

1. ``hashed_ngram_buckets`` — each doc maps to hashed unigram+bigram
   feature buckets, a FIXED vocabulary of ``n_buckets`` ints.  Hashed
   features are the point: the importance model stays a bounded-size
   table no matter how large the corpus vocabulary is, so it always
   broadcasts.
2. Bag-of-words generative models fitted on target and raw by hash
   aggregation (counts shuffle, never text); the per-bucket
   log-probability ratio table is <= ``n_buckets`` rows -> broadcast
   join back onto exploded doc features; one (id)-keyed exchange of
   partial sums yields each doc's log importance weight.
3. ``dsir_select`` — Gumbel top-k (sampling without replacement
   proportional to the importance weights) with the repo's
   deterministic Knuth-hash uniform, so the identical selection
   reproduces in any engine and at any parallelism.

The feature hash is the repo's portable modular convention
(``ascii(first char) * 31 + length`` per token, polynomial-combined
for bigrams — see ``text.fingerprint``): weaker than xxhash64 but
exactly expressible in ANSI SQL, and hashed-feature collisions are
inherent to the method anyway (the paper uses 2^16 buckets for the
same reason).  Swap ``F.xxhash64`` in where engine parity is not
required.

Reference anchor: no xarray-spatial analog (xrspatial/ has no text
tier); this implements the training-data-pipeline data-selection
requirement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.text import tokens

#: Knuth multiplicative hash constants shared with
#: corpus.stratified_sample (overflow-safe for ANY int64 id)
_P = 1_000_000_007
_KNUTH = 2_654_435_761


def _tok_val(c: Column) -> Column:
    # cast FIRST: ascii() of a non-BMP char is ~1.1e6 and the bigram
    # combine multiplies by 131 — int32 would overflow (wrap on
    # non-ANSI Spark, ERROR on DuckDB), splitting the engines
    return F.ascii(F.substring(c, 1, 1)).cast("long") * 31 + F.length(c)


def hashed_ngram_buckets(text: Column, n_buckets: int = 10000) -> Column:
    """array<long> of hashed word unigram + bigram feature buckets
    (one entry per occurrence — counts matter to the weight)."""
    toks = tokens(text)
    n = F.size(toks)
    uni = F.transform(toks, lambda t: _tok_val(t) % n_buckets)
    bi = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: (_tok_val(a) * 131 + _tok_val(b)) % n_buckets,
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return F.concat(uni, bi)


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 10000,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_feats, log_w): log importance weight of every ``raw``
    doc under add-alpha-smoothed hashed-bigram models of target vs
    raw —

        log w(x) = sum over feature occurrences f in x of
                   ln p_tgt(f) - ln p_raw(f)

    Totals ride the final job as broadcast 1-row aggregates (no eager
    build-time count job); the ratio table is <= n_buckets rows and
    broadcasts; the raw corpus is exploded ONCE into persisted
    per-doc (id, bucket, cnt) rows that feed BOTH the raw model
    counts and the scoring join (the naive shape pays two full
    corpus passes), so the only doc-scale exchange carries
    (id, bucket) partials after map-side combine.  Feature-less docs
    get log_w = 0."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")

    def feats(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(
                hashed_ngram_buckets(F.col(text_col), n_buckets)
            ).alias("bucket"),
        )

    doc_counts = feats(raw).groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).cast("double").alias("_cnt")).persist()
    tgt_c = feats(target).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("double").alias("_ct"))
    raw_c = doc_counts.groupBy("bucket").agg(
        F.sum("_cnt").alias("_cr"))
    tgt_tot = tgt_c.agg(F.sum("_ct").alias("_T"))
    raw_tot = raw_c.agg(F.sum("_cr").alias("_R"))
    aB = F.lit(float(alpha) * n_buckets)
    ratio = (
        tgt_c.join(raw_c, "bucket", "full")
        .crossJoin(F.broadcast(tgt_tot))
        .crossJoin(F.broadcast(raw_tot))
        .select(
            "bucket",
            (
                F.log((F.coalesce("_ct", F.lit(0.0)) + alpha)
                      / (F.col("_T") + aB))
                - F.log((F.coalesce("_cr", F.lit(0.0)) + alpha)
                        / (F.col("_R") + aB))
            ).alias("_lr"),
        )
    )
    # a bucket absent from BOTH models can still appear when scoring a
    # frame other than `raw`: its ratio is the alpha-floor of both
    # sides, computable from the broadcast totals alone
    doc = (
        doc_counts
        .join(F.broadcast(ratio), "bucket", "left")
        .crossJoin(F.broadcast(tgt_tot))
        .crossJoin(F.broadcast(raw_tot))
        .withColumn(
            "_lr",
            F.coalesce(
                "_lr",
                F.log(F.lit(float(alpha)) / (F.col("_T") + aB))
                - F.log(F.lit(float(alpha)) / (F.col("_R") + aB)),
            ),
        )
    )
    per_doc = doc.groupBy(id_col).agg(
        F.sum("_cnt").cast("long").alias("n_feats"),
        F.sum(F.col("_cnt") * F.col("_lr")).alias("log_w"),
    )
    ids = raw.select(id_col).distinct()
    return ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
        F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
    )


def gumbel_key(id_col: Column, log_w: Column, seed: int = 1) -> Column:
    """log_w + Gumbel(0,1) noise from the deterministic Knuth-hash
    uniform of (id + seed) — the Gumbel-top-k trick: taking the k
    largest keys samples k docs WITHOUT replacement with probability
    proportional to exp(log_w).  Pure integer-then-libm arithmetic,
    so the identical keys (and selection) reproduce in any engine."""
    u = (
        (((id_col + seed) % _P + _P) % _P * _KNUTH % _P + 1).cast("double")
        / (_P + 1)
    )
    return log_w - F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 10000,
    alpha: float = 1.0,
    seed: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k Gumbel selection: (id, n_feats, log_w, rank), rank 1 =
    first selected.  orderBy().limit(k) executes as per-partition
    TopK + a k-row merge (TakeOrderedAndProject) — no global sort of
    the corpus; the rank window runs over the already-k-row result."""
    if k <= 0:
        raise ValueError("k must be positive")
    w = dsir_log_weights(
        raw, target, n_buckets=n_buckets, alpha=alpha,
        text_col=text_col, id_col=id_col,
    )
    keyed = w.withColumn(
        "_key", gumbel_key(F.col(id_col), F.col("log_w"), seed))
    from pyspark.sql import Window

    win = Window.orderBy(F.col("_key").desc(), F.col(id_col).asc())
    return (
        keyed.orderBy(F.col("_key").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(win))
        .select(id_col, "n_feats", "log_w", "rank")
    )
