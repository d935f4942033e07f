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
