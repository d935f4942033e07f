"""Trainable quality classifier (functions/quality_model.py)."""

import numpy as np
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.quality_model import (
    quality_model_score,
    reference_fit,
    train_quality_model,
)


def _toy(spark, n=400):
    """Separable-ish 2-feature data built from deterministic math."""
    rows = []
    for i in range(n):
        a = (i * 37 % 100) / 100.0
        c = (i * 61 % 100) / 100.0
        y = 1.0 if a + 0.5 * c > 0.75 else 0.0
        rows.append((float(a), float(c), y))
    return spark.createDataFrame(rows, "fa double, fc double, y double")


def test_matches_numpy_reference(spark):
    df = _toy(spark)
    feats = {"fa": F.col("fa"), "fc": F.col("fc")}
    pdf = df.toPandas()
    # BOTH dispatch paths: the driver-collect path (default cap) and
    # the distributed per-iteration-aggregation path (cap=0) must
    # match the numpy reference step for step
    for cap in (500_000, 0):
        m = train_quality_model(df, "y", features=feats, iters=40,
                                lr=0.3, driver_cap=cap)
        X = pdf[["fa", "fc"]].to_numpy()
        Xs = (X - np.array(m["mean"])) / np.array(m["std"])
        w, b = reference_fit(Xs, pdf["y"].to_numpy(), iters=40, lr=0.3)
        assert np.allclose(m["w"], w, atol=1e-9), cap
        assert abs(m["b"] - b) < 1e-9, cap


def test_separates_and_scores_in_catalyst(spark):
    df = _toy(spark)
    feats = {"fa": F.col("fa"), "fc": F.col("fc")}
    m = train_quality_model(df, "y", features=feats, iters=150, lr=1.0)
    scored = df.select(
        "y", quality_model_score(m, features=feats).alias("p"))
    acc = scored.select(
        F.avg(((F.col("p") > 0.5).cast("double") == F.col("y"))
              .cast("double")).alias("a")).collect()[0]["a"]
    assert acc > 0.97
    # scoring is a single Catalyst projection: no UDF/exchange nodes
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_gopher_feature_pipeline(spark):
    """End to end on text: reference-prose docs vs spam docs."""
    good = ("this is a long and entirely reasonable paragraph of prose "
            "that has many common words and the usual shape of written "
            "english text with more than enough words to matter")
    spam = "buy # now ### cheap # pills ### buy # now ### cheap # pills"
    rows = [(good + f" variant {i}", 1.0) for i in range(60)] + \
           [(spam + f" #{i}", 0.0) for i in range(60)]
    df = spark.createDataFrame(rows, "text string, y double")
    m = train_quality_model(df, "y", iters=60, lr=1.0)
    scored = df.select("y", quality_model_score(m).alias("p"))
    rates = {r["y"]: r["p"] for r in scored.groupBy("y")
             .agg(F.avg("p").alias("p")).collect()}
    assert rates[1.0] > 0.9 and rates[0.0] < 0.1
    # apply to UNSEEN text generalizes directionally
    unseen = spark.createDataFrame(
        [("a perfectly normal sentence with common words that reads "
          "like real prose and carries enough length to judge",),
         ("# buy ### cheap # buy ### cheap # buy ###",)],
        "text string")
    ps = [r["p"] for r in unseen.select(
        quality_model_score(m).alias("p")).collect()]
    assert ps[0] > 0.5 > ps[1]
