"""Trainable quality classifier — logistic regression as Spark jobs.

The curation stage DCLM / FineWeb-Edu run after the rule-based gates:
a small linear model over cheap text signals, trained on a labeled
sample (pages that look like reference text vs pages that look like
spam), then applied to the whole crawl.  Shape of the work:

- **Featurize once.**  The text column is scanned ONE time into a
  narrow (k doubles + label) frame and persisted — at 100 TB the text
  scan is the dominant cost and must not be repaid per iteration.
- **Train = one aggregation job per iteration.**  Batch gradient
  descent: grad_j = Σ x_j·(σ(w·x+b) − y) is a plain groupless agg
  over the persisted feature frame (map-side partial sums, bytes per
  task ~ k doubles).  Deterministic given the data (floating-point
  sum order aside), no sampling, no Python on the hot path.
- **Score = pure Catalyst.**  The fitted weights become a literal
  dot-product + sigmoid expression that fuses into whatever scan the
  caller already runs — the 100-TB apply pass costs nothing beyond
  the signals themselves.

Features default to the Gopher signal set
(functions.text.gopher_signals) standardized by training-set moments;
standardization constants ride inside the returned model so apply
needs no extra pass.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.text import _gopher_signal_map


def gopher_feature_columns(text: Column) -> dict[str, Column]:
    """The default feature set: Gopher signals, cast to double."""
    return {k: v.cast("double")
            for k, v in _gopher_signal_map(text).items()}


def train_quality_model(
    df: DataFrame,
    label_col: str,
    features: dict[str, Column] | None = None,
    text_col: str = "text",
    iters: int = 100,
    lr: float = 0.5,
    l2: float = 1e-4,
    driver_cap: int = 500_000,
) -> dict:
    """Fit logistic regression by batch gradient descent.

    Returns ``{"names", "mean", "std", "w", "b"}`` — plain floats, so
    the model is a broadcastable constant.  One featurize+moments job;
    then the loop auto-dispatches on training-set size (the repo's
    driver-rank-when-broadcast-anyway pattern): at or under
    ``driver_cap`` rows the standardized features collect once (a few
    doubles per row — 500k x 8 is ~32 MB) and the identical update
    runs in numpy, since a fresh-literal Spark plan pays plan+codegen
    per iteration (~150 ms x iters) to aggregate what numpy folds in
    microseconds; above the cap each iteration is one aggregation job
    over the persisted narrow frame (map-side partial sums — the
    100-TB-training-set shape).  ``label_col`` holds 0/1 doubles."""
    if features is None:
        features = gopher_feature_columns(F.col(text_col))
    names = list(features)
    feats = df.select(
        F.col(label_col).cast("double").alias("_y"),
        *[features[n].alias(n) for n in names],
    ).persist()
    try:
        # standardize: GD on raw crawl-signal scales (n_words in 1e3,
        # fractions in 1e-2) zigzags; one moments job fixes that
        mrow = feats.agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.avg(n).alias(f"m_{n}") for n in names],
            *[F.stddev_pop(n).alias(f"s_{n}") for n in names],
        ).collect()[0]
        n_rows = float(mrow["_n"])
        mean = [float(mrow[f"m_{n}"]) for n in names]
        std = [float(mrow[f"s_{n}"]) or 1.0 for n in names]
        xs = [((F.col(n) - mean[i]) / std[i]) for i, n in enumerate(names)]

        if n_rows <= driver_cap:
            import numpy as np

            pdf = feats.select(
                F.col("_y"), *[xs[i].alias(n) for i, n in enumerate(names)]
            ).toPandas()
            w_arr, b = reference_fit(
                pdf[names].to_numpy(), pdf["_y"].to_numpy(),
                iters=iters, lr=lr, l2=l2)
            return {"names": names, "mean": mean, "std": std,
                    "w": [float(v) for v in w_arr], "b": float(b)}

        w = [0.0] * len(names)
        b = 0.0
        for _ in range(iters):
            z = F.lit(b)
            for i in range(len(names)):
                z = z + F.lit(w[i]) * xs[i]
            resid = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("_y")
            g = feats.agg(
                F.sum(resid).alias("g_b"),
                *[F.sum(resid * xs[i]).alias(f"g_{i}")
                  for i in range(len(names))],
            ).collect()[0]
            b -= lr * float(g["g_b"]) / n_rows
            for i in range(len(names)):
                w[i] -= lr * (float(g[f"g_{i}"]) / n_rows + l2 * w[i])
    finally:
        feats.unpersist()
    return {"names": names, "mean": mean, "std": std, "w": w, "b": b}


def quality_model_score(
    model: dict,
    features: dict[str, Column] | None = None,
    text_col: str = "text",
) -> Column:
    """σ(w·x̂+b) as a single Catalyst expression — the whole-crawl
    apply path.  Pass the same ``features`` used in training (or let
    both default to the Gopher set)."""
    if features is None:
        features = gopher_feature_columns(F.col(text_col))
    z = F.lit(float(model["b"]))
    for i, n in enumerate(model["names"]):
        xhat = (features[n] - model["mean"][i]) / model["std"][i]
        z = z + F.lit(float(model["w"][i])) * xhat
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def reference_fit(X, y, iters: int = 100, lr: float = 0.5,
                  l2: float = 1e-4):
    """Driver-side numpy twin of :func:`train_quality_model` on
    already-standardized features — the test oracle (same
    initialization, same update rule, same order of operations)."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    w = np.zeros(X.shape[1])
    b = 0.0
    n = float(len(y))
    for _ in range(iters):
        r = 1.0 / (1.0 + np.exp(-(X @ w + b))) - y
        b -= lr * float(r.sum()) / n
        w -= lr * ((X.T @ r) / n + l2 * w)
    return w, b


def sigmoid(v: float) -> float:
    return 1.0 / (1.0 + math.exp(-v))
