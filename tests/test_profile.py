"""Column profiler (functions/profile.py): exact moments vs hand
computation; sketched quantiles/ndv inside their error bands; fixed
job count."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.profile import (
    profile_columns, profile_exact)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.range(20_000).select(
        (F.col("id") % 1000).cast("double").alias("a"),
        F.when(F.col("id") % 10 != 7, F.col("id").cast("double")).alias("b"),
        (F.col("id") % 7).cast("double").alias("c"),
    )


def test_exact_half_matches_hand_math(spark, frame):
    got = {r["column"]: r for r in profile_exact(
        frame, ["a", "b", "c"]).collect()}
    a = np.array([i % 1000 for i in range(20_000)], float)
    b = np.array([i for i in range(20_000) if i % 10 != 7], float)
    assert got["a"]["n_rows"] == 20_000 and got["a"]["n_nulls"] == 0
    assert got["b"]["n_nulls"] == 2000
    assert got["a"]["min"] == 0.0 and got["a"]["max"] == 999.0
    assert got["a"]["mean"] == pytest.approx(a.mean(), rel=1e-12)
    assert got["a"]["std"] == pytest.approx(a.std(), rel=1e-9)
    assert got["b"]["mean"] == pytest.approx(b.mean(), rel=1e-12)
    assert got["b"]["std"] == pytest.approx(b.std(), rel=1e-9)


def test_full_profile_sketched_bands(spark, frame):
    p = profile_columns(frame, ["a", "b", "c"], qs=(0.25, 0.5, 0.99))
    # ndv within the hll band
    assert abs(p["a"]["ndv"] / 1000 - 1) < 0.05
    assert round(p["c"]["ndv"]) == 7
    assert abs(p["b"]["ndv"] / 18_000 - 1) < 3 * 1.04 / np.sqrt(1 << 14)
    # quantiles within the kll band (values 0..999 uniform)
    assert abs(p["a"]["q50"] / 500 - 1) < 0.05
    assert abs(p["a"]["q99"] / 990 - 1) < 0.05
    assert p["c"]["q25"] in (1.0, 2.0)
    # exact metrics present alongside
    assert p["a"]["n_rows"] == 20_000 and p["b"]["n_nulls"] == 2000


def test_unknown_column_raises(spark, frame):
    with pytest.raises(ValueError, match="not in frame"):
        profile_exact(frame, ["nope"])


def test_correlations_match_numpy(spark, frame):
    from xarray_spatial_spark.functions.profile import profile_correlations

    got = {(r["col_a"], r["col_b"]): r for r in
           profile_correlations(frame, ["a", "b", "c"]).collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    ids = np.arange(20_000)
    a = (ids % 1000).astype(float)
    b = np.where(ids % 10 != 7, ids.astype(float), np.nan)
    m = ~np.isnan(b)
    want_ab = np.corrcoef(a[m], b[m])[0, 1]
    assert got[("a", "b")]["n"] == m.sum()
    assert got[("a", "b")]["corr"] == pytest.approx(want_ab, rel=1e-9)
    c = (ids % 7).astype(float)
    assert got[("a", "c")]["corr"] == pytest.approx(
        np.corrcoef(a, c)[0, 1], rel=1e-9)


def test_correlation_zero_variance_is_null(spark):
    from xarray_spatial_spark.functions.profile import profile_correlations

    df = spark.range(100).select(
        F.lit(5.0).alias("k"), F.col("id").cast("double").alias("x"))
    r = profile_correlations(df, ["k", "x"]).collect()[0]
    assert r["corr"] is None


def test_correlation_perfect_line(spark):
    from xarray_spatial_spark.functions.profile import profile_correlations

    df = spark.range(500).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * -3 + 7).cast("double").alias("y"))
    r = profile_correlations(df, ["x", "y"]).collect()[0]
    assert r["corr"] == pytest.approx(-1.0, abs=1e-12)
