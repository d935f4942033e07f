"""Adaptive KD spatial partitioner (plans/partitioner.py): balance
under heavy spatial skew, distributed==driver assignment parity,
deterministic fit, leaf-box containment, co-partitioned join keys,
and degenerate inputs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.plans.partitioner import (
    KDTree,
    fit_kdtree,
    spatial_repartition,
)


def _hotspot_df(spark, n=20000, seed=3):
    """90% of points inside a 0.2-degree city box, 10% spread over the
    globe — the population skew a fixed grid cannot balance."""
    rng = np.random.default_rng(seed)
    hot = rng.uniform([-0.1, 51.4], [0.1, 51.6], size=(int(n * 0.9), 2))
    cold = rng.uniform([-180, -60], [180, 70], size=(n - len(hot), 2))
    pts = np.vstack([hot, cold])
    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)]
    return spark.createDataFrame(rows, "pid long, lon double, lat double")


def test_balance_under_hotspot_skew(spark):
    df = _hotspot_df(spark)
    tree = fit_kdtree(df, num_partitions=32)
    out = tree.assign(df)
    counts = np.array(
        [r.n for r in out.groupBy("spatial_pid").count()
         .select(F.col("count").alias("n")).collect()]
    )
    assert counts.sum() == 20000
    # sample == full data here, so median splits are near-exact
    assert counts.max() <= 2.0 * counts.mean()
    # a fixed grid at comparable granularity for contrast: >= 90% of
    # rows in one 1-degree cell
    grid = (
        df.groupBy(
            F.floor(F.col("lon")).alias("gx"), F.floor(F.col("lat")).alias("gy")
        ).count().agg(F.max("count").alias("m")).collect()[0].m
    )
    assert grid >= 0.4 * 20000  # grid hopeless, tree balanced


def test_assign_matches_driver_leaf_of(spark):
    df = _hotspot_df(spark, n=3000, seed=9)
    tree = fit_kdtree(df, num_partitions=16)
    got = {r.pid: r.spatial_pid for r in tree.assign(df).collect()}
    pdf = df.toPandas().sort_values("pid")
    exp = tree.leaf_of(pdf["lon"].to_numpy(), pdf["lat"].to_numpy())
    assert [got[i] for i in pdf["pid"]] == list(exp)


def test_fit_deterministic(spark):
    df = _hotspot_df(spark, n=5000, seed=1)
    t1 = fit_kdtree(df, num_partitions=8)
    t2 = fit_kdtree(df.repartition(13), num_partitions=8)
    assert np.array_equal(t1.dims, t2.dims)
    assert np.array_equal(t1.thrs, t2.thrs)


def test_leaf_bounds_contain_points(spark):
    df = _hotspot_df(spark, n=2000, seed=5)
    tree = fit_kdtree(df, num_partitions=16)
    boxes = tree.leaf_bounds()
    pdf = df.toPandas()
    leaves = tree.leaf_of(pdf["lon"].to_numpy(), pdf["lat"].to_numpy())
    for x, y, leaf in zip(pdf["lon"], pdf["lat"], leaves):
        xmin, ymin, xmax, ymax = boxes[leaf]
        assert xmin < x <= xmax and ymin < y <= ymax


def test_same_tree_copartitions_two_frames(spark):
    a = _hotspot_df(spark, n=4000, seed=2)
    b = a.withColumn("pid", F.col("pid") + 100000)  # same coords
    tree = fit_kdtree(a, num_partitions=8)
    pa = tree.assign(a).select("pid", "lon", "spatial_pid")
    pb = tree.assign(b).select(
        (F.col("pid") - 100000).alias("pid"),
        F.col("spatial_pid").alias("pid_b"),
    )
    j = pa.join(pb, "pid")
    assert j.filter(F.col("spatial_pid") != F.col("pid_b")).count() == 0


def test_spatial_repartition_partition_sizes(spark):
    df = _hotspot_df(spark)
    out = spatial_repartition(df, num_partitions=16)
    sizes = np.array(
        [r.n for r in out.withColumn("p", F.spark_partition_id())
         .groupBy("p").count().select(F.col("count").alias("n")).collect()]
    )
    assert sizes.sum() == 20000
    assert sizes.max() <= 2.5 * sizes.mean()


def test_salting_breaks_duplicate_coordinate_hotspot(spark):
    """30% of rows at ONE exact coordinate — unsplittable by any
    boundary; the sample-driven salting must spread them."""
    rng = np.random.default_rng(11)
    n = 10000
    spread = rng.uniform([-180, -60], [180, 70], size=(n - 3000, 2))
    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(spread)]
    rows += [(n + i, -0.1278, 51.5074) for i in range(3000)]  # London
    df = spark.createDataFrame(rows, "pid long, lon double, lat double")

    tree = fit_kdtree(df, num_partitions=16)
    leaf_max = max(
        r.n for r in tree.assign(df).groupBy("spatial_pid").count()
        .select(F.col("count").alias("n")).collect()
    )
    assert leaf_max >= 3000  # the hot leaf really is unsplittable

    for salt_col in (None, "pid"):
        out = spatial_repartition(
            df, num_partitions=16, salt_col=salt_col, tree=tree
        )
        sizes = np.array(
            [r.n for r in out.withColumn("p", F.spark_partition_id())
             .groupBy("p").count().select(F.col("count").alias("n"))
             .collect()]
        )
        assert sizes.sum() == n
        assert sizes.max() <= 2.0 * (n / 16), (salt_col, sorted(sizes))


def test_degenerate_identical_points(spark):
    df = spark.createDataFrame(
        [(i, 1.0, 2.0) for i in range(100)], "pid long, lon double, lat double"
    )
    tree = fit_kdtree(df, num_partitions=4)
    out = tree.assign(df).select("spatial_pid").distinct().collect()
    assert len(out) == 1  # ties go left: one occupied leaf, no crash


def test_validation():
    with pytest.raises(ValueError):
        KDTree(np.zeros(2, np.int8), np.zeros(2), levels=2)
