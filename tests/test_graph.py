"""pagerank — numpy power-iteration oracle + invariants."""

import numpy as np
from pyspark.sql import functions as F

from xarray_spatial_spark.functions import graph


def _numpy_pagerank(edges, iters, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    out = np.zeros(len(nodes))
    for u, _ in edges:
        out[idx[u]] += 1
    r = np.ones(len(nodes))
    for _ in range(iters):
        s = np.zeros(len(nodes))
        for u, v in edges:
            s[idx[v]] += r[idx[u]] / out[idx[u]]
        r = (1 - d) + d * s
    return {n: r[idx[n]] for n in nodes}


def test_pagerank_matches_numpy(spark):
    rng = np.random.default_rng(8)
    edges = sorted({(int(rng.integers(0, 30)), int(rng.integers(0, 30)))
                    for _ in range(150)})
    df = spark.createDataFrame(edges, schema="src long, dst long")
    got = {r["node"]: r["rank"]
           for r in graph.pagerank(df, iters=8).collect()}
    want = _numpy_pagerank(edges, 8)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, n


def test_pagerank_sink_and_hub(spark):
    # star: every spoke links to the hub; hub ranks highest
    edges = [(i, 0) for i in range(1, 9)] + [(0, 1)]
    df = spark.createDataFrame(edges, schema="src long, dst long")
    got = {r["node"]: r["rank"] for r in graph.pagerank(df, iters=20).collect()}
    assert got[0] == max(got.values())
    # spokes 2..8 have no in-links: exactly the base rank
    for n in range(2, 9):
        assert abs(got[n] - 0.15) < 1e-12


def test_connected_components(spark):
    # two chains + an isolate-ish pair + a self-loop
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (12, 12), (20, 21), (21, 10)]
    df = spark.createDataFrame(edges, schema="src long, dst long")
    got = {r["node"]: r["label"]
           for r in graph.connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 20: 10, 21: 10, 12: 12}


def test_connected_components_long_chain(spark):
    # a 60-node path exercises many propagation rounds
    edges = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(edges, schema="src long, dst long")
    got = {r["node"]: r["label"]
           for r in graph.connected_components(df).collect()}
    assert set(got.values()) == {0} and len(got) == 61
