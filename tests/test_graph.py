"""pagerank — numpy power-iteration oracle + invariants."""

import numpy as np
import pytest
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


def test_hits_matches_numpy_power_iteration(spark):
    """HITS scores equal a dense numpy replay of the same normalized
    mutual recursion on a small digraph; hubs/authorities land where
    Kleinberg says (pointy hub -> high hub, pointed-at -> authority);
    parallelism-invariant to float tolerance."""
    import numpy as np

    edges = [(0, 3), (0, 4), (1, 3), (1, 4), (2, 4), (3, 2), (4, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    from xarray_spatial_spark.functions.graph import hits

    got = {r["node"]: (r["hub"], r["authority"])
           for r in hits(df, iters=12).collect()}

    n = 5
    A = np.zeros((n, n))
    for s, d in edges:
        A[s, d] = 1.0
    h = np.ones(n)
    a = np.ones(n)
    for _ in range(12):
        a = A.T @ h
        a /= np.linalg.norm(a)
        h = A @ a
        h /= np.linalg.norm(h)
    for v in range(n):
        assert got[v][0] == pytest.approx(h[v], abs=1e-9), v
        assert got[v][1] == pytest.approx(a[v], abs=1e-9), v
    # 0 and 1 point at both sinks -> top hubs; 4 is the top authority
    assert sorted(range(n), key=lambda v: -got[v][0])[:2] == [0, 1] or \
        sorted(range(n), key=lambda v: -got[v][0])[:2] == [1, 0]
    assert max(range(n), key=lambda v: got[v][1]) == 4

    again = {r["node"]: (r["hub"], r["authority"])
             for r in hits(df.repartition(7), iters=12).collect()}
    for v in range(n):
        assert again[v][0] == pytest.approx(got[v][0], rel=1e-12)

    with pytest.raises(ValueError):
        hits(df, iters=-1)
