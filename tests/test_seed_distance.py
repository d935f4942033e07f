"""Seed-BFS crawl depth (graph.py:seed_distance): exact depths on
hand graphs, min-over-multiple-paths, directedness, cycle
termination, max_hops cutoff, and equality with a driver-side BFS on
a random graph."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.graph import seed_distance


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node long")


def _run(spark, pairs, seeds, **kw):
    out = seed_distance(_edges(spark, pairs), _seeds(spark, seeds), **kw)
    return {r.node: r.depth for r in out.collect()}


def test_line_graph(spark):
    pairs = [(i, i + 1) for i in range(6)]
    assert _run(spark, pairs, [0]) == {i: i for i in range(7)}


def test_max_hops_cutoff(spark):
    pairs = [(i, i + 1) for i in range(10)]
    got = _run(spark, pairs, [0], max_hops=3)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_min_over_paths_and_multiple_seeds(spark):
    # diamond 0->1->3, 0->2, 2->3 (depth 2 both ways) plus a shortcut
    # seed at 3; unreached node 9 absent
    pairs = [(0, 1), (1, 3), (0, 2), (2, 3), (3, 4), (9, 9)]
    got = _run(spark, pairs, [0, 3])
    assert got == {0: 0, 3: 0, 1: 1, 2: 1, 4: 1}


def test_directedness(spark):
    pairs = [(1, 0), (2, 1)]  # edges point INTO the seed
    assert _run(spark, pairs, [0]) == {0: 0}


def test_cycle_terminates(spark):
    pairs = [(0, 1), (1, 2), (2, 0)]
    assert _run(spark, pairs, [0]) == {0: 0, 1: 1, 2: 2}


@pytest.mark.parametrize("seed", [3, 11])
def test_matches_driver_bfs(spark, seed):
    rng = np.random.default_rng(seed)
    n, m = 120, 400
    srcs = rng.integers(0, n, m)
    dsts = rng.integers(0, n, m)
    pairs = [(int(a), int(b)) for a, b in zip(srcs, dsts)]
    seeds = [0, 1]
    got = _run(spark, pairs, seeds, max_hops=15)

    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
    want = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, 16):
        frontier = {
            b for a in frontier for b in adj.get(a, ()) if b not in want
        }
        for b in frontier:
            want[b] = d
        if not frontier:
            break
    assert got == want


def test_shuffle_fallback_path_equal(spark):
    # forcing broadcast_frontier_rows=0 exercises the shuffle-join
    # branch; results must be identical
    pairs = [(i, (i * 7 + 1) % 50) for i in range(50)]
    a = _run(spark, pairs, [0], broadcast_frontier_rows=0)
    b = _run(spark, pairs, [0])
    assert a == b and len(a) > 3
