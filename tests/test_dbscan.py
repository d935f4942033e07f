"""Distributed DBSCAN vs a brute-force single-node reference."""

import numpy as np
import pytest

from xarray_spatial_spark.operators.dbscan import dbscan, neighbor_pairs


def _brute_dbscan(pts, eps, min_pts):
    """pts: list of (id, x, y).  Returns {id: (is_core, cluster)} with
    the same deterministic labeling (cluster = min core id in the
    component; border -> min core-neighbor's cluster)."""
    ids = [p[0] for p in pts]
    xy = {p[0]: (p[1], p[2]) for p in pts}
    e2 = eps * eps

    def near(a, b):
        dx = xy[a][0] - xy[b][0]
        dy = xy[a][1] - xy[b][1]
        return dx * dx + dy * dy <= e2

    nbrs = {i: [j for j in ids if j != i and near(i, j)] for i in ids}
    core = {i for i in ids if len(nbrs[i]) + 1 >= min_pts}
    # components over core-core edges (BFS)
    label = {}
    for seed in sorted(core):
        if seed in label:
            continue
        comp, stack = [], [seed]
        seen = {seed}
        while stack:
            u = stack.pop()
            comp.append(u)
            for w in nbrs[u]:
                if w in core and w not in seen:
                    seen.add(w)
                    stack.append(w)
        lbl = min(comp)
        for u in comp:
            label[u] = lbl
    out = {}
    for i in ids:
        if i in core:
            out[i] = (True, label[i])
        else:
            cand = [label[j] for j in nbrs[i] if j in core]
            out[i] = (False, min(cand) if cand else None)
    return out


def _run(spark, pts, eps, min_pts):
    df = spark.createDataFrame(pts, "id: long, x: double, y: double")
    return {
        r["id"]: (r["is_core"], r["cluster"])
        for r in dbscan(df, eps=eps, min_pts=min_pts).collect()
    }


def test_planted_clusters_and_noise(spark):
    rng = np.random.default_rng(11)
    pts = []
    nid = 0
    for cx, cy in [(0.0, 0.0), (50.0, 50.0), (100.0, 0.0)]:
        for _ in range(12):
            pts.append((nid, cx + float(rng.normal(0, 1.0)),
                        cy + float(rng.normal(0, 1.0))))
            nid += 1
    for _ in range(8):  # far-flung noise
        pts.append((nid, float(rng.uniform(-500, 500)),
                    float(rng.uniform(200, 900))))
        nid += 1
    got = _run(spark, pts, eps=3.0, min_pts=4)
    ref = _brute_dbscan(pts, 3.0, 4)
    assert got == ref
    clusters = {c for _, c in got.values() if c is not None}
    assert len(clusters) == 3
    assert any(c is None for _, c in got.values())  # noise exists


def test_random_uniform_matches_brute(spark):
    rng = np.random.default_rng(23)
    pts = [(i, float(rng.uniform(0, 30)), float(rng.uniform(0, 30)))
           for i in range(150)]
    for eps, mp in [(1.5, 3), (2.5, 5), (0.5, 2)]:
        assert _run(spark, pts, eps, mp) == _brute_dbscan(pts, eps, mp)


def test_chain_cluster_single_component(spark):
    # a chain of points each eps apart: transitive closure must link
    # the whole chain into ONE cluster even though ends are far apart
    pts = [(i, i * 0.9, 0.0) for i in range(20)]
    got = _run(spark, pts, eps=1.0, min_pts=3)
    labels = {c for _, c in got.values() if c is not None}
    # the chain ends (one neighbor each) are border, so the min CORE
    # id — the cluster label — is 1; everything links into ONE cluster
    assert labels == {1}
    assert all(c == 1 for _, c in got.values())
    assert got == _brute_dbscan(pts, 1.0, 3)


def test_border_tie_breaks_to_min_cluster(spark):
    # two tight quads, one lone point within eps of exactly one core
    # from each (2 neighbors + self = 3 < min_pts=4, so border):
    # border must take the SMALLER cluster label
    a = [(0, 0.0, 0.0), (1, 0.3, 0.0), (2, 0.0, 0.6), (3, 0.3, 0.6)]
    b = [(10, 2.0, 0.0), (11, 2.3, 0.0), (12, 2.0, 0.6), (13, 2.3, 0.6)]
    mid = [(5, 1.15, 0.0)]  # 0.85 from cores 1 and 10, > eps from the rest
    got = _run(spark, a + b + mid, eps=1.0, min_pts=4)
    ref = _brute_dbscan(a + b + mid, 1.0, 4)
    assert got == ref
    assert got[5] == (False, 0)


def test_identical_points_one_cluster(spark):
    pts = [(i, 7.0, -3.0) for i in range(6)]
    got = _run(spark, pts, eps=0.1, min_pts=6)
    assert all(v == (True, 0) for v in got.values())


def test_min_pts_one_all_core(spark):
    pts = [(0, 0.0, 0.0), (1, 100.0, 100.0)]
    got = _run(spark, pts, eps=1.0, min_pts=1)
    # isolated cores are singleton clusters labeled by their own id
    assert got == {0: (True, 0), 1: (True, 1)}


def test_pair_generation_cell_boundary(spark):
    # points straddling grid-cell boundaries at exactly eps apart:
    # the 3x3 join must still see them (inclusive <=)
    # 0.75 / 1.75 are exactly representable: the gap is exactly eps
    pts = [(0, 0.75, 0.0), (1, 1.75, 0.0), (2, 5.0, 5.0)]
    df = spark.createDataFrame(pts, "id: long, x: double, y: double")
    pr = {(r["id"], r["nb_id"]) for r in neighbor_pairs(df, eps=1.0).collect()}
    assert pr == {(0, 1), (1, 0)}


def test_no_cartesian(spark):
    pts = [(i, float(i), 0.0) for i in range(10)]
    df = spark.createDataFrame(pts, "id: long, x: double, y: double")
    plan = dbscan(df, eps=1.0, min_pts=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
