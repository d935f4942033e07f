"""Spatial k-anonymity: the three disclosure-control invariants
(threshold, disjointness, conservation) + a pure-Python replay of the
bottom-up merge rule + cell_bounds inversion."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.functions import privacy

pytestmark = pytest.mark.usefixtures("spark")


def _tile(lon, lat, zoom):
    n = 1 << zoom
    xt = int(min(max(math.floor((lon + 180.0) / 360.0 * n), 0), n - 1))
    latc = min(max(lat, -85.05112878), 85.05112878)
    r = math.radians(latc)
    yt = int(min(max(math.floor(
        (1 - math.log(math.tan(r) + 1 / math.cos(r)) / math.pi) / 2 * n),
        0), n - 1))
    return xt, yt


def _py_anon(points, k, max_zoom):
    cur = {}
    for lon, lat in points:
        cur[_tile(lon, lat, max_zoom)] = cur.get(_tile(lon, lat, max_zoom), 0) + 1
    published = []
    for zoom in range(max_zoom, 0, -1):
        nxt = {}
        for (x, y), n in cur.items():
            if n >= k:
                published.append((x, y, zoom, n))
            else:
                nxt[(x // 2, y // 2)] = nxt.get((x // 2, y // 2), 0) + n
        cur = nxt
    suppressed = 0
    for (x, y), n in cur.items():
        if n >= k:
            published.append((x, y, 0, n))
        else:
            suppressed += n
    return published, suppressed


def _points(seed, n):
    rng = np.random.default_rng(seed)
    # dense cluster + sparse scatter: both publish/merge paths exercised
    cl = rng.normal([12.5, 47.0], 0.05, size=(n // 2, 2))
    sc = rng.uniform([-170, -80], [170, 80], size=(n - n // 2, 2))
    return np.vstack([cl, sc])


def test_matches_python_replay_and_invariants(spark):
    pts = _points(7, 400)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in pts], "lon double, lat double")
    out = privacy.anonymize_cells(
        df, k=5, max_zoom=8, include_suppressed=True).collect()
    pub = [(r.tile_x, r.tile_y, r.zoom, r.n) for r in out if r.zoom >= 0]
    sup = sum(r.n for r in out if r.zoom == -1)
    exp_pub, exp_sup = _py_anon([tuple(p) for p in pts], 5, 8)
    assert sorted(pub) == sorted(exp_pub)
    assert sup == exp_sup
    # threshold invariant
    assert all(n >= 5 for *_xyz, n in pub)
    # conservation
    assert sum(n for *_xyz, n in pub) + sup == 400
    # count-partition: assign every input point to the deepest
    # published ancestor of its leaf (or suppression) and recover the
    # published counts exactly — no point double-counted or lost
    cells = {(x, y, z): 0 for x, y, z, _ in pub}
    sup_replay = 0
    for lon, lat in pts:
        xt, yt = _tile(lon, lat, 8)
        for z in range(8, -1, -1):
            key = (xt >> (8 - z), yt >> (8 - z), z)
            if key in cells:
                cells[key] += 1
                break
        else:
            sup_replay += 1
    assert sup_replay == sup
    assert cells == {(x, y, z): n for x, y, z, n in pub}


def test_dense_city_publishes_deep_sparse_merges_up(spark):
    rng = np.random.default_rng(3)
    city = rng.normal([2.35, 48.85], 0.001, size=(200, 2))
    lone = np.array([[100.0, -30.0]])
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in np.vstack([city, lone])],
        "lon double, lat double")
    rows = privacy.anonymize_cells(
        df, k=10, max_zoom=10, include_suppressed=True).collect()
    deep = [r for r in rows if r.zoom == 10]
    assert deep and sum(r.n for r in deep) >= 150  # city at full depth
    # the lone point never reaches k: suppressed, not disclosed
    assert any(r.zoom == -1 and r.n == 1 for r in rows) or all(
        r.n >= 10 for r in rows if r.zoom >= 0)


def test_k1_publishes_all_leaves(spark):
    pts = _points(11, 60)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in pts], "lon double, lat double")
    rows = privacy.anonymize_cells(df, k=1, max_zoom=6).collect()
    assert all(r.zoom == 6 for r in rows)
    assert sum(r.n for r in rows) == 60


def test_cell_bounds_inverts_tile_assignment(spark):
    pts = _points(5, 50)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in pts], "lon double, lat double")
    cells = privacy.anonymize_cells(df, k=1, max_zoom=7)
    b = privacy.cell_bounds(cells).collect()
    for r in b:
        # center of the box maps back to the same tile
        cx = (r.lon_min + r.lon_max) / 2
        cy = (r.lat_min + r.lat_max) / 2
        assert _tile(cx, cy, r.zoom) == (r.tile_x, r.tile_y)
        assert r.lat_max > r.lat_min and r.lon_max > r.lon_min


def test_plan_no_python_one_wide_agg(spark):
    pts = _points(2, 100)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in pts], "lon double, lat double")
    out = privacy.anonymize_cells(df, k=4, max_zoom=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
