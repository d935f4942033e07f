"""Moran's I / Geary's C / KDE vs dense brute-force references."""

import math

import numpy as np
import pytest

from xarray_spatial_spark.operators import spatialstats as sps


def _brute_autocorr(cells, contiguity="queen"):
    """cells: list of (x, y, v).  Full-matrix reference."""
    pts = {(x, y): float(v) for x, y, v in cells}
    keys = sorted(pts)
    n = len(keys)
    v = np.array([pts[k] for k in keys])
    mean = v.mean()
    m2 = float(((v - mean) ** 2).sum())
    offs = sps._offsets(contiguity)
    idx = {k: i for i, k in enumerate(keys)}
    w = np.zeros((n, n))
    for (x, y), i in idx.items():
        for dx, dy in offs:
            j = idx.get((x + dx, y + dy))
            if j is not None:
                w[i, j] = 1.0
    s0 = w.sum()
    if s0 == 0 or m2 == 0 or n < 2:
        return dict(n=n, s0=int(s0), morans_i=None, gearys_c=None, z_i=None)
    d = v - mean
    num_i = float(d @ w @ d)
    num_c = float(sum(w[i, j] * (v[i] - v[j]) ** 2
                      for i in range(n) for j in range(n)))
    i_stat = n / s0 * num_i / m2
    c_stat = (n - 1) * num_c / (2 * s0 * m2)
    e_i = -1.0 / (n - 1)
    s1 = 0.5 * ((w + w.T) ** 2).sum()
    s2 = float(((w.sum(1) + w.sum(0)) ** 2).sum())
    var_i = (n * n * s1 - n * s2 + 3 * s0 * s0) / (s0 * s0 * (n * n - 1)) - e_i**2
    z = (i_stat - e_i) / math.sqrt(var_i) if var_i > 0 else None
    return dict(n=n, s0=int(s0), morans_i=i_stat, gearys_c=c_stat, z_i=z)


def _run(spark, cells, contiguity="queen"):
    df = spark.createDataFrame(cells, "tile_x: long, tile_y: long, value: double")
    return sps.global_autocorrelation(df, contiguity=contiguity).collect()[0]


def test_checkerboard_negative(spark):
    cells = [(x, y, float((x + y) % 2)) for x in range(6) for y in range(6)]
    got = _run(spark, cells, "rook")
    ref = _brute_autocorr(cells, "rook")
    assert got["morans_i"] == pytest.approx(-1.0)  # perfect dispersion, rook
    assert got["morans_i"] == pytest.approx(ref["morans_i"], abs=1e-9)
    assert got["gearys_c"] == pytest.approx(ref["gearys_c"], abs=1e-9)
    assert got["z_i"] < -3  # significantly dispersed
    assert got["z_i"] == pytest.approx(ref["z_i"], abs=1e-9)


def test_gradient_positive(spark):
    cells = [(x, y, float(x)) for x in range(7) for y in range(5)]
    got = _run(spark, cells, "queen")
    ref = _brute_autocorr(cells, "queen")
    assert got["morans_i"] > 0.5
    assert got["gearys_c"] < 0.5
    assert got["morans_i"] == pytest.approx(ref["morans_i"], abs=1e-9)
    assert got["gearys_c"] == pytest.approx(ref["gearys_c"], abs=1e-9)
    assert got["z_i"] == pytest.approx(ref["z_i"], abs=1e-9)


def test_random_sparse_matches_brute(spark):
    rng = np.random.default_rng(7)
    seen = set()
    cells = []
    while len(cells) < 60:
        x, y = int(rng.integers(0, 15)), int(rng.integers(0, 15))
        if (x, y) in seen:
            continue
        seen.add((x, y))
        cells.append((x, y, float(rng.normal())))
    for cont in ("queen", "rook"):
        got = _run(spark, cells, cont)
        ref = _brute_autocorr(cells, cont)
        assert got["n"] == ref["n"] and got["s0"] == ref["s0"]
        assert got["morans_i"] == pytest.approx(ref["morans_i"], abs=1e-9)
        assert got["gearys_c"] == pytest.approx(ref["gearys_c"], abs=1e-9)
        assert got["z_i"] == pytest.approx(ref["z_i"], abs=1e-9)


def test_constant_field_null(spark):
    cells = [(x, 0, 3.0) for x in range(5)]
    got = _run(spark, cells)
    assert got["morans_i"] is None and got["gearys_c"] is None


def test_islands_only_null(spark):
    cells = [(0, 0, 1.0), (10, 10, 2.0), (20, 0, 3.0)]
    got = _run(spark, cells)
    assert got["s0"] == 0 and got["morans_i"] is None


def test_no_nested_loop_join(spark):
    cells = [(x, y, float(x * y)) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(cells, "tile_x: long, tile_y: long, value: double")
    plan = sps.global_autocorrelation(df)._jdf.queryExecution().executedPlan().toString()
    # at most the single 1-row scalar attach may be a nested-loop join
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan


def test_kde_matches_brute(spark):
    rng = np.random.default_rng(3)
    cells = {}
    for _ in range(40):
        k = (int(rng.integers(0, 12)), int(rng.integers(0, 12)))
        cells[k] = cells.get(k, 0.0) + float(rng.integers(1, 5))
    rows = [(x, y, v) for (x, y), v in cells.items()]
    df = spark.createDataFrame(rows, "tile_x: long, tile_y: long, value: double")
    radius, sigma = 2, 1.5
    got = {
        (r["tile_x"], r["tile_y"]): r["density"]
        for r in sps.kde_smooth(df, radius=radius, sigma=sigma).collect()
    }
    ref = {}
    for (x, y), v in cells.items():
        for dx, dy, w in sps.kde_weights(radius, sigma):
            k = (x + dx, y + dy)
            ref[k] = ref.get(k, 0.0) + v * w
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], rel=1e-12)


def test_kde_mass_conserved(spark):
    # total output mass == total input mass * kernel sum (scatter form)
    rows = [(0, 0, 2.0), (5, 5, 3.0), (5, 6, 1.0)]
    df = spark.createDataFrame(rows, "tile_x: long, tile_y: long, value: double")
    radius, sigma = 2, 1.0
    ksum = sum(w for _, _, w in sps.kde_weights(radius, sigma))
    out = sps.kde_smooth(df, radius=radius, sigma=sigma).agg({"density": "sum"})
    assert out.collect()[0][0] == pytest.approx(6.0 * ksum, rel=1e-12)
