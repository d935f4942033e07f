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


def _brute_local_moran(cells, contiguity="queen"):
    """Anselin 1995 randomization moments, full-matrix reference."""
    pts = {(x, y): float(v) for x, y, v in cells}
    keys = sorted(pts)
    n = len(keys)
    v = np.array([pts[k] for k in keys])
    z = v - v.mean()
    m2 = float((z**2).mean())
    b2 = float((z**4).mean()) / m2**2 if m2 > 0 else None
    offs = sps._offsets(contiguity)
    idx = {k: i for i, k in enumerate(keys)}
    out = {}
    for k, i in idx.items():
        nbs = [idx[(k[0] + dx, k[1] + dy)] for dx, dy in offs
               if (k[0] + dx, k[1] + dy) in idx]
        deg = len(nbs)
        lag = float(z[nbs].sum()) if nbs else 0.0
        li = z[i] / m2 * lag if m2 > 0 else None
        ei = -deg / (n - 1) if deg else None
        zi = None
        if deg and n > 2 and m2 > 0:
            var = (deg * (n - b2) / (n - 1)
                   + (deg * deg - deg) * (2 * b2 - n) / ((n - 1) * (n - 2))
                   - deg * deg / (n - 1) ** 2)
            if var > 0:
                zi = (li - ei) / math.sqrt(var)
        if deg == 0:
            quad = None
        elif z[i] >= 0:
            quad = "HH" if lag >= 0 else "HL"
        else:
            quad = "LL" if lag < 0 else "LH"
        out[k] = dict(deg=deg, lag=lag, local_i=li, z_i=zi, quadrant=quad)
    return out


def test_local_moran_matches_brute(spark):
    rng = np.random.default_rng(11)
    seen, cells = set(), []
    while len(cells) < 50:
        x, y = int(rng.integers(0, 12)), int(rng.integers(0, 12))
        if (x, y) in seen:
            continue
        seen.add((x, y))
        cells.append((x, y, float(rng.normal())))
    cells.append((30, 30, 1.0))  # island cell
    for cont in ("queen", "rook"):
        df = spark.createDataFrame(
            cells, "tile_x: long, tile_y: long, value: double")
        got = {(r["tile_x"], r["tile_y"]): r
               for r in sps.local_moran(df, contiguity=cont).collect()}
        ref = _brute_local_moran(cells, cont)
        assert set(got) == set(ref)
        for k, rr in ref.items():
            g = got[k]
            assert g["deg"] == rr["deg"]
            assert g["lag"] == pytest.approx(rr["lag"], abs=1e-9)
            assert g["local_i"] == pytest.approx(rr["local_i"], abs=1e-9)
            if rr["z_i"] is None:
                assert g["z_i"] is None
            else:
                assert g["z_i"] == pytest.approx(rr["z_i"], abs=1e-9)
            assert g["quadrant"] == rr["quadrant"]


def test_local_moran_hotspot_quadrants(spark):
    # a high plateau in a low field: interior plateau cells are HH,
    # surrounding low cells neighboring the plateau are LH
    cells = []
    for x in range(9):
        for y in range(9):
            v = 10.0 if 3 <= x <= 5 and 3 <= y <= 5 else 1.0
            cells.append((x, y, v))
    df = spark.createDataFrame(cells, "tile_x: long, tile_y: long, value: double")
    got = {(r["tile_x"], r["tile_y"]): r for r in sps.local_moran(df).collect()}
    assert got[(4, 4)]["quadrant"] == "HH"
    assert got[(4, 4)]["z_i"] > 2  # significant hotspot core
    assert got[(2, 4)]["quadrant"] == "LH"  # low cell touching the plateau
    assert got[(0, 0)]["quadrant"] == "LL"  # far-field low cell


def _brute_pairs(pts, max_dist):
    out = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            d2 = (pts[i][1] - pts[j][1]) ** 2 + (pts[i][2] - pts[j][2]) ** 2
            if 0 < d2 <= max_dist**2:
                out.append((min(pts[i][0], pts[j][0]),
                            max(pts[i][0], pts[j][0]), d2))
    return out


def test_point_pairs_exact(spark):
    rng = np.random.default_rng(5)
    pts = [(i, float(rng.uniform(0, 20)), float(rng.uniform(0, 20)))
           for i in range(120)]
    df = spark.createDataFrame(pts, "id: long, x: double, y: double")
    got = sorted((r["id_a"], r["id_b"], r["d2"])
                 for r in sps.point_pairs(df, max_dist=3.0).collect())
    ref = sorted(_brute_pairs(pts, 3.0))
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in ref]
    for g, r in zip(got, ref):
        assert g[2] == pytest.approx(r[2], rel=1e-12)


def test_variogram_matches_brute(spark):
    rng = np.random.default_rng(9)
    pts = [(i, float(rng.uniform(0, 30)), float(rng.uniform(0, 30)),
            float(rng.integers(0, 100)))
           for i in range(150)]
    df = spark.createDataFrame(pts, "id: long, x: double, y: double, value: double")
    bw, nb = 2.0, 5
    got = {r["bin"]: r for r in
           sps.empirical_variogram(df, bin_width=bw, n_bins=nb).collect()}
    # brute reference
    bins = {}
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            d = math.hypot(pts[i][1] - pts[j][1], pts[i][2] - pts[j][2])
            if 0 < d <= bw * nb:
                b = min(int(d // bw), nb - 1)
                s, c = bins.get(b, (0.0, 0))
                bins[b] = (s + (pts[i][3] - pts[j][3]) ** 2, c + 1)
    assert set(got) == set(bins)
    for b, (s, c) in bins.items():
        assert got[b]["n_pairs"] == c
        assert got[b]["gamma"] == pytest.approx(s / (2 * c), rel=1e-12)
        assert got[b]["h_lo"] == pytest.approx(b * bw)
        assert got[b]["h_hi"] == pytest.approx((b + 1) * bw)


def test_variogram_spatial_structure(spark):
    # value = x  =>  gamma grows with h (monotone spatial dependence)
    pts = [(i, float(i % 40), float(i // 40), float(i % 40))
           for i in range(400)]
    df = spark.createDataFrame(pts, "id: long, x: double, y: double, value: double")
    rows = sorted(sps.empirical_variogram(df, bin_width=2.0, n_bins=5).collect(),
                  key=lambda r: r["bin"])
    gammas = [r["gamma"] for r in rows]
    assert all(a < b for a, b in zip(gammas, gammas[1:]))


def test_ripley_k_csr_and_clustered(spark):
    rng = np.random.default_rng(4)
    # CSR pattern in a unit square: K(r) ~= pi r^2 (within noise)
    n = 400
    pts = [(i, float(rng.uniform()), float(rng.uniform())) for i in range(n)]
    df = spark.createDataFrame(pts, "id: long, x: double, y: double")
    radii = [0.05, 0.1]
    got = {r["r"]: r for r in sps.ripley_k(df, radii, area=1.0).collect()}
    # brute parity
    for rr in radii:
        cnt = sum(1 for i in range(n) for j in range(i + 1, n)
                  if 0 < (pts[i][1] - pts[j][1]) ** 2
                  + (pts[i][2] - pts[j][2]) ** 2 <= rr * rr)
        assert got[rr]["n_pairs"] == cnt
        k_ref = 1.0 * 2 * cnt / (n * (n - 1))
        assert got[rr]["k"] == pytest.approx(k_ref, rel=1e-12)
        assert got[rr]["l"] == pytest.approx(math.sqrt(k_ref / math.pi), rel=1e-12)
    # uncorrected CSR K is biased low near edges; just sanity-band it
    assert got[0.05]["k"] == pytest.approx(math.pi * 0.05**2, rel=0.35)
    # clustered pattern: same n, tight blobs => K far above CSR
    blob = [(i, float(0.2 + 0.01 * rng.normal()), float(0.2 + 0.01 * rng.normal()))
            for i in range(n)]
    dfb = spark.createDataFrame(blob, "id: long, x: double, y: double")
    kb = {r["r"]: r["k"] for r in sps.ripley_k(dfb, radii, area=1.0).collect()}
    assert kb[0.05] > 10 * got[0.05]["k"]


def test_cross_ripley_matches_brute(spark):
    rng = np.random.default_rng(21)
    n_a, n_b = 80, 60
    pa = [(float(rng.uniform(0, 10)), float(rng.uniform(0, 10)))
          for _ in range(n_a)]
    pb = [(float(rng.uniform(0, 10)), float(rng.uniform(0, 10)))
          for _ in range(n_b)]
    pb.append(pa[0])  # coincident coordinate must count
    da = spark.createDataFrame(pa, "x: double, y: double")
    db = spark.createDataFrame(pb, "x: double, y: double")
    radii = [0.8, 2.0]
    got = {r["r"]: r
           for r in sps.cross_ripley_k(da, db, radii, area=100.0).collect()}
    for rr in radii:
        cnt = sum(1 for ax, ay in pa for bx, by in pb
                  if (ax - bx) ** 2 + (ay - by) ** 2 <= rr * rr)
        assert got[rr]["n_pairs"] == cnt
        assert got[rr]["k"] == pytest.approx(
            100.0 * cnt / (n_a * (n_b + 1)), rel=1e-12)


def test_cross_ripley_colocation_signal(spark):
    rng = np.random.default_rng(22)
    # B sits on top of A (colocated) vs C far away (avoidance)
    pa = [(float(rng.uniform(0, 1)), float(rng.uniform(0, 1)))
          for _ in range(100)]
    pb = [(x + float(rng.normal(0, 0.01)), y + float(rng.normal(0, 0.01)))
          for x, y in pa]
    pc = [(x + 5.0, y) for x, y in pa]
    da = spark.createDataFrame(pa, "x: double, y: double")
    db = spark.createDataFrame(pb, "x: double, y: double")
    dc = spark.createDataFrame(pc, "x: double, y: double")
    k_ab = sps.cross_ripley_k(da, db, [0.02], area=1.0).collect()[0]["k"]
    k_ac = sps.cross_ripley_k(da, dc, [0.02], area=1.0).collect()[0]["k"]
    csr = math.pi * 0.02**2
    assert k_ab > 3 * csr   # strong colocation
    assert k_ac == 0.0      # complete avoidance at this scale


def test_idw_matches_brute(spark):
    rng = np.random.default_rng(6)
    known = [(float(rng.uniform(0, 10)), float(rng.uniform(0, 10)),
              float(rng.integers(0, 50))) for _ in range(80)]
    targets = [(float(rng.uniform(0, 10)), float(rng.uniform(0, 10)))
               for _ in range(40)]
    targets.append((known[0][0], known[0][1]))        # exact hit
    targets.append((200.0, 200.0))                    # out of range of all
    kdf = spark.createDataFrame(known, "x: double, y: double, value: double")
    tdf = spark.createDataFrame(targets, "x: double, y: double")
    radius, power = 2.5, 2.0
    got = {(r["x"], r["y"]): r for r in
           sps.idw_interpolate(kdf, tdf, power=power, radius=radius).collect()}
    assert len(got) == len(set(targets))
    for tx, ty in set(targets):
        hits = [(v, (tx - kx) ** 2 + (ty - ky) ** 2) for kx, ky, v in known
                if (tx - kx) ** 2 + (ty - ky) ** 2 <= radius**2]
        g = got[(tx, ty)]
        assert g["n_neighbors"] == len(hits)
        if not hits:
            assert g["predicted"] is None
            continue
        exact = [v for v, d2 in hits if d2 == 0]
        if exact:
            ref = sum(exact) / len(exact)
        else:
            wsum = sum(d2 ** (-power / 2) for _, d2 in hits)
            ref = sum(v * d2 ** (-power / 2) for v, d2 in hits) / wsum
        assert g["predicted"] == pytest.approx(ref, rel=1e-12)


def _brute_mk(series, alpha_z=1.959963984540054):
    """series: list of (t, v) for one cell."""
    series = sorted(series)
    n = len(series)
    s = 0
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            dv = series[j][1] - series[i][1]
            s += (dv > 0) - (dv < 0)
            slopes.append(dv / (series[j][0] - series[i][0]))
    from collections import Counter

    ties = Counter(v for _, v in series)
    tie_sum = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - tie_sum) / 18.0
    z = None
    if n >= 3 and var > 0:
        z = (s - 1) / math.sqrt(var) if s > 0 else (
            (s + 1) / math.sqrt(var) if s < 0 else 0.0)
    slope = float(np.median(slopes)) if slopes else None
    if z is None:
        trend = None
    elif z > alpha_z:
        trend = "increasing"
    elif z < -alpha_z:
        trend = "decreasing"
    else:
        trend = "none"
    return dict(n=n, s=s, z=z, slope=slope, trend=trend)


def test_mann_kendall_matches_brute(spark):
    rng = np.random.default_rng(13)
    rows = []
    cells = {}
    for cx in range(4):
        for cy in range(3):
            T = int(rng.integers(1, 15))
            ser = [(t, float(rng.integers(0, 8))) for t in range(T)]
            cells[(cx, cy)] = ser
            rows += [(cx, cy, t, v) for t, v in ser]
    df = spark.createDataFrame(rows, "tile_x: long, tile_y: long, t: long, value: double")
    got = {(r["tile_x"], r["tile_y"]): r
           for r in sps.mann_kendall_trend(df).collect()}
    assert set(got) == set(cells)
    for k, ser in cells.items():
        ref = _brute_mk(ser)
        g = got[k]
        assert g["n_periods"] == ref["n"]
        assert g["s"] == ref["s"]
        if ref["z"] is None:
            assert g["z"] is None
        else:
            assert g["z"] == pytest.approx(ref["z"], abs=1e-12)
        if ref["slope"] is None:
            assert g["slope"] is None
        else:
            assert g["slope"] == pytest.approx(ref["slope"], abs=1e-12)
        assert g["trend"] == ref["trend"]


def test_mann_kendall_known_trends(spark):
    rows = (
        # strictly increasing: z > 1.96, slope 2
        [(0, 0, t, 2.0 * t) for t in range(10)]
        # strictly decreasing
        + [(1, 0, t, -1.0 * t) for t in range(10)]
        # constant (all ties): var = 0 -> NULL z / trend
        + [(2, 0, t, 5.0) for t in range(10)]
        # single period
        + [(3, 0, 0, 1.0)]
    )
    df = spark.createDataFrame(rows, "tile_x: long, tile_y: long, t: long, value: double")
    got = {(r["tile_x"], r["tile_y"]): r
           for r in sps.mann_kendall_trend(df).collect()}
    assert got[(0, 0)]["trend"] == "increasing"
    assert got[(0, 0)]["s"] == 45 and got[(0, 0)]["slope"] == pytest.approx(2.0)
    assert got[(1, 0)]["trend"] == "decreasing"
    assert got[(2, 0)]["z"] is None and got[(2, 0)]["trend"] is None
    assert got[(3, 0)]["n_periods"] == 1 and got[(3, 0)]["s"] == 0
    assert got[(3, 0)]["slope"] is None


def _brute_krige(known, tx, ty, params, radius, k):
    """Reference OK solve with the same neighbor rule."""
    model, nug, sill, rng_ = (params["model"], params["nugget"],
                              params["sill"], params["range"])

    def gam(h):
        h = np.asarray(h, dtype=float)
        if model == "spherical":
            u = np.minimum(h / rng_, 1.0)
            g = nug + (sill - nug) * (1.5 * u - 0.5 * u**3)
        else:
            g = nug + (sill - nug) * (1.0 - np.exp(-3.0 * h / rng_))
        return np.where(h == 0.0, 0.0, g)

    cand = [(kx, ky, kv, (tx - kx) ** 2 + (ty - ky) ** 2)
            for kx, ky, kv in known
            if (tx - kx) ** 2 + (ty - ky) ** 2 <= radius**2]
    cand.sort(key=lambda s: (s[3], s[0], s[1]))
    nb = cand[:k]
    if not nb:
        return 0, None, None
    xs = np.array([s[0] for s in nb])
    ys = np.array([s[1] for s in nb])
    vs = np.array([s[2] for s in nb])
    m = len(nb)
    dd = np.sqrt((xs[:, None] - xs[None, :]) ** 2
                 + (ys[:, None] - ys[None, :]) ** 2)
    A = np.empty((m + 1, m + 1))
    A[:m, :m] = gam(dd)
    A[m, :m] = 1.0
    A[:m, m] = 1.0
    A[m, m] = 0.0
    g0 = gam(np.sqrt((xs - tx) ** 2 + (ys - ty) ** 2))
    b = np.append(g0, 1.0)
    sol = np.linalg.solve(A, b)
    return m, float(sol[:m] @ vs), float(max(sol[:m] @ g0 + sol[m], 0.0))


def test_variogram_fit_recovers_model(spark):
    # build a synthetic empirical variogram straight from a spherical
    # model and check the WLS fit recovers its parameters
    nug, sill, rng_ = 2.0, 10.0, 12.0
    rows = []
    for b in range(8):
        h = (b + 0.5) * 2.0
        u = min(h / rng_, 1.0)
        rows.append((b, b * 2.0, (b + 1) * 2.0, 1000,
                     nug + (sill - nug) * (1.5 * u - 0.5 * u**3)))
    df = spark.createDataFrame(
        rows, "bin: int, h_lo: double, h_hi: double, n_pairs: long, gamma: double")
    fit = sps.variogram_fit(df, model="spherical")
    assert fit["nugget"] == pytest.approx(nug, abs=0.3)
    assert fit["sill"] == pytest.approx(sill, abs=0.3)
    assert fit["range"] == pytest.approx(rng_, rel=0.15)


def test_krige_matches_brute_and_is_exact(spark):
    rng = np.random.default_rng(17)
    known = [(float(rng.uniform(0, 10)), float(rng.uniform(0, 10)),
              float(rng.normal(50, 10))) for _ in range(60)]
    targets = [(float(rng.uniform(0, 10)), float(rng.uniform(0, 10)))
               for _ in range(15)]
    targets.append((known[3][0], known[3][1]))   # exact known coordinate
    targets.append((500.0, 500.0))               # no neighbors
    params = {"model": "spherical", "nugget": 1.0, "sill": 8.0, "range": 4.0}
    kdf = spark.createDataFrame(known, "x: double, y: double, value: double")
    tdf = spark.createDataFrame(targets, "x: double, y: double")
    radius, kk = 3.0, 8
    got = {(r["x"], r["y"]): r for r in
           sps.ordinary_krige(kdf, tdf, params, radius=radius, k=kk).collect()}
    assert len(got) == len(set(targets))
    for tx, ty in set(targets):
        m, pred, var = _brute_krige(known, tx, ty, params, radius, kk)
        g = got[(tx, ty)]
        assert g["n_neighbors"] == m
        if m == 0:
            assert g["predicted"] is None
            continue
        assert g["predicted"] == pytest.approx(pred, rel=1e-9)
        assert g["variance"] == pytest.approx(var, rel=1e-9, abs=1e-9)
    # exactness: target on a known coordinate reproduces the value
    # with zero variance, nugget notwithstanding
    g = got[(known[3][0], known[3][1])]
    assert g["predicted"] == pytest.approx(known[3][2], rel=1e-9)
    assert g["variance"] == pytest.approx(0.0, abs=1e-9)


def test_krige_constant_field(spark):
    known = [(float(x), float(y), 7.0) for x in range(5) for y in range(5)]
    kdf = spark.createDataFrame(known, "x: double, y: double, value: double")
    tdf = spark.createDataFrame([(2.3, 2.7), (0.1, 3.9)], "x: double, y: double")
    params = {"model": "exponential", "nugget": 0.5, "sill": 3.0, "range": 2.0}
    out = sps.ordinary_krige(kdf, tdf, params, radius=2.0, k=6).collect()
    for r in out:
        # weights sum to 1, so a constant field predicts the constant
        assert r["predicted"] == pytest.approx(7.0, rel=1e-9)
        assert r["variance"] >= 0


def test_kde_mass_conserved(spark):
    # total output mass == total input mass * kernel sum (scatter form)
    rows = [(0, 0, 2.0), (5, 5, 3.0), (5, 6, 1.0)]
    df = spark.createDataFrame(rows, "tile_x: long, tile_y: long, value: double")
    radius, sigma = 2, 1.0
    ksum = sum(w for _, _, w in sps.kde_weights(radius, sigma))
    out = sps.kde_smooth(df, radius=radius, sigma=sigma).agg({"density": "sum"})
    assert out.collect()[0][0] == pytest.approx(6.0 * ksum, rel=1e-12)


# ---------------------------------------------------------------------------
# Getis-Ord Gi*
# ---------------------------------------------------------------------------


def _brute_gi_star(cells, contiguity="queen"):
    pts = {(x, y): float(v) for x, y, v in cells}
    keys = sorted(pts)
    n = len(keys)
    v = np.array([pts[k] for k in keys])
    mean = v.mean()
    s = math.sqrt(float((v * v).mean() - mean * mean))
    offs = sps._offsets(contiguity)
    idx = {k: i for i, k in enumerate(keys)}
    out = {}
    for (x, y), i in idx.items():
        nbrs = [idx[(x + dx, y + dy)] for dx, dy in offs
                if (x + dx, y + dy) in idx]
        wi = len(nbrs) + 1
        gsum = v[i] + sum(v[j] for j in nbrs)
        den2 = (n * wi - wi * wi) / (n - 1)
        if s == 0 or n <= 1 or den2 <= 0:
            out[(x, y)] = None
        else:
            out[(x, y)] = (gsum - mean * wi) / (s * math.sqrt(den2))
    return out


def test_getis_ord_matches_brute(spark):
    rng = np.random.default_rng(7)
    cells = []
    for x in range(8):
        for y in range(8):
            if rng.random() < 0.6:
                cells.append((x, y, float(rng.integers(0, 50))))
    df = spark.createDataFrame(cells, "tile_x: long, tile_y: long, value: double")
    for cont in ("queen", "rook"):
        got = {
            (r["tile_x"], r["tile_y"]): r["gi_star"]
            for r in sps.getis_ord(df, contiguity=cont).collect()
        }
        ref = _brute_gi_star(cells, cont)
        assert set(got) == set(ref)
        for k in ref:
            if ref[k] is None:
                assert got[k] is None
            else:
                assert got[k] == pytest.approx(ref[k], abs=1e-9), k


def test_getis_ord_hotspot_golden(spark):
    # 10x10 zeros with a 3x3 plateau of 100s: the plateau core must be a
    # significant hot spot, far-field flat cells significant cold spots
    cells = [(x, y, 100.0 if 3 <= x <= 5 and 3 <= y <= 5 else 0.0)
             for x in range(10) for y in range(10)]
    df = spark.createDataFrame(cells, "tile_x: long, tile_y: long, value: double")
    got = {(r["tile_x"], r["tile_y"]): r["gi_star"]
           for r in sps.getis_ord(df).collect()}
    assert got[(4, 4)] > 2.5          # plateau core: hot
    assert got[(0, 0)] < 0            # far field: below the mean
    # Gi* vs LISA disagreement case: the plateau core is HH for LISA and
    # hot for Gi* — but a zero cell bordering the plateau has a HIGH
    # local sum (hot-ish Gi*) while LISA calls it LH
    assert got[(2, 4)] > got[(0, 0)]


def test_getis_ord_constant_null(spark):
    cells = [(x, y, 5.0) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(cells, "tile_x: long, tile_y: long, value: double")
    assert all(r["gi_star"] is None for r in sps.getis_ord(df).collect())


# ---------------------------------------------------------------------------
# join counts
# ---------------------------------------------------------------------------


def _brute_join_counts(cells, contiguity="queen"):
    pts = {(x, y): int(v) for x, y, v in cells}
    offs = sps._offsets(contiguity)
    bb = bw = ww = m = 0
    for (x, y), v in pts.items():
        for dx, dy in offs:
            nb = pts.get((x + dx, y + dy))
            if nb is None:
                continue
            m += 1
            if v and nb:
                bb += 1
            elif not v and not nb:
                ww += 1
            else:
                bw += 1
    return m // 2, bb // 2, bw // 2, ww // 2


def test_join_counts_exact(spark):
    rng = np.random.default_rng(11)
    cells = []
    for x in range(7):
        for y in range(7):
            if rng.random() < 0.7:
                cells.append((x, y, float(rng.integers(0, 2))))
    df = spark.createDataFrame(cells, "tile_x: long, tile_y: long, value: double")
    for cont in ("queen", "rook"):
        r = sps.join_counts(df, contiguity=cont).collect()[0]
        m, bb, bw, ww = _brute_join_counts(cells, cont)
        assert (r["joins"], r["bb"], r["bw"], r["ww"]) == (m, bb, bw, ww)
        assert r["n1"] == sum(1 for _, _, v in cells if v)


def test_join_counts_moments_exact_enumeration(spark):
    """The derived E[BW] / Var[BW] formulas pinned EXACTLY against full
    2^n enumeration of every coloring of a 3x3 rook grid at known p."""
    p = 0.3
    coords = [(x, y) for x in range(3) for y in range(3)]
    offs = sps._offsets("rook")
    joins = []
    cset = set(coords)
    for i, (x, y) in enumerate(coords):
        for dx, dy in offs:
            nb = (x + dx, y + dy)
            if nb in cset and coords.index(nb) > i:
                joins.append((i, coords.index(nb)))
    e_bw = var_acc = 0.0
    probs = []
    bws = []
    for mask in range(1 << len(coords)):
        bits = [(mask >> i) & 1 for i in range(len(coords))]
        prob = 1.0
        for b in bits:
            prob *= p if b else (1 - p)
        bw = sum(1 for i, j in joins if bits[i] != bits[j])
        probs.append(prob)
        bws.append(bw)
    e_bw = sum(pr * b for pr, b in zip(probs, bws))
    e_bw2 = sum(pr * b * b for pr, b in zip(probs, bws))
    var_bw = e_bw2 - e_bw * e_bw
    cells = [(x, y, float((x + y) % 2)) for x, y in coords]  # any coloring
    df = spark.createDataFrame(cells, "tile_x: long, tile_y: long, value: double")
    r = sps.join_counts(df, contiguity="rook", p=p).collect()[0]
    assert r["e_bw"] == pytest.approx(e_bw, abs=1e-12)
    assert r["var_bw"] == pytest.approx(var_bw, abs=1e-12)


def test_join_counts_signal(spark):
    # two solid halves: far fewer BW joins than chance -> z strongly neg
    half = [(x, y, 1.0 if x < 5 else 0.0) for x in range(10) for y in range(10)]
    df = spark.createDataFrame(half, "tile_x: long, tile_y: long, value: double")
    r = sps.join_counts(df, contiguity="rook").collect()[0]
    assert r["z_bw"] < -3
    # checkerboard: every rook join is discordant -> z strongly positive
    cb = [(x, y, float((x + y) % 2)) for x in range(10) for y in range(10)]
    df2 = spark.createDataFrame(cb, "tile_x: long, tile_y: long, value: double")
    r2 = sps.join_counts(df2, contiguity="rook").collect()[0]
    assert r2["bw"] == r2["joins"]
    assert r2["z_bw"] > 3


# ---------------------------------------------------------------------------
# centrography
# ---------------------------------------------------------------------------


def _brute_centrography(pts, w=None):
    a = np.asarray(pts, dtype=float)
    wv = np.ones(len(a)) if w is None else np.asarray(w, dtype=float)
    ws = wv.sum()
    mx, my = (wv * a[:, 0]).sum() / ws, (wv * a[:, 1]).sum() / ws
    sxx = (wv * a[:, 0] ** 2).sum() / ws - mx * mx
    syy = (wv * a[:, 1] ** 2).sum() / ws - my * my
    sxy = (wv * a[:, 0] * a[:, 1]).sum() / ws - mx * my
    tr = sxx + syy
    d = math.sqrt((sxx - syy) ** 2 / 4 + sxy * sxy)
    return dict(
        mean_x=mx, mean_y=my, std_distance=math.sqrt(tr),
        sigma_x=math.sqrt(2 * (tr / 2 + d)),
        sigma_y=math.sqrt(2 * max(tr / 2 - d, 0.0)),
        theta=math.atan2(2 * sxy, sxx - syy) / 2,
    )


def test_centrography_matches_brute(spark):
    rng = np.random.default_rng(3)
    pts = [(float(x), float(y)) for x, y in rng.normal(0, 10, (200, 2))]
    wts = [float(w) for w in rng.integers(1, 9, 200)]
    df = spark.createDataFrame(
        [(x, y, w) for (x, y), w in zip(pts, wts)], "x: double, y: double, w: double"
    )
    got = sps.centrography(df).collect()[0]
    ref = _brute_centrography(pts)
    for k in ("mean_x", "mean_y", "std_distance", "sigma_x", "sigma_y", "theta"):
        assert got[k] == pytest.approx(ref[k], abs=1e-9), k
    gotw = sps.centrography(df, weight_col="w").collect()[0]
    refw = _brute_centrography(pts, wts)
    for k in ("mean_x", "mean_y", "std_distance", "sigma_x", "sigma_y", "theta"):
        assert gotw[k] == pytest.approx(refw[k], abs=1e-9), k
    assert gotw["w_sum"] == pytest.approx(sum(wts))


def test_centrography_ellipse_golden(spark):
    # points on the y = x line: major axis at 45 degrees, minor ~ 0
    pts = [(float(t), float(t)) for t in range(-10, 11)]
    df = spark.createDataFrame(pts, "x: double, y: double")
    r = sps.centrography(df).collect()[0]
    assert r["theta"] == pytest.approx(math.pi / 4, abs=1e-9)
    assert r["sigma_y"] == pytest.approx(0.0, abs=1e-6)
    assert r["mean_x"] == pytest.approx(0.0)
    # rotate to y = -x: theta flips to -45 degrees
    df2 = spark.createDataFrame([(x, -y) for x, y in pts], "x: double, y: double")
    r2 = sps.centrography(df2).collect()[0]
    assert r2["theta"] == pytest.approx(-math.pi / 4, abs=1e-9)
