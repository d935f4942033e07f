"""Link geography: OD matrix vs a Python replay; gravity OLS vs
numpy lstsq on the identical rows; parameter recovery on flows
generated from a known gravity law."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.functions import linkgeo

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


def _center(x, y, zoom):
    n = 1 << zoom
    lon = (x + 0.5) / n * 360.0 - 180.0
    t = math.pi * (1 - 2 * (y + 0.5) / n)
    lat = math.degrees(math.atan(math.sinh(t)))
    return lon, lat


def _hav(lon1, lat1, lon2, lat2):
    r1, r2 = math.radians(lat1), math.radians(lat2)
    a = (math.sin((r2 - r1) / 2) ** 2
         + math.cos(r1) * math.cos(r2)
         * math.sin((math.radians(lon2) - math.radians(lon1)) / 2) ** 2)
    return 2 * 6378137.0 * math.asin(math.sqrt(a))


def test_od_matrix_matches_replay(spark):
    rng = np.random.default_rng(4)
    locs = [(i, float(lon), float(lat)) for i, (lon, lat) in enumerate(
        rng.uniform([-170, -80], [170, 80], size=(60, 2)))]
    edges = [(int(a), int(b)) for a, b in
             rng.integers(0, 60, size=(400, 2))]
    ldf = spark.createDataFrame(locs, "id long, lon double, lat double")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.src_x, r.src_y, r.dst_x, r.dst_y): (r.flow, r.dist_m)
           for r in linkgeo.od_matrix(edf, ldf, zoom=4).collect()}
    exp = {}
    tile = {i: _tile(lon, lat, 4) for i, lon, lat in locs}
    for a, b in edges:
        key = tile[a] + tile[b]
        exp[key] = exp.get(key, 0) + 1
    assert {k: v for k, (v, _) in got.items()} == exp
    for (sx, sy, dx, dy), (_, dist) in got.items():
        e = _hav(*_center(sx, sy, 4), *_center(dx, dy, 4))
        assert abs(dist - e) < 1e-6 * max(1.0, e)


def test_gravity_fit_equals_numpy_lstsq(spark):
    rng = np.random.default_rng(9)
    locs = [(i, float(lon), float(lat)) for i, (lon, lat) in enumerate(
        rng.uniform([-60, -40], [60, 40], size=(40, 2)))]
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 40, size=(600, 2))]
    ldf = spark.createDataFrame(locs, "id long, lon double, lat double")
    edf = spark.createDataFrame(edges, "src long, dst long")
    od = linkgeo.od_matrix(edf, ldf, zoom=3)
    fit = linkgeo.gravity_fit(od)

    pdf = od.toPandas()
    o = pdf.groupby(["src_x", "src_y"])["flow"].transform("sum")
    d = pdf.groupby(["dst_x", "dst_y"])["flow"].transform("sum")
    m = pdf["dist_m"] >= 1.0
    X = np.column_stack([
        np.ones(m.sum()), np.log(o[m]), np.log(d[m]),
        np.log(pdf["dist_m"][m])])
    y = np.log(pdf["flow"][m].astype(float))
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert abs(fit["intercept"] - beta[0]) < 1e-7
    assert abs(fit["ln_origin"] - beta[1]) < 1e-7
    assert abs(fit["ln_dest"] - beta[2]) < 1e-7
    assert abs(fit["ln_dist"] - beta[3]) < 1e-7
    assert fit["n"] == int(m.sum())
    resid = y - X @ beta
    r2 = 1 - resid @ resid / ((y - y.mean()) @ (y - y.mean()))
    assert abs(fit["r2"] - r2) < 1e-7


def test_gravity_recovers_known_decay(spark):
    # flows generated FROM a gravity law with decay c=2: the fit must
    # recover the exponent (deterministic construction, no noise)
    rng = np.random.default_rng(21)
    pts = rng.uniform([-40, -30], [40, 30], size=(25, 2))
    zoom = 5
    cells = sorted({_tile(lon, lat, zoom) for lon, lat in pts})
    rows = []
    for i, a in enumerate(cells):
        for j, b in enumerate(cells):
            if a == b:
                continue
            dist = _hav(*_center(*a, zoom), *_center(*b, zoom))
            flow = 1e13 * (i + 2) * (j + 2) / dist**2
            rows.append((a[0], a[1], b[0], b[1], int(max(1, round(flow))),
                         float(dist)))
    od = spark.createDataFrame(
        rows, "src_x long, src_y long, dst_x long, dst_y long, "
              "flow long, dist_m double")
    fit = linkgeo.gravity_fit(od)
    # masses are endogenous marginals, so coefficients shift, but the
    # distance-decay sign and magnitude must be recovered
    assert fit["ln_dist"] < -1.0
    assert fit["r2"] > 0.8


def test_min_rows_guard(spark):
    od = spark.createDataFrame(
        [(0, 0, 1, 1, 5, 1000.0)],
        "src_x long, src_y long, dst_x long, dst_y long, "
        "flow long, dist_m double")
    with pytest.raises(ValueError, match=">= 5"):
        linkgeo.gravity_fit(od)
