"""Vector-geometry tier (operators/geometry.py): Catalyst ring metrics,
WKT/WKB codecs, distributed convex hull, Douglas-Peucker, tile clipping.

Reference anchor: xrspatial/experimental/polygonize.py produces vector
rings from rasters; this tier consumes/produces the same ring shape at
corpus scale.  Correctness oracles here are numpy brute force (hull:
O(n*h) containment sweep; metrics: direct shoelace; DP: recursive
reference implementation; clip: conservation + hand geometry).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.operators import geometry as G


def _ring_df(spark, rings):
    rows = [(i, [float(x) for x, _ in r], [float(y) for _, y in r])
            for i, r in enumerate(rings)]
    return spark.createDataFrame(
        rows, "geom_id long, xs array<double>, ys array<double>")


# ---------------------------------------------------------------- metrics

def test_ring_metrics_square(spark):
    df = _ring_df(spark, [[(0, 0), (2, 0), (2, 3), (0, 3)]])
    r = df.select(
        G.ring_area().alias("a"), G.ring_perimeter().alias("p"),
        G.ring_centroid_x().alias("cx"), G.ring_centroid_y().alias("cy"),
    ).collect()[0]
    assert (r.a, r.p, r.cx, r.cy) == (6.0, 10.0, 1.0, 1.5)


def test_ring_metrics_cw_is_negative(spark):
    df = _ring_df(spark, [[(0, 0), (0, 1), (1, 1), (1, 0)]])
    assert df.select(G.ring_area().alias("a")).collect()[0].a == -1.0


def test_ring_metrics_vs_numpy_random(spark):
    rng = np.random.default_rng(7)
    rings = [[(float(x), float(y)) for x, y in rng.normal(size=(12, 2))]
             for _ in range(20)]
    out = (_ring_df(spark, rings)
           .select("geom_id", G.ring_area().alias("a"),
                   G.ring_perimeter().alias("p"))
           .orderBy("geom_id").collect())
    for i, ring in enumerate(rings):
        xs = np.array([p[0] for p in ring])
        ys = np.array([p[1] for p in ring])
        a = 0.5 * (np.dot(xs, np.roll(ys, -1)) - np.dot(np.roll(xs, -1), ys))
        per = float(np.sum(np.hypot(np.diff(np.r_[xs, xs[0]]),
                                    np.diff(np.r_[ys, ys[0]]))))
        assert out[i].a == pytest.approx(a, rel=1e-12)
        assert out[i].p == pytest.approx(per, rel=1e-12)


def test_rings_from_points_order_restored(spark):
    # vertices delivered out of order; array_sort on (seq) restores them
    rows = [(5, 2, 2.0, 3.0), (5, 0, 0.0, 0.0), (5, 1, 2.0, 0.0),
            (5, 3, 0.0, 3.0)]
    df = spark.createDataFrame(rows, "geom_id long, seq int, x double, y double")
    out = G.rings_from_points(df).collect()[0]
    assert out.xs == [0.0, 2.0, 2.0, 0.0] and out.ys == [0.0, 0.0, 3.0, 3.0]


# ----------------------------------------------------------------- codecs

def test_wkt_roundtrip_bit_exact(spark):
    rng = np.random.default_rng(3)
    rings = [[(float(x), float(y)) for x, y in rng.normal(size=(8, 2)) * 1e3]
             for _ in range(10)]
    rings.append([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0)])  # integral formatting
    df = _ring_df(spark, rings)
    back = G.from_wkt(G.to_wkt(df)).orderBy("geom_id").collect()
    for i, ring in enumerate(rings):
        assert back[i].xs == [p[0] for p in ring]  # bit-exact doubles
        assert back[i].ys == [p[1] for p in ring]


def test_wkt_shape(spark):
    df = _ring_df(spark, [[(0, 0), (2, 0), (2, 3), (0, 3)]])
    w = G.to_wkt(df).collect()[0].wkt
    assert w == "POLYGON ((0 0, 2 0, 2 3, 0 3, 0 0))"  # closed, int fmt


def test_wkb_roundtrip_and_layout(spark):
    rng = np.random.default_rng(4)
    rings = [[(float(x), float(y)) for x, y in rng.normal(size=(5, 2))]]
    df = _ring_df(spark, rings)
    enc = G.to_wkb(df).collect()[0].wkb
    # little-endian, type 3 (Polygon), 1 ring, n+1 points
    assert enc[0] == 1 and enc[1:5] == b"\x03\x00\x00\x00"
    assert int.from_bytes(enc[9:13], "little") == 6
    back = G.from_wkb(G.to_wkb(df)).collect()[0]
    assert back.xs == [p[0] for p in rings[0]]
    assert back.ys == [p[1] for p in rings[0]]


def test_wkb_rejects_foreign_header(spark):
    # big-endian marker, type 2 (LineString): full-length but foreign
    df = spark.createDataFrame(
        [(1, bytearray(b"\x00" + b"\x02\x00\x00\x00" + b"\x01\x00\x00\x00"
                       + b"\x00" * 8))],
        "geom_id long, wkb binary")
    with pytest.raises(Exception, match="unsupported WKB header"):
        G.from_wkb(df).collect()


# ------------------------------------------------------------------- hull

def _brute_hull_contains(hull_xy: np.ndarray, pts: np.ndarray) -> bool:
    n = len(hull_xy)
    for i in range(n):
        a, b = hull_xy[i], hull_xy[(i + 1) % n]
        cross = ((b[0] - a[0]) * (pts[:, 1] - a[1])
                 - (b[1] - a[1]) * (pts[:, 0] - a[0]))
        if (cross < -1e-9).any():
            return False
    return True


def test_convex_hull_exact_vs_brute(spark):
    rng = np.random.default_rng(11)
    pts = rng.normal(size=(4000, 2)) * np.array([3.0, 1.0])
    df = spark.createDataFrame(
        pd.DataFrame({"x": pts[:, 0], "y": pts[:, 1]})).repartition(7)
    h = G.convex_hull(df).orderBy("seq").toPandas()
    hv = h[["x", "y"]].to_numpy()
    assert _brute_hull_contains(hv, pts)
    # every hull vertex IS an input point (no fabricated coordinates)
    keys = {(x, y) for x, y in pts}
    assert all((x, y) in keys for x, y in hv)
    # CCW orientation, starts at lexicographic min
    area2 = np.dot(hv[:, 0], np.roll(hv[:, 1], -1)) - \
        np.dot(np.roll(hv[:, 0], -1), hv[:, 1])
    assert area2 > 0
    assert tuple(hv[0]) == tuple(min(map(tuple, hv)))


def test_convex_hull_partition_invariance(spark):
    rng = np.random.default_rng(12)
    pts = rng.uniform(size=(1000, 2))
    pdf = pd.DataFrame({"x": pts[:, 0], "y": pts[:, 1]})
    h1 = G.convex_hull(spark.createDataFrame(pdf).repartition(1)).toPandas()
    h9 = G.convex_hull(spark.createDataFrame(pdf).repartition(9)).toPandas()
    assert h1.values.tolist() == h9.values.tolist()


def test_convex_hull_reduction_rounds(spark):
    # all points in convex position: candidates stay O(n); the guard
    # re-hulls then collects once under the (tiny) cap's multiple
    t = np.linspace(0, 2 * np.pi, 200, endpoint=False)
    pdf = pd.DataFrame({"x": np.cos(t), "y": np.sin(t)})
    df = spark.createDataFrame(pdf).repartition(8)
    h = G.convex_hull(df, max_candidates=500).toPandas()
    assert len(h) == 200  # circle points: all on hull


def test_convex_hull_degenerate(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0)], "x double, y double")
    h = G.convex_hull(df).toPandas()  # collinear -> 2-point hull (or 3 dedup'd)
    assert len(h) <= 3


# --------------------------------------------------------------------- DP

def _dp_reference(xs, ys, eps):
    """Recursive textbook DP for cross-checking the iterative kernel."""
    def rec(a, b):
        if b - a < 2:
            return []
        ax, ay, bx, by = xs[a], ys[a], xs[b], ys[b]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        best, bi = -1.0, -1
        for i in range(a + 1, b):
            if seg2 == 0:
                d2 = (xs[i] - ax) ** 2 + (ys[i] - ay) ** 2
            else:
                tt = max(0.0, min(1.0, ((xs[i] - ax) * dx + (ys[i] - ay) * dy) / seg2))
                d2 = (xs[i] - (ax + tt * dx)) ** 2 + (ys[i] - (ay + tt * dy)) ** 2
            if d2 > best:
                best, bi = d2, i
        if best > eps * eps:
            return rec(a, bi) + [bi] + rec(bi, b)
        return []
    return [0] + rec(0, len(xs) - 1) + [len(xs) - 1]


def test_simplify_matches_reference(spark):
    rng = np.random.default_rng(21)
    t = np.linspace(0, 2 * np.pi, 60, endpoint=False)
    xs = np.cos(t) + rng.normal(scale=0.01, size=60)
    ys = np.sin(t) + rng.normal(scale=0.01, size=60)
    df = _ring_df(spark, [list(zip(xs, ys))])
    out = G.simplify_dp(df, 0.05).collect()[0]
    keep = _dp_reference(xs, ys, 0.05)
    assert out.xs == [float(xs[i]) for i in keep]
    assert out.ys == [float(ys[i]) for i in keep]
    assert len(out.xs) < 60  # actually simplified


def test_simplify_keeps_endpoints_and_small_rings(spark):
    df = _ring_df(spark, [[(0, 0), (1, 0), (1, 1)]])
    out = G.simplify_dp(df, 10.0).collect()[0]
    assert len(out.xs) == 3  # triangles pass through untouched


# ------------------------------------------------------------------- clip

def test_clip_exact_rectangle(spark):
    # 2x3 rect clipped by 1x1 tiles -> 6 unit tiles, each area 1
    df = _ring_df(spark, [[(0, 0), (2, 0), (2, 3), (0, 3)]])
    out = G.clip_to_tiles(df, 1.0).orderBy("tile_x", "tile_y").collect()
    assert len(out) == 6
    assert all(r.area == 1.0 for r in out)
    assert {(r.tile_x, r.tile_y) for r in out} == \
        {(x, y) for x in (0, 1) for y in (0, 1, 2)}


def test_clip_conservation_concave(spark):
    # concave L-shape + random stars: per-tile areas sum to ring area
    rng = np.random.default_rng(31)
    rings = [[(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3)]]
    for _ in range(10):
        t = np.sort(rng.uniform(0, 2 * np.pi, size=14))
        r = rng.uniform(0.5, 2.0, size=14)
        cx, cy = rng.uniform(-3, 3, size=2)
        rings.append(list(zip(cx + r * np.cos(t), cy + r * np.sin(t))))
    df = _ring_df(spark, rings)
    tot = (G.clip_to_tiles(df, 0.7)
           .groupBy("geom_id").agg(F.sum("area").alias("s"))
           .orderBy("geom_id").collect())
    areas = {r.geom_id: r.s for r in tot}
    for i, ring in enumerate(rings):
        xs = np.array([p[0] for p in ring])
        ys = np.array([p[1] for p in ring])
        a = 0.5 * (np.dot(xs, np.roll(ys, -1)) - np.dot(np.roll(xs, -1), ys))
        assert areas[i] == pytest.approx(a, rel=1e-9), f"ring {i}"


def test_clip_negative_coords_and_guard(spark):
    df = _ring_df(spark, [[(-1.5, -1.5), (0.5, -1.5), (0.5, 0.5), (-1.5, 0.5)]])
    out = G.clip_to_tiles(df, 1.0).collect()
    assert sum(r.area for r in out) == pytest.approx(4.0)
    with pytest.raises(Exception, match="max_tiles_per_ring"):
        G.clip_to_tiles(df, 0.01, max_tiles_per_ring=10).collect()


def test_clip_tile_pieces_are_valid_rings(spark):
    # clipped pieces feed back into the Catalyst metrics: area column
    # agrees with ring_area over the emitted xs/ys
    df = _ring_df(spark, [[(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3)]])
    out = G.clip_to_tiles(df, 1.0)
    chk = out.select("area", G.ring_area().alias("a2")).collect()
    for r in chk:
        assert r.area == pytest.approx(r.a2, rel=1e-12)


# --------------------------------------------------------------- pip_join

def _brute_pip_pairs(pts, rings):
    """Even-odd test in the SAME division-free cross-multiplied form as
    pip_crossings (borderline pairs must agree bit-for-bit)."""
    out = set()
    for pid, px, py in pts:
        for gid, xs, ys in rings:
            xs = np.asarray(xs); ys = np.asarray(ys)
            x2 = np.roll(xs, -1); y2 = np.roll(ys, -1)
            straddle = (ys > py) != (y2 > py)
            d = (px - xs) * (y2 - ys) - (py - ys) * (x2 - xs)
            cross = int(np.sum(straddle & np.where(y2 > ys, d < 0, d > 0)))
            if cross % 2 == 1:
                out.add((pid, gid))
    return out


def _random_geometry(seed, n_pts=300, n_rings=12):
    rng = np.random.default_rng(seed)
    pts = [(i, float(x), float(y))
           for i, (x, y) in enumerate(rng.uniform(-10, 10, size=(n_pts, 2)))]
    rings = []
    for g in range(n_rings):
        t = np.sort(rng.uniform(0, 2 * np.pi, size=rng.integers(5, 12)))
        r = rng.uniform(0.5, 4.0, size=len(t))
        cx, cy = rng.uniform(-8, 8, size=2)
        rings.append((g, [float(v) for v in cx + r * np.cos(t)],
                      [float(v) for v in cy + r * np.sin(t)]))
    return pts, rings


def test_pip_join_matches_brute(spark):
    pts, rings = _random_geometry(41)
    pdf = spark.createDataFrame(pts, "doc_id long, x double, y double")
    rdf = spark.createDataFrame(rings,
                                "geom_id long, xs array<double>, ys array<double>")
    got = {(r.doc_id, r.geom_id)
           for r in G.pip_join(pdf, rdf, tile_size=2.0).collect()}
    want = _brute_pip_pairs(pts, rings)
    assert got == want and len(want) > 50


def test_pip_join_tile_size_invariance(spark):
    pts, rings = _random_geometry(42)
    pdf = spark.createDataFrame(pts, "doc_id long, x double, y double")
    rdf = spark.createDataFrame(rings,
                                "geom_id long, xs array<double>, ys array<double>")
    a = sorted(map(tuple, G.pip_join(pdf, rdf, tile_size=0.9).collect()))
    b = sorted(map(tuple, G.pip_join(pdf, rdf, tile_size=3.7).collect()))
    assert a == b


def test_pip_join_is_pure_jvm(spark):
    # no Python eval stage anywhere in the join plan: the ray-cast is a
    # Catalyst fold and the cover is sequence-explode
    pts, rings = _random_geometry(43, n_pts=50, n_rings=3)
    pdf = spark.createDataFrame(pts, "doc_id long, x double, y double")
    rdf = spark.createDataFrame(rings,
                                "geom_id long, xs array<double>, ys array<double>")
    plan = G.pip_join(pdf, rdf, tile_size=2.0)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan


def test_polygon_tile_cover_guard(spark):
    rdf = spark.createDataFrame(
        [(0, [0.0, 100.0, 100.0, 0.0], [0.0, 0.0, 100.0, 100.0])],
        "geom_id long, xs array<double>, ys array<double>")
    with pytest.raises(Exception, match="max_tiles_per_ring"):
        G.polygon_tile_cover(rdf, 1.0, max_tiles_per_ring=100).collect()
    # under the cap it emits exactly the bbox cover
    ok = G.polygon_tile_cover(rdf, 50.0, max_tiles_per_ring=100)
    assert ok.count() == 9  # 3x3 tiles (bbox [0,100] spans tiles 0,1,2)
