"""STR-packed R-tree (plans/rtree.py) + the pip_join index dispatch."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.plans.rtree import STRtree


def _rand_boxes(n, seed):
    rng = np.random.RandomState(seed)
    x0 = rng.uniform(-170, 160, n)
    y0 = rng.uniform(-80, 70, n)
    return np.stack([x0, y0, x0 + rng.uniform(0.5, 15, n),
                     y0 + rng.uniform(0.5, 12, n)], axis=1)


class TestSTRtree:
    def test_structure_invariants(self):
        boxes = _rand_boxes(500, 3)
        t = STRtree(boxes, fanout=8)
        # every level's node bbox contains all its children's bboxes;
        # child ranges PARTITION the level below (contiguous per node,
        # order permuted by the upper packing passes)
        below = boxes[t.entry_order]
        for bb, cs, cc in t.levels:
            covered = np.concatenate(
                [np.arange(cs[i], cs[i] + cc[i]) for i in range(len(bb))])
            assert sorted(covered.tolist()) == list(range(len(below)))
            for i in range(len(bb)):
                ch = below[cs[i]: cs[i] + cc[i]]
                assert (ch[:, 0] >= bb[i, 0]).all() and (ch[:, 1] >= bb[i, 1]).all()
                assert (ch[:, 2] <= bb[i, 2]).all() and (ch[:, 3] <= bb[i, 3]).all()
            below = bb
        assert len(t.levels[-1][0]) == 1  # single root

    def test_query_matches_bruteforce(self):
        boxes = _rand_boxes(300, 7)
        t = STRtree(boxes, fanout=16)
        rng = np.random.RandomState(11)
        px = rng.uniform(-180, 180, 2000)
        py = rng.uniform(-85, 85, 2000)
        pts, ents = t.query_pairs(px, py)
        got = set(zip(pts.tolist(), ents.tolist()))
        want = set()
        for j in range(len(boxes)):
            m = ((px >= boxes[j, 0]) & (px <= boxes[j, 2])
                 & (py >= boxes[j, 1]) & (py <= boxes[j, 3]))
            want |= {(int(i), j) for i in np.flatnonzero(m)}
        assert got == want
        # sorted by (point, entry)
        assert (np.diff(pts) >= 0).all()

    def test_single_and_tiny(self):
        t = STRtree(np.array([[0.0, 0.0, 1.0, 1.0]]))
        pts, ents = t.query_pairs(np.array([0.5, 2.0]), np.array([0.5, 0.5]))
        assert pts.tolist() == [0] and ents.tolist() == [0]
        with pytest.raises(ValueError):
            STRtree(np.empty((0, 4)))
        with pytest.raises(ValueError):
            STRtree(np.array([[0.0, 0.0, 1.0, 1.0]]), fanout=1)

    def test_empty_query(self):
        t = STRtree(_rand_boxes(10, 1))
        pts, ents = t.query_pairs(np.array([]), np.array([]))
        assert len(pts) == 0 and len(ents) == 0


def _poly_grid(n_side, w=3.0, h=2.5, gap=0.2):
    """n_side^2 rectangles tiling lon/lat space, zone ids 0..n^2-1."""
    polys = {}
    z = 0
    for iy in range(n_side):
        for ix in range(n_side):
            x0 = -170 + ix * (w + gap)
            y0 = -75 + iy * (h + gap)
            polys[z] = np.array([[x0, y0], [x0 + w, y0],
                                 [x0 + w, y0 + h], [x0, y0 + h]])
            z += 1
    return polys


class TestPipIndexDispatch:
    def test_rtree_equals_grid_assignments(self, spark):
        from xarray_spatial_spark.operators.pip import pip_join

        polys = _poly_grid(10)  # 100 polygons -> many-polygons path
        rng = np.random.RandomState(5)
        pts = [(i, float(lon), float(lat)) for i, (lon, lat) in enumerate(
            zip(rng.uniform(-172, -130, 800), rng.uniform(-77, -40, 800)))]
        df = spark.createDataFrame(pts, "id long, lon double, lat double")
        a = {r["id"]: r["zone"] for r in
             pip_join(df, polys, index="grid").collect()}
        b = {r["id"]: r["zone"] for r in
             pip_join(df, polys, index="rtree").collect()}
        assert a == b
        assert any(v is not None for v in a.values())

    def test_auto_routes_elongated_bboxes_to_rtree(self):
        from xarray_spatial_spark.operators.pip import PolygonSet

        # dateline-spanning slivers: each bbox rasterizes onto a whole
        # cell row at zoom 6 -> auto must pick the R-tree
        polys = {z: np.array([[-179.0, z * 0.5], [179.0, z * 0.5],
                              [179.0, z * 0.5 + 0.1], [-179.0, z * 0.5 + 0.1]])
                 for z in range(80)}
        ps = PolygonSet(polys, index="auto")
        assert ps.method == "rtree"
        compact = PolygonSet(_poly_grid(5), index="auto")
        assert compact.method == "grid"

    def test_rtree_first_match_ascending_zone(self, spark):
        from xarray_spatial_spark.operators.pip import pip_join

        # 70 overlapping squares sharing a corner region: the LOWEST
        # zone id containing the point must win, same as the grid path
        polys = {z: np.array([[0.0, 0.0], [10.0 + z * 0.01, 0.0],
                              [10.0 + z * 0.01, 10.0], [0.0, 10.0]])
                 for z in range(70)}
        df = spark.createDataFrame([(0, 5.0, 5.0)], "id long, lon double, lat double")
        out = pip_join(df, polys, index="rtree").collect()
        assert out[0]["zone"] == 0.0
