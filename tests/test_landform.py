"""TPI landform classification: scalar-loop reference parity, terrain
goldens, the flat/mid_slope gate, isolated cells, nodata."""

import numpy as np
import pandas as pd

from xarray_spatial_spark.operators.spatialstats import tpi_landform


def ref_landform(pts: dict, radius=2, flat_eps=1.0) -> dict:
    """pts: {(x, y): z} sparse field; returns {(x, y): (tpi, cls)}."""
    tpis, drops = {}, {}
    for (x, y), z in pts.items():
        nbs = [pts[(x + dx, y + dy)]
               for dx in range(-radius, radius + 1)
               for dy in range(-radius, radius + 1)
               if (dx, dy) != (0, 0) and (x + dx, y + dy) in pts]
        adj = [pts[(x + dx, y + dy)]
               for dx in (-1, 0, 1) for dy in (-1, 0, 1)
               if (dx, dy) != (0, 0) and (x + dx, y + dy) in pts]
        tpis[(x, y)] = (round(z - sum(nbs) / len(nbs), 6)
                        if nbs else None)
        drops[(x, y)] = max([abs(z - v) for v in adj], default=0.0)
    vals = [t for t in tpis.values() if t is not None]
    sd = round(float(np.std(vals)), 6) if vals else None
    out = {}
    for c, t in tpis.items():
        if t is None:
            out[c] = (None, "isolated")
            continue
        if sd == 0:
            out[c] = (t, "flat")
            continue
        s = t / sd
        if s > 1:
            cls = "ridge"
        elif s > 0.5:
            cls = "upper_slope"
        elif s >= -0.5:
            cls = "mid_slope" if drops[c] > flat_eps else "flat"
        elif s >= -1:
            cls = "lower_slope"
        else:
            cls = "valley"
        out[c] = (t, cls)
    return out


def pts_df(spark, pts: dict):
    pdf = pd.DataFrame([(x, y, z) for (x, y), z in pts.items()],
                       columns=["tile_x", "tile_y", "value"])
    return spark.createDataFrame(pdf)


def run(spark, pts, **kw):
    rows = tpi_landform(pts_df(spark, pts), **kw).collect()
    return {(r.x, r.y): (r.tpi, r.landform) for r in rows}


def test_random_grid_parity(spark):
    rng = np.random.default_rng(31)
    pts = {(x, y): float(rng.integers(0, 50))
           for x in range(10) for y in range(8)}
    got = run(spark, pts)
    want = ref_landform(pts)
    assert set(got) == set(want)
    for c in got:
        t_g, c_g = got[c]
        t_w, c_w = want[c]
        assert c_g == c_w, (c, got[c], want[c])
        if t_w is None:
            assert t_g is None
        else:
            assert abs(t_g - t_w) < 1e-9


def test_sparse_field_with_isolated_parity(spark):
    rng = np.random.default_rng(7)
    pts = {(int(x), int(y)): float(z) for x, y, z in zip(
        rng.integers(0, 12, 60), rng.integers(0, 12, 60),
        rng.integers(0, 30, 60))}
    pts[(100, 100)] = 5.0  # no neighbors within any radius
    got = run(spark, pts)
    want = ref_landform(pts)
    assert got[(100, 100)] == (None, "isolated")
    for c in got:
        assert got[c][1] == want[c][1], (c, got[c], want[c])


def test_bump_and_pit_goldens(spark):
    ys, xs = np.mgrid[0:11, 0:11]
    bump = 50.0 - ((xs - 5) ** 2 + (ys - 5) ** 2)
    pts = {(int(x), int(y)): float(bump[y, x])
           for y in range(11) for x in range(11)}
    got = run(spark, pts)
    # the summit is locally elevated (positive class); the corners'
    # huge negative TPIs inflate sigma, so 'ridge' needs a sharper
    # peak than a smooth dome — the reference agrees
    assert got[(5, 5)][0] > 0
    assert got[(5, 5)][1] in ("ridge", "upper_slope")
    assert got[(0, 0)][1] == "valley"      # corner pit
    want = ref_landform(pts)
    for c in got:
        assert got[c][1] == want[c][1], (c, got[c], want[c])


def test_flat_eps_gate(spark):
    # constant plateau with one spike: plateau cells near the spike
    # have small |tpi| but nonzero drop -> mid_slope vs flat by eps
    pts = {(x, y): 10.0 for x in range(8) for y in range(5)}
    pts[(4, 2)] = 16.0
    tight = run(spark, pts, flat_eps=0.5)
    loose = run(spark, pts, flat_eps=10.0)
    want_t = ref_landform(pts, flat_eps=0.5)
    want_l = ref_landform(pts, flat_eps=10.0)
    for c in pts:
        assert tight[c][1] == want_t[c][1], (c, tight[c], want_t[c])
        assert loose[c][1] == want_l[c][1]
    # an adjacent-to-spike plateau cell flips with the gate
    assert tight[(3, 2)][1] != loose[(3, 2)][1]


def test_constant_field_all_flat(spark):
    pts = {(x, y): 7.0 for x in range(6) for y in range(6)}
    got = run(spark, pts)
    assert {cls for _, cls in got.values()} == {"flat"}


def test_nan_rows_dropped(spark):
    pts = {(0, 0): 1.0, (1, 0): float("nan"), (2, 0): 3.0}
    got = run(spark, pts)
    assert set(got) == {(0, 0), (2, 0)}
