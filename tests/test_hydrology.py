"""D8 hydrology: flow-direction parity vs a scalar-loop reference,
accumulation parity vs a topological-order reference, goldens on
constructed terrain, and the loop guards."""

import numpy as np
import pandas as pd
import pytest

from xarray_spatial_spark.operators.hydrology import (
    D8,
    flow_accumulation,
    flow_direction,
)


def ref_direction(grid: np.ndarray) -> np.ndarray:
    """Scalar-loop D8 with the module's conventions (strict positive
    drop, smallest code on ties, NaN neighbors absent)."""
    h, w = grid.shape
    out = np.zeros((h, w), dtype=int)
    for y in range(h):
        for x in range(w):
            if not np.isfinite(grid[y, x]):
                out[y, x] = -1  # marker: cell absent
                continue
            cands = []
            for code, dx, dy, dist in D8:
                ny, nx = y + dy, x + dx
                if not (0 <= ny < h and 0 <= nx < w):
                    continue
                if not np.isfinite(grid[ny, nx]):
                    continue
                drop = (grid[y, x] - grid[ny, nx]) / dist
                if drop > 0:
                    cands.append((drop, code))
            if cands:
                top = max(d for d, _ in cands)
                out[y, x] = min(c for d, c in cands if d == top)
    return out


def ref_accumulation(grid: np.ndarray, dirs: np.ndarray) -> np.ndarray:
    """Topological-order upstream counts (self excluded)."""
    h, w = grid.shape
    delta = {code: (dx, dy) for code, dx, dy, _ in D8}
    indeg = np.zeros((h, w), dtype=int)
    downstream = {}
    for y in range(h):
        for x in range(w):
            c = dirs[y, x]
            if c > 0:
                dx, dy = delta[c]
                downstream[(x, y)] = (x + dx, y + dy)
                indeg[y + dy, x + dx] += 1
    acc = np.zeros((h, w), dtype=np.int64)
    stack = [(x, y) for y in range(h) for x in range(w)
             if dirs[y, x] >= 0 and indeg[y, x] == 0]
    while stack:
        x, y = stack.pop()
        if (x, y) in downstream:
            tx, ty = downstream[(x, y)]
            acc[ty, tx] += acc[y, x] + 1
            indeg[ty, tx] -= 1
            if indeg[ty, tx] == 0:
                stack.append((tx, ty))
    return acc


def grid_df(spark, grid: np.ndarray):
    h, w = grid.shape
    ys, xs = np.mgrid[0:h, 0:w]
    pdf = pd.DataFrame({
        "x": xs.ravel(), "y": ys.ravel(), "value": grid.ravel()
    })
    pdf = pdf[np.isfinite(pdf["value"].to_numpy())]
    return spark.createDataFrame(pdf)


def assert_direction_parity(spark, grid):
    fd = flow_direction(grid_df(spark, grid))
    got = {(r.x, r.y): r.direction for r in fd.collect()}
    want = ref_direction(grid)
    h, w = grid.shape
    for y in range(h):
        for x in range(w):
            if want[y, x] < 0:
                assert (x, y) not in got
            else:
                assert got[(x, y)] == want[y, x], (x, y)
    return fd


def test_direction_random_grid_parity(spark):
    rng = np.random.default_rng(42)
    grid = rng.integers(0, 20, size=(10, 12)).astype(float)
    assert_direction_parity(spark, grid)


def test_direction_tie_heavy_parity(spark):
    # tiny value alphabet -> many exact drop ties -> smallest code
    rng = np.random.default_rng(9)
    grid = rng.integers(0, 3, size=(8, 8)).astype(float)
    assert_direction_parity(spark, grid)


def test_direction_tilted_plane_east(spark):
    # z decreases with +x -> everyone drains due east (code 1):
    # the diagonal drops divide by sqrt(2) so E wins outright
    ys, xs = np.mgrid[0:5, 0:6]
    grid = (100.0 - xs).astype(float)
    fd = flow_direction(grid_df(spark, grid))
    rows = {(r.x, r.y): r.direction for r in fd.collect()}
    for (x, y), d in rows.items():
        assert d == (0 if x == 5 else 1), (x, y, d)


def test_direction_nan_hole(spark):
    grid = np.array([[3.0, 3.0, 3.0], [3.0, np.nan, 1.0],
                     [3.0, 3.0, 3.0]])
    assert_direction_parity(spark, grid)


def test_accumulation_random_parity(spark):
    rng = np.random.default_rng(4)
    # distinct values avoid flats -> deep-ish forests
    grid = rng.permutation(90).astype(float).reshape(9, 10)
    df = grid_df(spark, grid)
    fd = flow_direction(df)
    acc = flow_accumulation(fd)
    got = {(r.x, r.y): r.acc for r in acc.collect()}
    dirs = ref_direction(grid)
    want = ref_accumulation(grid, dirs)
    assert len(got) == 90
    for (x, y), a in got.items():
        assert a == want[y, x], (x, y, a, want[y, x])


def test_accumulation_bowl_drains_to_center(spark):
    h = w = 9
    ys, xs = np.mgrid[0:h, 0:w]
    grid = ((xs - 4) ** 2 + (ys - 4) ** 2).astype(float)
    df = grid_df(spark, grid)
    fd = flow_direction(df)
    rows = {(r.x, r.y): r.direction for r in fd.collect()}
    assert rows[(4, 4)] == 0  # the pit
    acc = {(r.x, r.y): r.acc
           for r in flow_accumulation(fd).collect()}
    # strictly decreasing toward the pit from every side -> every
    # other cell drains into the center
    assert acc[(4, 4)] == h * w - 1
    # corners receive nothing
    assert acc[(0, 0)] == 0 and acc[(8, 8)] == 0


def test_accumulation_depth_guard_raises(spark):
    # a straight 6-cell staircase has drainage depth 5 > max_iters=2
    grid = np.array([[5.0, 4.0, 3.0, 2.0, 1.0, 0.0]])
    fd = flow_direction(grid_df(spark, grid))
    with pytest.raises(ValueError, match="max_iters"):
        flow_accumulation(fd, max_iters=2)


def ref_watershed(dirs: np.ndarray) -> dict:
    delta = {code: (dx, dy) for code, dx, dy, _ in D8}
    h, w = dirs.shape
    out = {}
    for y in range(h):
        for x in range(w):
            if dirs[y, x] < 0:
                continue
            cx, cy = x, y
            while dirs[cy, cx] > 0:
                dx, dy = delta[dirs[cy, cx]]
                cx, cy = cx + dx, cy + dy
            out[(x, y)] = (cx, cy)
    return out


def test_watershed_random_parity(spark):
    from xarray_spatial_spark.operators.hydrology import watershed

    rng = np.random.default_rng(17)
    grid = rng.permutation(72).astype(float).reshape(8, 9)
    fd = flow_direction(grid_df(spark, grid))
    got = {(r.x, r.y): (r.basin_x, r.basin_y)
           for r in watershed(fd).collect()}
    dirs = ref_direction(grid)
    assert got == ref_watershed(dirs)


def test_watershed_two_bowls(spark):
    from xarray_spatial_spark.operators.hydrology import watershed

    h, w = 7, 15
    ys, xs = np.mgrid[0:h, 0:w]
    # two pits at (3,3) and (11,3); ridge at x=7
    za = (xs - 3) ** 2 + (ys - 3) ** 2
    zb = (xs - 11) ** 2 + (ys - 3) ** 2
    grid = np.minimum(za, zb).astype(float) + 1.0
    fd = flow_direction(grid_df(spark, grid))
    basins = {(r.x, r.y): (r.basin_x, r.basin_y)
              for r in watershed(fd).collect()}
    assert basins[(0, 0)] == (3, 3)
    assert basins[(14, 6)] == (11, 3)
    # every cell drains to one of the two pits
    assert set(basins.values()) == {(3, 3), (11, 3)}


def ref_strahler(cells: set, dirs: dict) -> dict:
    """Recursive textbook Strahler over explicit (cell -> downstream)
    edges restricted to ``cells``."""
    delta = {code: (dx, dy) for code, dx, dy, _ in D8}
    inflows: dict = {c: [] for c in cells}
    for (x, y), code in dirs.items():
        if code > 0:
            dx, dy = delta[code]
            t = (x + dx, y + dy)
            if t in cells:
                inflows[t].append((x, y))
    import functools

    @functools.lru_cache(maxsize=None)
    def order(c):
        ins = [order(u) for u in inflows[c]]
        if not ins:
            return 1
        m = max(ins)
        return m + 1 if ins.count(m) >= 2 else m
    return {c: order(c) for c in cells}


def dir_df(spark, dirs: dict):
    pdf = pd.DataFrame(
        [(x, y, d) for (x, y), d in dirs.items()],
        columns=["x", "y", "direction"],
    )
    return spark.createDataFrame(pdf)


def test_strahler_y_junction(spark):
    from xarray_spatial_spark.operators.hydrology import strahler_order

    # two headwaters (E-flowing) join at (2,1) which drains south,
    # then a third order-1 stream joins at (2,3)
    dirs = {
        (0, 0): 2,   # SE -> (1,1)
        (1, 1): 1,   # E  -> (2,1)
        (0, 2): 128, # NE -> (1,1)? no: (1,1) already fed; route to (1,1)
        (2, 1): 4,   # S  -> (2,2)
        (2, 2): 4,   # S  -> (2,3)
        (0, 3): 1,   # E  -> (1,3)
        (1, 3): 1,   # E  -> (2,3)
        (2, 3): 0,   # outlet
    }
    got = {(r.x, r.y): r.order
           for r in strahler_order(dir_df(spark, dirs)).collect()}
    want = ref_strahler(set(dirs), dirs)
    assert got == want
    assert got[(2, 1)] == 2     # two order-1 confluence
    assert got[(2, 3)] == 2     # order-2 joined by order-1 stays 2
    assert got[(1, 3)] == 1


def test_strahler_two_seconds_make_third(spark):
    from xarray_spatial_spark.operators.hydrology import strahler_order

    dirs = {}
    # branch A: two 1s -> 2 at (2,0), flows E to (4,0)
    dirs[(0, 0)] = 1; dirs[(1, 0)] = 1
    dirs[(1, 1)] = 128  # NE -> (2,0)
    dirs[(2, 0)] = 1; dirs[(3, 0)] = 1
    # branch B: two 1s -> 2 at (2,2), flows NE to (4,1)? route E then N
    dirs[(0, 2)] = 1; dirs[(1, 2)] = 1
    dirs[(1, 3)] = 128  # NE -> (2,2)
    dirs[(2, 2)] = 1; dirs[(3, 2)] = 128  # NE -> (4,1)
    # hmm: (4,0) fed by branch A; make B feed (4,0) too via (4,1) N
    dirs[(4, 1)] = 64   # N -> (4,0)
    dirs[(4, 0)] = 0
    got = {(r.x, r.y): r.order
           for r in strahler_order(dir_df(spark, dirs)).collect()}
    want = ref_strahler(set(dirs), dirs)
    assert got == want
    assert want[(2, 0)] == 2 and want[(2, 2)] == 2
    assert got[(4, 0)] == 3  # two order-2 streams meet


def test_strahler_random_terrain_parity(spark):
    from xarray_spatial_spark.operators.hydrology import strahler_order

    rng = np.random.default_rng(23)
    grid = rng.permutation(80).astype(float).reshape(8, 10)
    fd = flow_direction(grid_df(spark, grid))
    dirs = {(r.x, r.y): r.direction for r in fd.collect()}
    got = {(r.x, r.y): r.order for r in strahler_order(fd).collect()}
    assert got == ref_strahler(set(dirs), dirs)


def test_strahler_subset_drops_exiting_edges(spark):
    from xarray_spatial_spark.operators.hydrology import strahler_order

    # a chain 0<-1<-2 where the middle cell is NOT in the subset:
    # both remaining cells become independent headwaters
    dirs = {(0, 0): 0, (2, 0): 16}  # (2,0) flows W to absent (1,0)
    got = {(r.x, r.y): r.order
           for r in strahler_order(dir_df(spark, dirs)).collect()}
    assert got == {(0, 0): 1, (2, 0): 1}


def test_direction_plan_no_python(spark):
    grid = np.arange(12, dtype=float).reshape(3, 4)
    fd = flow_direction(grid_df(spark, grid))
    plan = fd._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# Depression filling (Planchon-Darboux)
# ---------------------------------------------------------------------------


def ref_fill(grid: np.ndarray) -> np.ndarray:
    """Scalar-loop PD reference: W=z on border, inf inside, iterate
    W = max(z, min(W, min over present neighbors))."""
    h, w = grid.shape
    W = np.where(np.isfinite(grid), np.inf, np.nan)
    present = np.isfinite(grid)
    for y in range(h):
        for x in range(w):
            if not present[y, x]:
                continue
            nbs = [(x + dx, y + dy) for _, dx, dy, _ in D8
                   if 0 <= x + dx < w and 0 <= y + dy < h
                   and present[y + dy, x + dx]]
            if len(nbs) < 8:
                W[y, x] = grid[y, x]
    changed = True
    while changed:
        changed = False
        for y in range(h):
            for x in range(w):
                if not present[y, x] or W[y, x] == grid[y, x]:
                    continue
                nmin = min((W[ny, nx] for nx, ny in
                            [(x + dx, y + dy) for _, dx, dy, _ in D8
                             if 0 <= x + dx < w and 0 <= y + dy < h
                             and present[y + dy, x + dx]]),
                           default=np.inf)
                nw = max(grid[y, x], min(W[y, x], nmin))
                if nw < W[y, x]:
                    W[y, x] = nw
                    changed = True
    return W


def test_fill_bowl_rises_to_rim(spark):
    from xarray_spatial_spark.operators.hydrology import fill_depressions

    # a 7x7 bowl inside a flat plateau at 10: the interior fills to
    # the rim's lowest pour point (10), the rim itself is untouched
    grid = np.full((9, 9), 10.0)
    ys, xs = np.mgrid[0:9, 0:9]
    bowl = 2.0 + ((xs - 4) ** 2 + (ys - 4) ** 2) / 4.0
    inner = (np.abs(xs - 4) <= 2) & (np.abs(ys - 4) <= 2)
    grid[inner] = bowl[inner]
    out = {(r.x, r.y): r.filled
           for r in fill_depressions(grid_df(spark, grid)).collect()}
    for y in range(9):
        for x in range(9):
            assert out[(x, y)] == 10.0, (x, y, out[(x, y)])


def test_fill_parity_random(spark):
    from xarray_spatial_spark.operators.hydrology import fill_depressions

    rng = np.random.default_rng(13)
    grid = rng.integers(0, 30, size=(10, 11)).astype(float)
    out = {(r.x, r.y): r.filled
           for r in fill_depressions(grid_df(spark, grid)).collect()}
    want = ref_fill(grid)
    for (x, y), v in out.items():
        assert v == want[y, x], (x, y, v, want[y, x])


def test_fill_pit_free_after(spark):
    from xarray_spatial_spark.operators.hydrology import fill_depressions

    rng = np.random.default_rng(21)
    grid = rng.integers(0, 50, size=(12, 12)).astype(float)
    filled = fill_depressions(grid_df(spark, grid))
    fd = flow_direction(filled.select(
        "x", "y", filled.filled.alias("value")))
    pits = [(r.x, r.y) for r in fd.collect() if r.direction == 0]
    # every remaining pit must be able to drain off-grid: it sits on
    # the border OR on a filled flat connected to the border (flats
    # have direction 0 under strict-drop D8 — the standard residue
    # PD leaves; no pit may be a strict interior local minimum)
    out = {(r.x, r.y): r.filled for r in filled.collect()}
    for (x, y) in pits:
        if x in (0, 11) or y in (0, 11):
            continue
        v = out[(x, y)]
        nbs = [out[(x + dx, y + dy)] for _, dx, dy, _ in D8
               if (x + dx, y + dy) in out]
        assert min(nbs) <= v, (x, y)  # not a strict minimum


def test_fill_monotone_and_slope_preserving(spark):
    from xarray_spatial_spark.operators.hydrology import fill_depressions

    # pit-free tilted plane: fill is the identity
    ys, xs = np.mgrid[0:6, 0:8]
    grid = (xs + 2.0 * ys).astype(float)
    out = {(r.x, r.y): r.filled
           for r in fill_depressions(grid_df(spark, grid)).collect()}
    for (x, y), v in out.items():
        assert v == grid[y, x]


def test_accumulation_kahn_equals_doubling_random(spark):
    from xarray_spatial_spark.operators.hydrology import (
        _flow_accumulation_kahn,
    )

    rng = np.random.default_rng(11)
    grid = rng.uniform(0, 100, size=(12, 12))
    fd = flow_direction(grid_df(spark, grid)).localCheckpoint()
    via_closure = {(r.x, r.y): r.acc
                   for r in flow_accumulation(fd).collect()}
    via_kahn = {(r.x, r.y): r.acc
                for r in _flow_accumulation_kahn(
                    fd.select("x", "y", "direction"), 10_000).collect()}
    assert via_closure == via_kahn


def test_accumulation_deep_chain_dispatches_to_kahn(spark):
    # a 96-cell east-flowing chain: drainage depth 95, closure pairs
    # ~96*95/2 = 4560 >> pair_budget * edges = 8 * 95, so the
    # dispatcher must abandon doubling and finish through the Kahn
    # path within a bounded pair volume; acc(i) = i exactly
    n = 96
    grid = np.arange(n, 0, -1, dtype=float).reshape(1, n)
    fd = flow_direction(grid_df(spark, grid))
    out = {(r.x, r.y): r.acc for r in flow_accumulation(fd).collect()}
    assert out == {(x, 0): x for x in range(n)}
