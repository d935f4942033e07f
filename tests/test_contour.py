"""Marching-squares contours: parity vs an independent numpy
reference, closed-curve invariants, nodata and level edge cases."""

import numpy as np
import pandas as pd
import pytest

from xarray_spatial_spark.operators.contour import (
    CASE_SEGMENTS,
    marching_squares,
)


def ref_marching_squares(grid: np.ndarray, levels) -> list[tuple]:
    """Scalar-loop reference with the module's documented conventions
    (strict >, fixed saddle table, NaN corners emit nothing)."""
    out = []
    h, w = grid.shape  # grid[y, x]
    for lvl in levels:
        for sy in range(h - 1):
            for sx in range(w - 1):
                v00 = grid[sy, sx]
                v10 = grid[sy, sx + 1]
                v11 = grid[sy + 1, sx + 1]
                v01 = grid[sy + 1, sx]
                vs = (v00, v10, v11, v01)
                if any(not np.isfinite(v) for v in vs):
                    continue
                case = sum(
                    (1 << i) for i, v in enumerate(vs) if v > lvl
                )

                def pt(e):
                    if e == 0:
                        return (sx + (lvl - v00) / (v10 - v00), float(sy))
                    if e == 1:
                        return (sx + 1.0, sy + (lvl - v10) / (v11 - v10))
                    if e == 2:
                        return (sx + (lvl - v01) / (v11 - v01), sy + 1.0)
                    return (float(sx), sy + (lvl - v00) / (v01 - v00))

                for seg, (e1, e2) in enumerate(CASE_SEGMENTS[case]):
                    (x1, y1), (x2, y2) = pt(e1), pt(e2)
                    out.append((lvl, sx, sy, seg, x1, y1, x2, y2))
    return out


def grid_df(spark, grid: np.ndarray):
    h, w = grid.shape
    ys, xs = np.mgrid[0:h, 0:w]
    pdf = pd.DataFrame({
        "x": xs.ravel(), "y": ys.ravel(), "value": grid.ravel()
    })
    pdf = pdf[np.isfinite(pdf["value"].to_numpy())]
    return spark.createDataFrame(pdf)


def fetch(df) -> list[tuple]:
    rows = df.collect()
    return sorted(
        (r.level, r.sx, r.sy, r.seg, r.x1, r.y1, r.x2, r.y2) for r in rows
    )


def assert_parity(spark, grid, levels):
    got = fetch(marching_squares(grid_df(spark, grid), levels))
    want = sorted(ref_marching_squares(grid, levels))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:4] == w[:4]
        np.testing.assert_allclose(g[4:], w[4:], rtol=0, atol=1e-12)


def test_random_integer_grid_parity(spark):
    rng = np.random.default_rng(7)
    grid = rng.integers(0, 10, size=(12, 15)).astype(float)
    assert_parity(spark, grid, [0.5, 3.5, 4.5, 8.5])


def test_saddle_heavy_grid_parity(spark):
    # +-1 checkerboard-ish noise maximizes saddle cases 5 and 10
    rng = np.random.default_rng(11)
    grid = rng.choice([-1.0, 1.0], size=(10, 10))
    assert_parity(spark, grid, [0.0])


def test_nan_corners_emit_nothing(spark):
    grid = np.array([[0.0, 5.0, 0.0], [0.0, np.nan, 0.0],
                     [0.0, 5.0, 0.0]])
    segs = fetch(marching_squares(grid_df(spark, grid), [2.5]))
    # every square touches the NaN center vertex -> no output at all
    assert segs == []
    assert_parity(spark, grid, [2.5])


def test_levels_outside_range_empty(spark):
    rng = np.random.default_rng(3)
    grid = rng.integers(0, 5, size=(6, 6)).astype(float)
    assert fetch(marching_squares(grid_df(spark, grid), [99.5])) == []
    assert fetch(marching_squares(grid_df(spark, grid), [-1.5])) == []


def test_closed_loop_on_bump(spark):
    """An interior iso-line of a radial bump is a closed curve: every
    interpolated endpoint appears in exactly TWO segments."""
    h = w = 17
    ys, xs = np.mgrid[0:h, 0:w]
    grid = 100.0 - ((xs - 8.0) ** 2 + (ys - 8.0) ** 2)
    segs = fetch(marching_squares(grid_df(spark, grid), [75.5]))
    assert len(segs) >= 8
    counts: dict[tuple, int] = {}
    for s in segs:
        for p in ((round(s[4], 9), round(s[5], 9)),
                  (round(s[6], 9), round(s[7], 9))):
            counts[p] = counts.get(p, 0) + 1
    assert set(counts.values()) == {2}


def test_multi_level_is_union_of_single_levels(spark):
    rng = np.random.default_rng(5)
    grid = rng.integers(0, 8, size=(9, 9)).astype(float)
    df = grid_df(spark, grid)
    both = fetch(marching_squares(df, [1.5, 6.5]))
    single = sorted(
        fetch(marching_squares(df, [1.5]))
        + fetch(marching_squares(df, [6.5]))
    )
    assert both == single


def test_empty_levels_raises(spark):
    with pytest.raises(ValueError):
        marching_squares(grid_df(spark, np.zeros((2, 2))), [])


def test_plan_single_exchange_no_python(spark):
    """The whole plan is Catalyst: one exchange (the corner-scatter
    groupBy), no Python evaluation node."""
    grid = np.arange(16, dtype=float).reshape(4, 4)
    df = marching_squares(grid_df(spark, grid), [3.5, 7.5])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # agg partial/final pair
    assert "Python" not in plan and "BatchEvalPython" not in plan
