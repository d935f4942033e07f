"""A* least-cost path (reference xrspatial/pathfinding.py:145-382).

A* is inherently sequential (one frontier), so per SURVEY §2.9 the
plan is: bound the search to the start/goal bounding box (+margin),
collect ONLY that window to the driver, run a heap-based A* (same
semantics as the reference kernel: euclidean pixel-space costs,
NaN/barrier cells not crossable, cost-so-far written along the path),
and return the path as a small DataFrame.  The collected window is
O(path area), not O(raster) — the distributed part is the windowed
filter, which Spark pushes into the scan.

Deviation noted: the reference scans the whole open list per pop
(pathfinding.py:96-107); a binary heap gives the same result
(ties broken by insertion order may pick a different equal-cost path;
all reference assertions are on path costs, which are unique-optimal).
"""

from __future__ import annotations

import heapq
import math
import warnings
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _not_crossable(v: float, barriers: tuple) -> bool:
    return math.isnan(v) or v in barriers


def _nearest_crossable(py, px, grid, barriers):
    """reference `_find_nearest_pixel` pathfinding.py:110-133."""
    if not _not_crossable(grid[py, px], barriers):
        return py, px
    h, w = grid.shape
    best = None
    best_d = math.inf
    for y in range(h):
        for x in range(w):
            if not _not_crossable(grid[y, x], barriers):
                d = math.hypot(x - px, y - py)
                if d < best_d:
                    best_d = d
                    best = (y, x)
    return best if best else (-1, -1)


def _astar_grid(grid, start, goal, barriers, connectivity):
    """Heap A*; returns dict (y, x) -> cost-so-far along the optimal
    path, empty if unreachable."""
    h, w = grid.shape
    sy, sx = start
    gy, gx = goal
    if _not_crossable(grid[sy, sx], barriers):
        return {}
    if connectivity == 8:
        nbrs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    else:
        nbrs = [(-1, 0), (0, -1), (0, 1), (1, 0)]
    dist = np.full((h, w), np.inf)
    parent = {}
    dist[sy, sx] = 0.0
    heap = [(math.hypot(gx - sx, gy - sy), 0.0, sy, sx)]
    closed = np.zeros((h, w), dtype=bool)
    while heap:
        _, d, py, px = heapq.heappop(heap)
        if closed[py, px]:
            continue
        closed[py, px] = True
        if (py, px) == (gy, gx):
            path = {}
            cur = (gy, gx)
            while cur != (sy, sx):
                path[cur] = dist[cur]
                cur = parent[cur]
            path[(sy, sx)] = 0.0
            return path
        for dy, dx in nbrs:
            ny, nx = py + dy, px + dx
            if not (0 <= ny < h and 0 <= nx < w):
                continue
            if closed[ny, nx] or _not_crossable(grid[ny, nx], barriers):
                continue
            nd = d + math.hypot(dx, dy)
            if nd < dist[ny, nx]:
                dist[ny, nx] = nd
                parent[(ny, nx)] = (py, px)
                heapq.heappush(
                    heap, (nd + math.hypot(gx - nx, gy - ny), nd, ny, nx)
                )
    return {}


def a_star_search(
    raster: DataFrame,
    start: tuple[int, int],
    goal: tuple[int, int],
    barriers: Iterable[float] = (),
    connectivity: int = 8,
    snap_start: bool = False,
    snap_goal: bool = False,
    value_col: str = "value",
    margin: int | None = None,
) -> DataFrame:
    """start/goal given as (y, x) PIXEL indices of the long-form
    raster.  Returns (y, x, cost) rows for the path cells only
    (the reference's NaN-elsewhere image restricted to its non-NaN
    support).

    ``margin`` widens the collected search window beyond the
    start/goal bbox.  Default (None) = an automatic finite margin of
    max(bbox height, bbox width, 64) cells — the search never
    collects the whole raster by accident.  Pass a negative margin to
    opt into the unrestricted window (still guarded by
    ``collect_dense``'s size cap); the reference always searches the
    full array (pathfinding.py:189-231), so unrestricted reproduces
    it exactly when a path detours far outside the bbox."""
    from xarray_spatial_spark.raster import collect_dense

    spark = raster.sparkSession
    barriers = tuple(float(b) for b in barriers)

    if margin is None:
        margin = max(abs(start[0] - goal[0]), abs(start[1] - goal[1]), 64)

    window = raster.select("y", "x", value_col)
    y0 = x0 = 0
    if margin >= 0:
        y0 = max(0, min(start[0], goal[0]) - margin)
        y1 = max(start[0], goal[0]) + margin
        x0 = max(0, min(start[1], goal[1]) - margin)
        x1 = max(start[1], goal[1]) + margin
        window = window.filter(
            F.col("y").between(y0, y1) & F.col("x").between(x0, x1)
        )
        grid = collect_dense(window, value_col, y0=y0, x0=x0,
                             shape=(y1 - y0 + 1, x1 - x0 + 1))
        # trim unpopulated outer rows/cols (filter window may exceed data)
        finite_rows = np.flatnonzero(np.any(np.isfinite(grid), axis=1))
        finite_cols = np.flatnonzero(np.any(np.isfinite(grid), axis=0))
        if len(finite_rows):
            grid = grid[:finite_rows[-1] + 1, :finite_cols[-1] + 1]
    else:
        grid = collect_dense(window, value_col)

    sy, sx = start[0] - y0, start[1] - x0
    gy, gx = goal[0] - y0, goal[1] - x0
    if snap_start:
        sy, sx = _nearest_crossable(sy, sx, grid, barriers)
    if _not_crossable(grid[sy, sx], barriers) if sy >= 0 else True:
        warnings.warn("Start at a non crossable location", Warning)
    if snap_goal:
        gy, gx = _nearest_crossable(gy, gx, grid, barriers)
    if _not_crossable(grid[gy, gx], barriers) if gy >= 0 else True:
        warnings.warn("End at a non crossable location", Warning)

    path: dict = {}
    if sy >= 0 and gy >= 0:
        path = _astar_grid(grid, (sy, sx), (gy, gx), barriers, connectivity)
    rows = pd.DataFrame(
        {
            "y": [y + y0 for (y, x) in path],
            "x": [x + x0 for (y, x) in path],
            "cost": list(path.values()),
        }
    )
    return spark.createDataFrame(rows, schema="y int, x int, cost double")
