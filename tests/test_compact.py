"""compact_cells / uncompact_cells: coverage preservation, minimality,
containment normalization, codegen decode parity."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark import grid
from xarray_spatial_spark.operators.tiling import (
    compact_cells,
    uncompact_cells,
)


def cells_df(spark, ids):
    return spark.createDataFrame(
        pd.DataFrame({"cell": np.asarray(ids, dtype=np.int64)}))


def all_cells(zoom):
    n = 1 << zoom
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    return grid.encode(xs.ravel(), ys.ravel(), zoom)


def fetch(df):
    return sorted(r.cell for r in df.collect())


def test_full_world_compacts_to_root(spark):
    out = fetch(compact_cells(cells_df(spark, all_cells(3))))
    assert out == [int(grid.encode(np.array([0]), np.array([0]), 0)[0])]


def test_one_missing_leaf_gives_nine_cells(spark):
    ids = all_cells(3)
    out = fetch(compact_cells(cells_df(spark, ids[1:])))  # drop one z3 cell
    assert len(out) == 9
    zs = [int(np.asarray(c).astype(np.uint64) >> np.uint64(58)) for c in out]
    assert sorted(zs) == [1, 1, 1, 2, 2, 2, 3, 3, 3]


def test_coverage_preserved_on_random_sets(spark):
    rng = np.random.default_rng(5)
    zoom = 4
    n = 1 << zoom
    pick = rng.random(n * n) < 0.7
    ids = all_cells(zoom)[pick]
    comp = compact_cells(cells_df(spark, ids))
    # uncompact back to the base zoom == the original set exactly
    restored = fetch(uncompact_cells(comp, zoom))
    assert restored == sorted(int(c) for c in ids)
    # and the compacted set is smaller (quads exist at 70% fill)
    assert comp.count() < len(ids)


def test_minimality_no_quad_survives(spark):
    rng = np.random.default_rng(11)
    ids = all_cells(4)[rng.random(256) < 0.8]
    out = compact_cells(cells_df(spark, ids)).collect()
    by_parent = {}
    for r in out:
        c = np.uint64(r.cell)
        z = int(c >> np.uint64(58))
        if z == 0:
            continue
        p = int(grid.parent(np.array([r.cell]), z - 1)[0])
        by_parent.setdefault(p, 0)
        by_parent[p] += 1
    assert all(v < 4 for v in by_parent.values())


def test_containment_normalization(spark):
    # a z1 cell plus two of its z3 descendants -> just the z1 cell
    z1 = grid.encode(np.array([1]), np.array([0]), 1)
    desc = grid.encode(np.array([4, 5]), np.array([1, 2]), 3)
    out = fetch(compact_cells(cells_df(spark, np.r_[z1, desc])))
    assert out == [int(z1[0])]


def test_uncompact_rejects_finer_cells(spark):
    ids = grid.encode(np.array([0]), np.array([0]), 5)
    with pytest.raises(ValueError, match="finer"):
        uncompact_cells(cells_df(spark, ids), 3)


def test_cell_decode_cols_parity(spark):
    rng = np.random.default_rng(3)
    zoom = 7
    n = 1 << zoom
    xs = rng.integers(0, n, 200)
    ys = rng.integers(0, n, 200)
    ids = grid.encode(xs, ys, zoom)
    z, x, y = grid.cell_decode_cols(F.col("cell"))
    rows = cells_df(spark, ids).select(
        "cell", z.alias("z"), x.alias("x"), y.alias("y")).collect()
    want = {int(c): (zoom, int(a), int(b)) for c, a, b in zip(ids, xs, ys)}
    for r in rows:
        assert want[r.cell] == (r.z, r.x, r.y)


def test_compact_plan_no_python(spark):
    df = compact_cells(cells_df(spark, all_cells(2)))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# S2 flavor
# ---------------------------------------------------------------------------


def s2_cells_df(spark, ids):
    return spark.createDataFrame(
        pd.DataFrame({"cell": np.asarray(ids, dtype=np.int64)}))


def test_s2_four_children_compact_to_parent(spark):
    from xarray_spatial_spark import s2
    from xarray_spatial_spark.operators.tiling import s2_compact_cells

    p = s2.cell_of(np.array([2.0]), np.array([48.0]), 9)
    kids = s2.children(p).ravel()
    out = fetch(s2_compact_cells(s2_cells_df(spark, kids)))
    assert out == [int(p[0])]


def test_s2_random_roundtrip_and_minimality(spark):
    from xarray_spatial_spark import s2
    from xarray_spatial_spark.operators.tiling import (
        s2_compact_cells,
        s2_uncompact_cells,
    )

    rng = np.random.default_rng(9)
    # a dense-ish blob of level-10 cells: descendants of a few level-7
    # cells, 80% sampled so quads both exist and break
    roots = s2.cell_of(np.array([5.0, 5.3, 5.6]), np.array([50.0, 50.0, 50.2]), 7)
    leaves = []
    for r in np.unique(roots):
        l8 = s2.children(np.array([r])).ravel()
        l9 = np.concatenate([s2.children(l8[k:k+1]).ravel() for k in range(4)])
        l10 = np.concatenate([s2.children(l9[k:k+1]).ravel() for k in range(16)])
        leaves.append(l10)
    ids = np.unique(np.concatenate(leaves))
    ids = ids[rng.random(len(ids)) < 0.8]
    comp = s2_compact_cells(s2_cells_df(spark, ids))
    restored = fetch(s2_uncompact_cells(comp, 10))
    assert restored == sorted(int(c) for c in ids)
    assert comp.count() < len(ids)
    # minimality: no parent has all 4 children surviving
    out = [r.cell for r in comp.collect()]
    lv = s2.level_of(np.asarray(out, dtype=np.int64))
    from collections import Counter
    par = Counter()
    for c, l in zip(out, lv):
        if l > 0:
            par[int(s2.parent(np.array([c]), int(l) - 1)[0])] += 1
    assert all(v < 4 for v in par.values())


def test_s2_containment_normalization(spark):
    from xarray_spatial_spark import s2
    from xarray_spatial_spark.operators.tiling import s2_compact_cells

    p = s2.cell_of(np.array([-60.0]), np.array([-20.0]), 6)
    desc = s2.children(s2.children(p)[:, 2:3]).ravel()  # level-8 descendants
    out = fetch(s2_compact_cells(s2_cells_df(spark, np.r_[p, desc])))
    assert out == [int(p[0])]


def test_s2_level_col_parity(spark):
    from xarray_spatial_spark import s2

    rng = np.random.default_rng(2)
    lons = rng.uniform(-180, 180, 50)
    lats = rng.uniform(-85, 85, 50)
    ids = []
    for lv in (0, 3, 12, 21, 30):
        ids.append(s2.cell_of(lons, lats, lv))
    ids = np.concatenate(ids)
    rows = s2_cells_df(spark, ids).select(
        "cell", s2.level_col(F.col("cell")).alias("lv")).collect()
    want = {int(c): int(l) for c, l in zip(ids, s2.level_of(ids))}
    for r in rows:
        assert want[r.cell] == r.lv
