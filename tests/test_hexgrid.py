"""Hex index family (functions/hexgrid.py): axial assignment, centers,
pack/distance/rings, focal smoothing, and DuckDB SQL-twin parity."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.functions import hexgrid as H


def _np_hex_cell(x, y, size):
    """numpy reference: same transform + floor(v+0.5) cube rounding."""
    qf = (H._C_Q * x - H._C_Y * y) / size
    rf = (H._C_R * y) / size
    sf = -qf - rf
    rq = np.floor(qf + 0.5)
    rr = np.floor(rf + 0.5)
    rs = np.floor(sf + 0.5)
    dq, dr, ds = np.abs(rq - qf), np.abs(rr - rf), np.abs(rs - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = (~fix_q) & (dr > ds)
    q = np.where(fix_q, -rr - rs, rq).astype(np.int64)
    r = np.where(fix_r, -rq - rs, rr).astype(np.int64)
    return q, r


def _np_center(q, r, size):
    return (size * (H._SQRT3 * q + H._C_HALF * r), size * (1.5 * r))


def _pts_df(spark, n=2000, seed=5, span=50.0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-span, span, size=(n, 2))
    return spark.createDataFrame(
        pd.DataFrame({"i": np.arange(n), "x": xy[:, 0], "y": xy[:, 1]})), xy


def test_assignment_matches_numpy(spark):
    df, xy = _pts_df(spark, 3000)
    q, r = H.hex_cell_cols(F.col("x"), F.col("y"), 2.5)
    out = df.select("i", q.alias("q"), r.alias("r")).orderBy("i").toPandas()
    nq, nr = _np_hex_cell(xy[:, 0], xy[:, 1], 2.5)
    assert (out["q"].to_numpy() == nq).all()
    assert (out["r"].to_numpy() == nr).all()


def test_center_roundtrip(spark):
    # the cell of every hex CENTER is that hex
    rng = np.random.default_rng(6)
    q = rng.integers(-500, 500, size=400)
    r = rng.integers(-500, 500, size=400)
    cx, cy = _np_center(q, r, 1.75)
    q2, r2 = _np_hex_cell(cx, cy, 1.75)
    assert (q2 == q).all() and (r2 == r).all()


def test_nearest_center_property():
    # assignment == nearest hex center (checked against the 19-cell
    # neighbourhood disk — the true argmin is always inside it)
    rng = np.random.default_rng(7)
    pts = rng.uniform(-30, 30, size=(2000, 2))
    size = 3.0
    q, r = _np_hex_cell(pts[:, 0], pts[:, 1], size)
    offs = np.concatenate([H.hex_ring_offsets(k) for k in range(3)])
    cand_q = q[:, None] + offs[:, 0][None, :]
    cand_r = r[:, None] + offs[:, 1][None, :]
    cx, cy = _np_center(cand_q, cand_r, size)
    d2 = (pts[:, 0:1] - cx) ** 2 + (pts[:, 1:2] - cy) ** 2
    # the assigned cell (offset index 0) is the distance argmin
    assert (d2.argmin(axis=1) == 0).mean() > 0.999  # ties measure-zero
    assert (d2[:, 0] <= d2.min(axis=1) + 1e-9).all()


def test_pack_unpack_and_distance(spark):
    df = spark.createDataFrame(
        [(5, -3), (-100, 42), (0, 0), (2_000_000, -2_000_000)],
        "q long, r long")
    packed = df.select("q", "r", H.hex_pack(F.col("q"), F.col("r")).alias("c"))
    uq, ur = H.hex_unpack(F.col("c"))
    back = packed.select("q", "r", uq.alias("q2"), ur.alias("r2")).collect()
    assert all(b.q == b.q2 and b.r == b.r2 for b in back)

    d = spark.range(1).select(
        H.hex_distance(F.lit(0), F.lit(0), F.lit(3), F.lit(-1)).alias("d1"),
        H.hex_distance(F.lit(2), F.lit(2), F.lit(2), F.lit(2)).alias("d0"),
        H.hex_distance(F.lit(0), F.lit(0), F.lit(-2), F.lit(5)).alias("d2"),
    ).collect()[0]
    assert (d.d1, d.d0, d.d2) == (3, 0, 5)


def test_ring_offsets():
    seen = set()
    for k in range(5):
        ring = H.hex_ring_offsets(k)
        assert len(ring) == (1 if k == 0 else 6 * k)
        for dq, dr in ring:
            # every ring-k cell is at hex distance exactly k
            assert (abs(dq) + abs(dr) + abs(dq + dr)) // 2 == k
            seen.add((dq, dr))
    # rings are disjoint and tile the radius-4 disk: 1 + 6 * (1+2+3+4)
    assert len(seen) == 1 + 6 * 10


def test_sql_twin_parity(spark):
    df, xy = _pts_df(spark, 2500, seed=8)
    q, r = H.hex_cell_cols(F.col("x"), F.col("y"), 2.5)
    got = df.select("i", q.alias("q"), r.alias("r")).orderBy("i").toPandas()
    qs, rs = H.hex_cell_sql("x", "y", 2.5)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"i": np.arange(len(xy)),
                                      "x": xy[:, 0], "y": xy[:, 1]}))
    want = con.sql(
        f"SELECT i, {qs} AS q, {rs} AS r FROM pts ORDER BY i").df()
    assert (got["q"].to_numpy() == want["q"].to_numpy()).all()
    assert (got["r"].to_numpy() == want["r"].to_numpy()).all()
    cxs, cys = H.hex_center_sql("q", "r", 2.5)
    cx, cy = H.hex_center_cols(F.col("q"), F.col("r"), 2.5)
    gotc = spark.createDataFrame(got).select(
        cx.alias("cx"), cy.alias("cy")).toPandas()
    con.register("cells", want)
    wantc = con.sql(f"SELECT {cxs} AS cx, {cys} AS cy FROM cells").df()
    assert (gotc["cx"].to_numpy() == wantc["cx"].to_numpy()).all()  # bit-exact
    assert (gotc["cy"].to_numpy() == wantc["cy"].to_numpy()).all()


def test_hex_smooth_matches_brute(spark):
    rng = np.random.default_rng(9)
    cells = {}
    for _ in range(150):
        cells[(int(rng.integers(-6, 6)), int(rng.integers(-6, 6)))] = \
            float(rng.uniform(0, 10))
    df = spark.createDataFrame(
        [(q, r, v) for (q, r), v in cells.items()],
        "hq long, hr long, value double")
    out = {(r.hq, r.hr): (r.smooth, r.n_nb)
           for r in H.hex_smooth(df).collect()}
    assert set(out) == set(cells)
    for (q, r), v in cells.items():
        nb = [cells[(q - dq, r - dr)]
              for dq, dr in [(0, 0), *H.HEX_DIRS]
              if (q - dq, r - dr) in cells]
        sm, n = out[(q, r)]
        assert n == len(nb)
        assert sm == pytest.approx(float(np.mean(nb)), rel=1e-12)


def test_hex_smooth_pure_jvm(spark):
    df = spark.createDataFrame([(0, 0, 1.0), (1, 0, 2.0)],
                               "hq long, hr long, value double")
    plan = H.hex_smooth(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_hex_disk_offsets():
    for r in range(4):
        disk = H.hex_disk_offsets(r)
        assert len(disk) == 1 + 3 * r * (r + 1)
        for dq, dr in disk:
            assert (abs(dq) + abs(dr) + abs(dq + dr)) // 2 <= r


def _brute_knn(pts, tgt, k):
    d = np.sqrt((pts[:, 0:1] - tgt[None, :, 0]) ** 2
                + (pts[:, 1:2] - tgt[None, :, 1]) ** 2)
    # tie-break toward smaller target id: argsort on (dist, id) via stable
    order = np.argsort(d, axis=1, kind="stable")
    return d, order[:, :k]


def test_hex_knn_exact_when_ring_covers(spark):
    rng = np.random.default_rng(11)
    pts = rng.uniform(-10, 10, size=(300, 2))
    tgt = rng.uniform(-10, 10, size=(40, 2))
    pdf = pd.DataFrame({"doc_id": np.arange(300),
                        "lon": pts[:, 0], "lat": pts[:, 1]})
    tdf = pd.DataFrame({"target_id": np.arange(40),
                        "lon": tgt[:, 0], "lat": tgt[:, 1]})
    # size 4, ring 8 -> guaranteed radius 4*(1.5*8-0.5)=46 > extent diam
    out = H.hex_knn_join(
        spark.createDataFrame(pdf), spark.createDataFrame(tdf),
        k=3, size=4.0, ring=8,
    ).collect()
    got = {}
    for row in out:
        got.setdefault(row.doc_id, {})[row.knn_rank] = (row.target_id, row.dist)
    d, top = _brute_knn(pts, tgt, 3)
    assert set(got) == set(range(300))
    for i in range(300):
        for rk in (1, 2, 3):
            tid, dist = got[i][rk]
            assert dist == pytest.approx(d[i, top[i, rk - 1]], rel=1e-12)
            # same target unless a tie (then dist equality suffices)
            assert tid == top[i, rk - 1] or dist == pytest.approx(
                d[i, tid], rel=1e-12)


def test_hex_knn_bounded_ring_guarantee(spark):
    # ring=1 at size s guarantees exactness within radius s*(1.5-0.5)=s
    rng = np.random.default_rng(12)
    pts = rng.uniform(-20, 20, size=(400, 2))
    tgt = rng.uniform(-20, 20, size=(600, 2))
    s = 3.0
    pdf = pd.DataFrame({"doc_id": np.arange(400),
                        "lon": pts[:, 0], "lat": pts[:, 1]})
    tdf = pd.DataFrame({"target_id": np.arange(600),
                        "lon": tgt[:, 0], "lat": tgt[:, 1]})
    out = {r.doc_id: r.dist for r in H.hex_knn_join(
        spark.createDataFrame(pdf), spark.createDataFrame(tdf),
        k=1, size=s, ring=1).collect()}
    d, _ = _brute_knn(pts, tgt, 1)
    dmin = d.min(axis=1)
    for i in range(400):
        if dmin[i] <= s:  # inside the guarantee radius -> must be exact
            assert out[i] == pytest.approx(dmin[i], rel=1e-12)


def test_hex_knn_pure_jvm_plan(spark):
    p = spark.createDataFrame([(0, 1.0, 2.0)], "doc_id long, lon double, lat double")
    t = spark.createDataFrame([(0, 1.5, 2.5)], "target_id long, lon double, lat double")
    plan = H.hex_knn_join(p, t, k=1, size=2.0, ring=2)\
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
