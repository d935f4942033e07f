"""Dense-tile raster format: round-trip, stencil parity with the
long-form path, tiled terrain parity, global stats."""

import numpy as np
import pytest

from xarray_spatial_spark import raster, tiled
from xarray_spatial_spark.operators import focal, surface
from xarray_spatial_spark.operators.convolution import circle_kernel


@pytest.fixture(scope="module")
def arr():
    rng = np.random.default_rng(42)
    a = rng.uniform(0, 100, size=(70, 93))
    a[5, 7] = np.nan
    a[40:44, 60:66] = np.nan
    return a


def test_tile_untile_roundtrip(spark, arr):
    df = raster.df_from_numpy(spark, arr)
    tdf = tiled.tile(df, tile_h=32, tile_w=32)
    back = tiled.numpy_from_tiled(tdf)
    np.testing.assert_array_equal(back, np.where(np.isfinite(arr), arr, np.nan))
    # long-form round trip
    long = tiled.untile(tdf)
    dense = raster.numpy_from_df(long)
    np.testing.assert_array_equal(dense, back)


def test_tile_partial_edges(spark, arr):
    df = raster.df_from_numpy(spark, arr)
    tdf = tiled.tile(df, tile_h=32, tile_w=32)
    rows = tdf.collect()
    # 70x93 at 32 -> 3x3 tile grid with clipped bottom/right
    assert len(rows) == 9
    for r in rows:
        assert r["h"] == (6 if r["ty"] == 2 else 32)
        assert r["w"] == (29 if r["tx"] == 2 else 32)
        assert len(r["value"]) == r["h"] * r["w"] * 8


@pytest.mark.parametrize("op,kwargs", [
    (surface.slope, {"cellsize_x": 3.0, "cellsize_y": 2.0}),
    (surface.aspect, {}),
    (surface.curvature, {"cellsize": 2.0}),
    (surface.hillshade, {}),
])
def test_surface_tiled_matches_long(spark, arr, op, kwargs):
    df = raster.df_from_numpy(spark, arr)
    expected = raster.numpy_from_df(op(df, tile_h=32, tile_w=32, **kwargs))
    tdf = tiled.tile(df, tile_h=32, tile_w=32)
    got = tiled.numpy_from_tiled(op(tdf, **kwargs))
    np.testing.assert_allclose(got, expected, rtol=1e-6, equal_nan=True)


def test_focal_mean_tiled_matches_long(spark, arr):
    df = raster.df_from_numpy(spark, arr)
    expected = raster.numpy_from_df(focal.mean(df, tile_h=32, tile_w=32))
    tdf = tiled.tile(df, tile_h=32, tile_w=32)
    got = tiled.numpy_from_tiled(focal.mean(tdf))
    np.testing.assert_allclose(got, expected, rtol=1e-12, equal_nan=True)


def test_focal_stats_radius2_tiled(spark, arr):
    k = circle_kernel(1, 1, 2.5)
    df = raster.df_from_numpy(spark, arr)
    long_out = focal.focal_stats(df, k, stats_funcs=("mean", "max", "sum"),
                                 tile_h=32, tile_w=32)
    tdf = tiled.tile(df, tile_h=32, tile_w=32)
    tiled_out = focal.focal_stats(tdf, k, stats_funcs=("mean", "max", "sum"))
    for c in ("mean", "max", "sum"):
        np.testing.assert_allclose(
            tiled.numpy_from_tiled(tiled_out, value_col=c),
            raster.numpy_from_df(long_out, value_col=c),
            rtol=1e-12, equal_nan=True,
        )


def test_hotspots_tiled_matches_long(spark):
    rng = np.random.default_rng(3)
    a = rng.normal(10, 2, size=(60, 60))
    a[10:14, 10:14] += 40  # hot blob
    k = circle_kernel(1, 1, 1.5)
    df = raster.df_from_numpy(spark, a)
    expected = raster.numpy_from_df(focal.hotspots(df, k, tile_h=32, tile_w=32))
    tdf = tiled.tile(df, tile_h=32, tile_w=32)
    got = tiled.numpy_from_tiled(focal.hotspots(tdf, k))
    np.testing.assert_allclose(got, expected, equal_nan=True)


def test_global_stats(spark, arr):
    df = raster.df_from_numpy(spark, arr)
    tdf = tiled.tile(df, tile_h=32, tile_w=32)
    gs = tiled.global_stats(tdf)
    finite = arr[np.isfinite(arr)]
    assert gs["count"] == finite.size
    np.testing.assert_allclose(gs["mean"], finite.mean())
    np.testing.assert_allclose(gs["std"], finite.std())
    np.testing.assert_allclose(gs["min"], finite.min())
    np.testing.assert_allclose(gs["max"], finite.max())


def test_terrain_tiled_bit_matches_long(spark):
    from xarray_spatial_spark.sources.terrain import (
        generate_terrain, generate_terrain_tiled,
    )

    long_arr = raster.numpy_from_df(
        generate_terrain(spark, 96, 80, seed=10), value_col="value"
    )
    tiled_arr = tiled.numpy_from_tiled(
        generate_terrain_tiled(spark, 96, 80, seed=10, tile=48)
    )
    np.testing.assert_allclose(tiled_arr, long_arr, rtol=1e-12)


def test_summarize_terrain_tiled(spark, arr):
    df = raster.df_from_numpy(spark, arr)
    long_out = surface.summarize_terrain(df, tile_h=32, tile_w=32)
    tdf = tiled.tile(df, tile_h=32, tile_w=32)
    tiled_out = surface.summarize_terrain(tdf)
    for c in ("slope", "aspect", "curvature"):
        np.testing.assert_allclose(
            tiled.numpy_from_tiled(tiled_out, value_col=c),
            raster.numpy_from_df(long_out, value_col=c),
            rtol=1e-6, equal_nan=True,
        )


def test_float32_tiles_match_float64(spark, arr):
    df = raster.df_from_numpy(spark, arr)
    t64 = tiled.tile(df, tile_h=32, tile_w=32)
    t32 = tiled.tile(df, tile_h=32, tile_w=32, dtype=np.float32)
    s64 = tiled.numpy_from_tiled(surface.slope(t64))
    s32 = tiled.numpy_from_tiled(surface.slope(t32))
    # slope computes in float32 on both paths; storage dtype only
    # changes the final widening
    np.testing.assert_allclose(s32, s64, rtol=1e-5, equal_nan=True)
    gs = tiled.global_stats(t32)
    finite = arr[np.isfinite(arr)]
    np.testing.assert_allclose(gs["mean"], finite.mean(), rtol=1e-6)


def test_fuse_stencils_matches_chained(spark, arr):
    """3 fused focal-mean stages in ONE halo pass == 3 separate
    passes; and the plan has exactly one stencil exchange."""
    from xarray_spatial_spark.operators.focal import mean as focal_mean

    df = raster.df_from_numpy(spark, arr)
    tdf = tiled.tile(df, tile_h=32, tile_w=32)
    chained = tiled.numpy_from_tiled(focal_mean(focal_mean(focal_mean(tdf))))

    def mean3(arrs):
        a = arrs["value"]
        nanmask = np.isnan(a)
        vals = np.where(nanmask, 0.0, a)
        ones = (~nanmask).astype(a.dtype)
        s = np.zeros((a.shape[0] - 2, a.shape[1] - 2), dtype=a.dtype)
        c = np.zeros_like(s)
        for dy in range(3):
            for dx in range(3):
                s += vals[dy:dy + s.shape[0], dx:dx + s.shape[1]]
                c += ones[dy:dy + s.shape[0], dx:dx + s.shape[1]]
        sm = np.where(c > 0, s / c, np.nan)
        interior = a[1:-1, 1:-1]
        return {"value": np.where(np.isnan(interior), interior, sm)}

    fn, r = tiled.fuse_stencils([(mean3, 1)] * 3)
    assert r == 3
    fused_df = tiled.apply_stencil_tiled(tdf, fn, r)
    fused = tiled.numpy_from_tiled(fused_df)
    np.testing.assert_allclose(fused, chained, rtol=1e-12, equal_nan=True)
    plan = fused_df._jdf.queryExecution().executedPlan().toString()
    assert (plan.count("FlatMapGroupsInPandas")
            + plan.count("FlatMapGroupsInArrow")) == 2  # tile() pack + ONE stencil


def test_focal_mean_multipass_fused(spark, arr):
    """tiled focal.mean(passes=3) must equal the long-form 3-pass
    result while shuffling once."""
    df = raster.df_from_numpy(spark, arr)
    expected = raster.numpy_from_df(focal.mean(df, passes=3, tile_h=32, tile_w=32))
    tdf = tiled.tile(df, tile_h=32, tile_w=32)
    out = focal.mean(tdf, passes=3)
    got = tiled.numpy_from_tiled(out)
    np.testing.assert_allclose(got, expected, rtol=1e-12, equal_nan=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert (plan.count("FlatMapGroupsInPandas")
            + plan.count("FlatMapGroupsInArrow")) == 2  # pack + one stencil


def test_broadcast_halo_matches_shuffle(spark, arr):
    """Broadcast-strips halo (zero shuffle) must equal the shuffle
    path bit-for-bit, ragged edge tiles and NaN blobs included."""
    df = raster.df_from_numpy(spark, arr)
    tdf = tiled.tile(df, tile_h=32, tile_w=32).persist()
    try:
        base = tiled.numpy_from_tiled(surface.slope(tdf), value_col="value")
        spark.conf.set("spark.xrspatial.halo.strategy", "broadcast")
        got = tiled.numpy_from_tiled(surface.slope(tdf), value_col="value")
        np.testing.assert_array_equal(base, got)
        # radius-2 (multi-column strips through the edge blobs)
        spark.conf.set("spark.xrspatial.halo.strategy", "shuffle")
        k = np.ones((5, 5))
        b2 = tiled.numpy_from_tiled(
            focal.focal_stats(tdf, k, stats_funcs=("mean",)),
            value_col="mean")
        spark.conf.set("spark.xrspatial.halo.strategy", "broadcast")
        g2 = tiled.numpy_from_tiled(
            focal.focal_stats(tdf, k, stats_funcs=("mean",)),
            value_col="mean")
        np.testing.assert_array_equal(b2, g2)
    finally:
        spark.conf.set("spark.xrspatial.halo.strategy", "shuffle")
        tdf.unpersist()


def test_broadcast_halo_no_shuffle_plan(spark, arr):
    """The broadcast strategy's stencil job plans with NO exchange."""
    df = raster.df_from_numpy(spark, arr)
    tdf = tiled.tile(df, tile_h=32, tile_w=32).persist()
    try:
        tdf.count()
        spark.conf.set("spark.xrspatial.halo.strategy", "broadcast")
        sl = surface.slope(tdf)
        plan = sl._sc._jvm.PythonSQLUtils.explainString(
            sl._jdf.queryExecution(), "formatted")
        stencil = plan.split("InMemoryTableScan")[0]
        assert "Exchange" not in stencil
        assert "MapInPandas" in stencil or "MapInArrow" in stencil
    finally:
        spark.conf.set("spark.xrspatial.halo.strategy", "shuffle")
        tdf.unpersist()


def test_broadcast_halo_cap(spark, arr):
    df = raster.df_from_numpy(spark, arr)
    tdf = tiled.tile(df, tile_h=32, tile_w=32)
    spark.conf.set("spark.xrspatial.halo.broadcast.maxBytes", "16")
    try:
        with pytest.raises(ValueError, match="broadcast cap"):
            tiled.halo_map_tiled(tdf, 1, ["value"],
                                 lambda m, p: None, "ty long",
                                 strategy="broadcast")
    finally:
        spark.conf.unset("spark.xrspatial.halo.broadcast.maxBytes")


def test_bucket_halo_matches_shuffle(spark, arr):
    """Co-partitioned (bucket) halo == shuffle path bit-for-bit,
    cross-super-tile regions, ragged edges and NaN blobs included."""
    df = raster.df_from_numpy(spark, arr)
    tdf = tiled.tile(df, tile_h=16, tile_w=16).persist()
    try:
        base = tiled.numpy_from_tiled(surface.slope(tdf), value_col="value")
        spark.conf.set("spark.xrspatial.halo.strategy", "bucket")
        spark.conf.set("spark.xrspatial.halo.block", "2")
        got = tiled.numpy_from_tiled(surface.slope(tdf), value_col="value")
        np.testing.assert_array_equal(base, got)
        k = np.ones((5, 5))
        spark.conf.set("spark.xrspatial.halo.strategy", "shuffle")
        b2 = tiled.numpy_from_tiled(
            focal.focal_stats(tdf, k, stats_funcs=("mean",)),
            value_col="mean")
        spark.conf.set("spark.xrspatial.halo.strategy", "bucket")
        g2 = tiled.numpy_from_tiled(
            focal.focal_stats(tdf, k, stats_funcs=("mean",)),
            value_col="mean")
        np.testing.assert_array_equal(b2, g2)
    finally:
        spark.conf.set("spark.xrspatial.halo.strategy", "shuffle")
        spark.conf.unset("spark.xrspatial.halo.block")
        tdf.unpersist()


def test_bucket_halo_bucketed_table_no_main_exchange(spark, arr, tmp_path):
    """Over a write_bucketed table the raster side of the cogroup
    plans WITHOUT an exchange — only the perimeter strips shuffle —
    and the output still matches the shuffle path."""
    df = raster.df_from_numpy(spark, arr)
    tdf = tiled.tile(df, tile_h=16, tile_w=16)
    base = tiled.numpy_from_tiled(surface.slope(tdf), value_col="value")
    name = tiled.write_bucketed(tdf, "t_bucket_plan", buckets=4, block=2,
                                path=str(tmp_path / "tbl"))
    try:
        bt = spark.table(name)
        spark.conf.set("spark.xrspatial.halo.strategy", "bucket")
        spark.conf.set("spark.xrspatial.halo.block", "2")
        sl = surface.slope(bt)
        plan = sl._sc._jvm.PythonSQLUtils.explainString(
            sl._jdf.queryExecution(), "formatted")
        assert plan.count("Exchange") == 2  # strips side only (+legend)
        assert ("FlatMapCoGroupsInPandas" in plan
                    or "FlatMapCoGroupsInArrow" in plan)
        got = tiled.numpy_from_tiled(sl, value_col="value")
        np.testing.assert_array_equal(base, got)
    finally:
        spark.conf.set("spark.xrspatial.halo.strategy", "shuffle")
        spark.conf.unset("spark.xrspatial.halo.block")
        spark.sql("DROP TABLE IF EXISTS t_bucket_plan")


def test_focal_stats_float32_high_dynamic_range(spark):
    """float32 tiles with |mean| >> std: the slice-stat second moment
    must accumulate in float64 or var/std collapse to rounding noise."""
    rng = np.random.default_rng(77)
    big = rng.uniform(3000, 4000, (40, 40))
    df = raster.df_from_numpy(spark, big)
    t32 = tiled.tile(df, tile_h=16, tile_w=16, dtype=np.float32)
    k = np.ones((3, 3))
    got = tiled.numpy_from_tiled(
        focal.focal_stats(t32, k, stats_funcs=("std",)), value_col="std")
    # reference: float64 per-window nanstd of the float32-rounded data
    a32 = big.astype(np.float32).astype(np.float64)
    pad = np.full((42, 42), np.nan)
    pad[1:-1, 1:-1] = a32
    exp = np.full_like(a32, np.nan)
    import warnings as _w
    for y in range(40):
        for x in range(40):
            with _w.catch_warnings():
                _w.simplefilter("ignore")
                exp[y, x] = np.nanstd(pad[y:y+3, x:x+3])
    np.testing.assert_allclose(got, exp, rtol=1e-4, equal_nan=True)


def test_arrow_assemble_matches_pandas(spark, arr):
    """The applyInArrow assemble (zero-copy blob reads) must equal the
    applyInPandas twin bit-for-bit on the shuffle strategy."""
    df = raster.df_from_numpy(spark, arr)
    tdf = tiled.tile(df, tile_h=32, tile_w=32)
    outs = {}
    for flag in ("true", "false"):
        spark.conf.set("spark.xrspatial.halo.arrow", flag)
        try:
            outs[flag] = tiled.numpy_from_tiled(surface.slope(tdf))
        finally:
            spark.conf.unset("spark.xrspatial.halo.arrow")
    np.testing.assert_array_equal(outs["true"], outs["false"])


def test_heterogeneous_fused_chain_matches_sequential(spark, arr):
    """smooth -> slope -> smooth as ONE fused exchange == the three
    operators run sequentially (3 exchanges), using the public kernel
    factories (focal.mean_stencil / surface.slope_stencil)."""
    from xarray_spatial_spark.operators.focal import mean_stencil
    from xarray_spatial_spark.operators.surface import slope_stencil

    df = raster.df_from_numpy(spark, arr)
    tdf = tiled.tile(df, tile_h=32, tile_w=32)
    seq = tiled.numpy_from_tiled(
        focal.mean(surface.slope(focal.mean(tdf)))
    )
    fn, r = tiled.fuse_stencils(
        [mean_stencil(), slope_stencil(), mean_stencil()]
    )
    assert r == 3
    fused_df = tiled.apply_stencil_tiled(tdf, fn, r)
    fused = tiled.numpy_from_tiled(fused_df)
    np.testing.assert_allclose(fused, seq, rtol=1e-6, equal_nan=True)


def test_auto_dispatch_bucket_for_bucketed_table(spark, arr, tmp_path):
    """With NO strategy conf set, a write_bucketed raster (carries the
    bk super-tile key) takes the bucket plan; a plain tiled raster
    takes shuffle.  Results identical either way."""
    df = raster.df_from_numpy(spark, arr)
    tdf = tiled.tile(df, tile_h=32, tile_w=32)
    name = tiled.write_bucketed(tdf, "t_auto_bucket", buckets=4, block=2,
                                path=str(tmp_path / "t_auto_bucket"))
    try:
        spark.conf.unset("spark.xrspatial.halo.strategy")
        bt = tiled.read_table(spark, name)
        out_b = surface.slope(bt)
        plan = out_b._jdf.queryExecution().executedPlan().toString()
        # bucket plan signature: a cogroup node (pandas or arrow flavor)
        assert ("FlatMapCoGroups" in plan), plan
        a_bucket = tiled.numpy_from_tiled(out_b)
        a_shuffle = tiled.numpy_from_tiled(surface.slope(tdf))
        np.testing.assert_array_equal(a_bucket, a_shuffle)
    finally:
        spark.conf.unset("spark.xrspatial.halo.strategy")
        spark.sql("DROP TABLE IF EXISTS t_auto_bucket")
        tiled.table_scan_conf(spark)


def test_slope_tiled_jvm_matches_python(spark, arr):
    """Compiled JVM slope kernel (jvm/xss_kernels.jar) == the Python
    kernel to float32 ulp (atan comes from different libms), same NaN
    domain edges.  Builds the jar on first run; skips if no JDK."""
    import subprocess

    if tiled.jvm_kernels_jar() is None:
        import os
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(["sh", "scripts/build_jvm_kernels.sh"],
                           capture_output=True, cwd=repo)
        if r.returncode != 0 or tiled.jvm_kernels_jar() is None:
            pytest.skip("JDK/javac unavailable; JVM kernel not built")
    df = raster.df_from_numpy(spark, arr)
    tdf = tiled.tile(df, tile_h=32, tile_w=32, dtype=np.float32)
    spark.conf.set("spark.xrspatial.halo.strategy", "shuffle")
    try:
        py = tiled.numpy_from_tiled(surface.slope(tdf))
        jv = tiled.numpy_from_tiled(tiled.slope_tiled_jvm(tdf))
    finally:
        spark.conf.unset("spark.xrspatial.halo.strategy")
    assert (np.isnan(py) == np.isnan(jv)).all()
    np.testing.assert_allclose(jv, py, atol=1e-4, equal_nan=True)


def test_two_bucketed_tables_different_blocks_coexist(spark, arr, tmp_path):
    """Block size rides each DataFrame's bk metadata: opening a
    second table with a different block must not poison the first
    (the round-3 review caught conf last-read-wins doing exactly
    that)."""
    df = raster.df_from_numpy(spark, arr)
    tdf = tiled.tile(df, tile_h=32, tile_w=32)
    a = tiled.write_bucketed(tdf, "t_blk2", buckets=4, block=2,
                             path=str(tmp_path / "b2"))
    b = tiled.write_bucketed(tdf, "t_blk4", buckets=4, block=4,
                             path=str(tmp_path / "b4"))
    try:
        spark.conf.unset("spark.xrspatial.halo.strategy")
        da = tiled.read_table(spark, a)
        db = tiled.read_table(spark, b)  # would clobber a conf-based block
        out_a = tiled.numpy_from_tiled(surface.slope(da))
        out_b = tiled.numpy_from_tiled(surface.slope(db))
        ref = tiled.numpy_from_tiled(surface.slope(tdf))
        np.testing.assert_array_equal(out_a, ref)
        np.testing.assert_array_equal(out_b, ref)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_blk2")
        spark.sql("DROP TABLE IF EXISTS t_blk4")
        tiled.table_scan_conf(spark)
