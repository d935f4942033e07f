"""Cell-index unit tests: Morton round-trip, parent/children, rings,
and the JVM-expression path agreeing with the numpy path."""

import numpy as np
from pyspark.sql import functions as F

from xarray_spatial_spark import grid


def test_morton_roundtrip():
    rng = np.random.default_rng(42)
    xt = rng.integers(0, 1 << 20, 1000)
    yt = rng.integers(0, 1 << 20, 1000)
    m = grid.morton_encode(xt, yt)
    dx, dy = grid.morton_decode(m)
    np.testing.assert_array_equal(dx, xt.astype(np.uint64))
    np.testing.assert_array_equal(dy, yt.astype(np.uint64))


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-85, 85, 500)
    for zoom in (0, 5, 12, 28):
        cells = grid.cell_of(lon, lat, zoom)
        xt, yt, z = grid.decode(cells)
        np.testing.assert_array_equal(z, zoom)
        ex, ey = grid.lnglat_to_tile(lon, lat, zoom)
        np.testing.assert_array_equal(xt, ex)
        np.testing.assert_array_equal(yt, ey)


def test_parent_contains_child():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-85, 85, 200)
    fine = grid.cell_of(lon, lat, 15)
    coarse = grid.parent(fine, 8)
    direct = grid.cell_of(lon, lat, 8)
    np.testing.assert_array_equal(coarse, direct)


def test_children_inverse_of_parent():
    c = grid.cell_of(np.array([12.3]), np.array([45.6]), 10)[0]
    kids = grid.children(int(c))
    assert len(kids) == 4
    np.testing.assert_array_equal(grid.parent(kids, 10), np.full(4, c))


def test_ring_sizes_and_disk():
    c = grid.cell_of(np.array([0.0]), np.array([0.0]), 10)
    disk = grid.neighbors_disk(c, 2)
    assert disk.shape == (1, 25)
    assert len(np.unique(disk)) == 25  # interior cell: no clamping dups
    r1 = grid.ring(c, 1)
    assert r1.shape == (1, 8)
    assert int(c[0]) not in r1


def test_lon_wrap_in_disk():
    # cell at the antimeridian: disk must wrap, not clamp, in x
    c = grid.cell_of(np.array([-179.99]), np.array([0.0]), 6)
    disk = grid.neighbors_disk(c, 1)
    xs = grid.decode(disk.ravel())[0]
    assert 0 in xs and (1 << 6) - 1 in xs


def test_column_path_matches_numpy(spark):
    rng = np.random.default_rng(11)
    import pandas as pd

    pdf = pd.DataFrame(
        {"lon": rng.uniform(-180, 180, 300), "lat": rng.uniform(-85, 85, 300)}
    )
    df = spark.createDataFrame(pdf)
    zoom = 9
    got = (
        df.select(
            grid.tile_x_col(F.col("lon"), zoom).alias("xt"),
            grid.tile_y_col(F.col("lat"), zoom).alias("yt"),
        )
        .toPandas()
    )
    ex, ey = grid.lnglat_to_tile(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), zoom)
    np.testing.assert_array_equal(got["xt"].to_numpy(), ex)
    np.testing.assert_array_equal(got["yt"].to_numpy(), ey)


def test_tile_bounds_roundtrip():
    c = int(grid.cell_of(np.array([12.3]), np.array([45.6]), 8)[0])
    lon0, lat0, lon1, lat1 = grid.tile_bounds(c)
    assert lon0 <= 12.3 <= lon1
    assert lat0 <= 45.6 <= lat1


def test_diagnose_unit_mismatch(spark):
    """Reference diagnostics.py UNIT_MISMATCH semantics: degree
    coordinates + elevation-range values -> warning; projected meters
    -> clean; non-surface tool -> skipped."""
    import numpy as np

    from xarray_spatial_spark.diagnostics import diagnose
    from xarray_spatial_spark.grid import GridSpec
    from xarray_spatial_spark.raster import df_from_numpy

    rng = np.random.default_rng(1)
    elev = rng.uniform(500, 1500, size=(20, 20))
    df = df_from_numpy(spark, elev)

    deg = GridSpec(20, 20, x0=-105.0, y0=40.0, xres=0.01, yres=0.01,
                   unit="degrees")
    rep = diagnose(df, deg, tool="slope")
    assert rep.has_warnings and rep.issues[0].code == "UNIT_MISMATCH"
    assert rep.horizontal_unit_type == "degrees"
    assert rep.vertical_unit_type == "elevation"
    assert "reprojecting" in str(rep)

    meters = GridSpec(20, 20, xres=30.0, yres=30.0, unit="meter")
    assert not diagnose(df, meters, tool="slope").has_issues

    # inferred degrees from coordinate envelope (no explicit unit)
    inferred = GridSpec(20, 20, x0=-105.0, y0=40.0, xres=0.01, yres=0.01,
                        unit="")
    assert diagnose(df, inferred).has_warnings

    # tool outside the surface family skips the check
    assert not diagnose(df, deg, tool="zonal_stats").has_issues

    # tiled input path
    from xarray_spatial_spark import tiled
    tdf = tiled.tile(df, tile_h=16, tile_w=16)
    assert diagnose(tdf, deg, tool="aspect").has_warnings
