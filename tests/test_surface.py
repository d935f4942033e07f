"""Surface-family tests: QGIS cross-check goldens from the reference
suite (test_slope.py:23-49, test_aspect.py:20-36), curvature
convex/concave goldens (test_curvature.py:27-60), hillshade numpy
oracle, and tiling invariance."""

import numpy as np
import pytest

from xarray_spatial_spark.operators import surface
from xarray_spatial_spark.raster import df_from_numpy, numpy_from_df

ELEVATION = np.array(
    [
        [np.nan, np.nan, np.nan, np.nan, np.nan, np.nan],
        [704.237, 242.24084, 429.3324, 779.8816, 193.29506, 984.6926],
        [226.56795, 815.7483, 290.6041, 76.49687, 820.89716, 32.27882],
        [344.8238, 256.34998, 806.8326, 602.0442, 721.1633, 496.95636],
        [185.43515, 834.10425, 387.0871, 716.0262, 49.61273, 752.95483],
        [302.4271, 151.49211, 442.32797, 358.4702, 659.8187, 447.1241],
        [148.04834, 819.2133, 468.97913, 977.11694, 597.69666, 999.14185],
        [268.1575, 625.96466, 840.26483, 448.28333, 859.2699, 528.04095],
    ],
    dtype=np.float32,
)


def _grid(df, col="value"):
    return numpy_from_df(df, value_col=col)


def test_slope_against_qgis(spark):
    qgis_slope = np.array(
        [
            [np.nan] * 6,
            [np.nan] * 6,
            [89.707756, 88.56143, 89.45366, 89.50229, 88.82584, 89.782394],
            [89.78415, 89.61588, 89.47127, 89.24196, 88.385376, 89.67071],
            [89.7849, 89.61132, 89.59183, 89.56854, 88.90889, 89.765114],
            [89.775246, 89.42886, 89.25054, 89.60963, 89.71719, 89.76396],
            [89.85427, 89.75693, 89.67336, 89.502174, 89.24611, 89.352],
            [89.87612, 89.76542, 89.269966, 89.78526, 88.35767, 89.764206],
        ],
        dtype=np.float32,
    )
    df = df_from_numpy(spark, ELEVATION)
    got = _grid(surface.slope(df, cellsize_x=1, cellsize_y=1))
    # reference compares interior only (test_slope.py:45-49)
    np.testing.assert_allclose(
        got[1:-1, 1:-1], qgis_slope[1:-1, 1:-1], rtol=1e-5, equal_nan=True
    )
    # nan border edges
    assert np.isnan(got[0, :]).all() and np.isnan(got[-1, :]).all()
    assert np.isnan(got[:, 0]).all() and np.isnan(got[:, -1]).all()


def test_aspect_against_qgis(spark):
    qgis_aspect = np.array(
        [
            [np.nan] * 6,
            [np.nan] * 6,
            [233.19478, 278.358, 45.18813, 306.6476, 358.34296, 106.45898],
            [267.7002, 274.42487, 11.035832, 357.9641, 129.98279, 50.069843],
            [263.18484, 238.47426, 196.37103, 149.25227, 187.85748, 263.684],
            [266.63937, 271.05124, 312.09726, 348.89136, 351.618, 315.59424],
            [279.90872, 314.11356, 345.76315, 327.5568, 339.5455, 312.9249],
            [271.93985, 268.81046, 24.793104, 185.978, 299.82904, 159.0188],
        ],
        dtype=np.float32,
    )
    df = df_from_numpy(spark, ELEVATION)
    got = _grid(surface.aspect(df))
    np.testing.assert_allclose(
        got[1:-1, 1:-1], qgis_aspect[1:-1, 1:-1], rtol=1e-5, equal_nan=True
    )


def test_curvature_convex_concave(spark):
    convex = np.zeros((5, 6))
    convex[2, 3] = -1.0
    expected = np.array(
        [
            [np.nan] * 6,
            [np.nan, 0, 0.0, 100.0, 0.0, np.nan],
            [np.nan, 0, 100.0, -400.0, 100.0, np.nan],
            [np.nan, 0, 0.0, 100.0, 0.0, np.nan],
            [np.nan] * 6,
        ]
    )
    got = _grid(surface.curvature(df_from_numpy(spark, convex), cellsize=1))
    np.testing.assert_allclose(got, expected, equal_nan=True)
    got2 = _grid(surface.curvature(df_from_numpy(spark, -convex), cellsize=1))
    np.testing.assert_allclose(got2, -np.nan_to_num(expected) + expected * 0, equal_nan=True)


def test_hillshade_oracle(spark):
    """Independent numpy replication of hillshade.py:20-35."""
    rng = np.random.default_rng(11)
    data = rng.uniform(0, 100, (9, 12)).astype(np.float32)
    df = df_from_numpy(spark, data)
    got = _grid(surface.hillshade(df, azimuth=225, angle_altitude=25))

    az = 360.0 - 225.0
    gx, gy = np.gradient(data)
    sl = np.pi / 2.0 - np.arctan(np.sqrt(gx * gx + gy * gy))
    asp = np.arctan2(-gx, gy)
    azr, altr = az * np.pi / 180, 25 * np.pi / 180
    shaded = np.sin(altr) * np.sin(sl) + np.cos(altr) * np.cos(sl) * np.cos(
        (azr - np.pi / 2.0) - asp
    )
    expected = (shaded + 1) / 2
    expected[(0, -1), :] = np.nan
    expected[:, (0, -1)] = np.nan
    # interior cells not adjacent to the border match exactly; cells one
    # in from the border see the NaN halo instead of one-sided gradient
    np.testing.assert_allclose(got[2:-2, 2:-2], expected[2:-2, 2:-2], rtol=1e-6)
    assert np.isnan(got[0, :]).all()


@pytest.mark.parametrize("op", ["slope", "aspect", "curvature"])
def test_tiling_invariance_surface(spark, op):
    rng = np.random.default_rng(2841)
    data = rng.integers(-100, 100, (12, 10)).astype(float)
    df = df_from_numpy(spark, data)
    fn = getattr(surface, op)
    base = _grid(fn(df, tile_h=256, tile_w=256))
    got = _grid(fn(df, tile_h=3, tile_w=4))
    np.testing.assert_allclose(got, base, equal_nan=True)


def test_summarize_terrain_matches_individual_ops(spark):
    rng = np.random.default_rng(5)
    data = rng.uniform(0, 500, (10, 8))
    df = df_from_numpy(spark, data)
    fused = surface.summarize_terrain(df, cellsize_x=1, cellsize_y=1)
    np.testing.assert_allclose(
        _grid(fused, "slope"), _grid(surface.slope(df)), equal_nan=True
    )
    np.testing.assert_allclose(
        _grid(fused, "aspect"), _grid(surface.aspect(df)), equal_nan=True
    )
    np.testing.assert_allclose(
        _grid(fused, "curvature"), _grid(surface.curvature(df)), equal_nan=True
    )
