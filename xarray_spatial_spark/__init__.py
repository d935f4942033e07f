"""xarray_spatial_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of xarray-spatial's raster analytics
(reference: /root/reference, read-only) as distributed DataFrame
operators over long-form cell tables and Common-Crawl-style document
tables. The reference's execution machinery (numba kernels, dask
graphs, CUDA) is NOT ported; only operator semantics, NaN/nodata
rules, and numeric formulas are carried over, re-planned for
Catalyst/Tungsten:

- dense raster (y, x) -> value            => long-form DataFrame (cell per row)
- dask chunk + map_overlap halo           => tile partitions + explicit halo exchange
- per-block partial stats + combine       => Catalyst partial/final HashAggregate
- numba stencil kernels                   => vectorized numpy inside applyInPandas
- proximity DP scan                       => distance-bounded broadcast NN join

Data model and operator inventory are documented in /root/repo/SURVEY.md.
"""

from xarray_spatial_spark.session import get_spark
from xarray_spatial_spark.grid import GridSpec

# Reference-parity top-level namespace (xrspatial/__init__.py:1-40):
# every name the reference re-exports resolves here too, so reference
# call sites port by swapping the import and passing DataFrames.
# Lazy via module __getattr__ — importing the package stays light.
_LAZY = {
    # surface
    "slope": ("operators.surface", "slope"),
    "aspect": ("operators.surface", "aspect"),
    "curvature": ("operators.surface", "curvature"),
    "hillshade": ("operators.surface", "hillshade"),
    "summarize_terrain": ("operators.surface", "summarize_terrain"),
    # focal (reference exports `mean` at top level)
    "mean": ("operators.focal", "mean"),
    "hotspots": ("operators.focal", "hotspots"),
    "convolve_2d": ("operators.convolution", "convolve_2d"),
    # classify
    "binary": ("operators.classify", "binary"),
    "box_plot": ("operators.classify", "box_plot"),
    "head_tail_breaks": ("operators.classify", "head_tail_breaks"),
    "maximum_breaks": ("operators.classify", "maximum_breaks"),
    "percentiles": ("operators.classify", "percentiles"),
    "std_mean": ("operators.classify", "std_mean"),
    "equal_interval": ("operators.classify", "equal_interval"),
    "natural_breaks": ("operators.classify", "natural_breaks"),
    "quantile": ("operators.classify", "quantile"),
    "reclassify": ("operators.classify", "reclassify"),
    # multispectral
    "arvi": ("operators.multispectral", "arvi"),
    "evi": ("operators.multispectral", "evi"),
    "nbr": ("operators.multispectral", "nbr"),
    "nbr2": ("operators.multispectral", "nbr2"),
    "ndvi": ("operators.multispectral", "ndvi"),
    "ndmi": ("operators.multispectral", "ndmi"),
    "savi": ("operators.multispectral", "savi"),
    "sipi": ("operators.multispectral", "sipi"),
    "ebbi": ("operators.multispectral", "ebbi"),
    "gci": ("operators.multispectral", "gci"),
    "true_color": ("operators.multispectral", "true_color"),
    # proximity family
    "proximity": ("operators.proximity", "proximity"),
    "allocation": ("operators.proximity", "allocation"),
    "direction": ("operators.proximity", "direction"),
    "euclidean_distance": ("functions.geo", "euclidean_dist"),
    "manhattan_distance": ("functions.geo", "manhattan_dist"),
    "great_circle_distance": ("functions.geo", "great_circle_dist"),
    # zonal
    "zonal_stats": ("operators.zonal", "stats"),
    "zonal_apply": ("operators.zonal", "apply"),
    "zonal_crosstab": ("operators.zonal", "crosstab"),
    "crop": ("operators.zonal", "crop"),
    "trim": ("operators.zonal", "trim"),
    "regions": ("operators.regions", "regions"),
    "suggest_zonal_canvas": ("operators.zonal", "suggest_zonal_canvas"),
    # global / generators / misc
    "a_star_search": ("operators.pathfinding", "a_star_search"),
    "viewshed": ("operators.viewshed", "viewshed"),
    "generate_terrain": ("sources.terrain", "generate_terrain"),
    "perlin": ("sources.terrain", "perlin"),
    "bump": ("sources.bump", "bump"),
    "diagnose": ("diagnostics", "diagnose"),
    "polygonize": ("operators.polygonize", "polygonize"),
}


def __getattr__(name: str):
    target = _LAZY.get(name)
    if target is None:
        raise AttributeError(
            f"module 'xarray_spatial_spark' has no attribute {name!r}"
        )
    import importlib

    mod = importlib.import_module(f"xarray_spatial_spark.{target[0]}")
    fn = getattr(mod, target[1])
    globals()[name] = fn  # cache for subsequent lookups
    return fn


def __dir__():
    return sorted(set(globals()) | set(_LAZY))


__all__ = ["get_spark", "GridSpec", *sorted(_LAZY)]
__version__ = "0.2.0"
