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

__all__ = ["get_spark", "GridSpec"]
__version__ = "0.1.0"
