# Operator modules are imported directly (xarray_spatial_spark.operators.zonal, ...);
# no eager re-exports so partial builds stay importable.
