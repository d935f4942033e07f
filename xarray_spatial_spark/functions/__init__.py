# Function modules are imported directly (xarray_spatial_spark.functions.geo, ...);
# no eager re-exports so partial builds stay importable.
