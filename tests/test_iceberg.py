"""Iceberg source/sink (partitioned-parquet fallback in this sandbox)
+ the SURVEY §4 claim: a tile/zone predicate prunes partitions at the
scan."""

import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.operators.tiling import assign_cells
from xarray_spatial_spark.sources import iceberg
from xarray_spatial_spark.sources.documents import documents


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark.conf.set(f"spark.sql.catalog.{iceberg.CATALOG}.warehouse", wh)
    return wh


def test_round_trip(spark, warehouse):
    docs = assign_cells(documents(spark, 2000), zoom=10, tile_zoom=3)
    iceberg.write_table(docs, "web.pages", partition_by=["tile_id"])
    back = iceberg.read_table(spark, "web.pages")
    assert back.count() == 2000
    assert set(back.columns) == set(docs.columns)
    # content equality on a sample key
    a = docs.filter(F.col("doc_id") == 7).select("url", "text").collect()[0]
    b = back.filter(F.col("doc_id") == 7).select("url", "text").collect()[0]
    assert a == b


def test_tile_filter_prunes_partitions(spark, warehouse):
    """The engine's zone-filter -> partition-pruning claim: filtering
    on the partition column must show up as a PartitionFilter at the
    scan (not a post-scan Filter over all partitions), on the Iceberg
    path via manifests, on the fallback via directory layout."""
    docs = assign_cells(documents(spark, 2000), zoom=10, tile_zoom=3)
    iceberg.write_table(docs, "web.pruned", partition_by=["tile_id"])
    one_tile = docs.select("tile_id").limit(1).collect()[0][0]
    q = iceberg.read_table(spark, "web.pruned").filter(
        F.col("tile_id") == one_tile
    )
    plan = _plan(q)
    if iceberg.iceberg_available(spark):
        assert f"tile_id = {one_tile}" in plan
    else:
        assert "PartitionFilters" in plan
        pf = plan.split("PartitionFilters")[1].split("]")[0]
        assert str(one_tile) in pf
    # and the filtered read returns exactly that tile's rows
    assert q.count() == docs.filter(F.col("tile_id") == one_tile).count()


def test_append_mode(spark, warehouse):
    docs = documents(spark, 100)
    iceberg.write_table(docs, "web.app", mode="overwrite")
    iceberg.write_table(docs.withColumn("doc_id", F.col("doc_id") + 1000),
                        "web.app", mode="append")
    assert iceberg.read_table(spark, "web.app").count() == 200
    iceberg.drop_table(spark, "web.app")


def test_catalog_conf_shape():
    conf = iceberg.catalog_conf("/tmp/wh")
    assert conf["spark.sql.catalog.xss.type"] == "hadoop"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]
