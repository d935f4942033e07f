"""Iceberg table source/sink with a partitioned-parquet fallback.

The north rule's input is "an Iceberg table of Common-Crawl-style web
pages".  Iceberg support in Spark is a runtime dependency
(`iceberg-spark-runtime` jar + catalog conf); this sandbox image does
not ship the jar, so this module:

- detects the Iceberg Spark runtime (``iceberg_available``);
- when present, configures a Hadoop-warehouse catalog and routes
  reads/writes through ``writeTo``/``spark.table`` (hidden
  partitioning, snapshots, time travel all work as normal Iceberg);
- when absent, degrades to a Hive-layout partitioned-parquet table
  under the same warehouse directory with the same logical API —
  and sources/iceberg_format.py additionally implements the Iceberg
  v2 TABLE FORMAT itself from scratch (metadata json chain + Avro
  manifests via sources/avro.py, snapshots/appends/time travel,
  metadata-layer partition pruning) so spec-compliant Iceberg tables
  can be written and read with no jar at all —
  crucially preserving the claim that matters for the engine's scale
  story: a zone/tile predicate prunes partitions at the SCAN (plan
  shows PartitionFilters; verified by tests/test_iceberg.py), which
  is the same partition-pruning contract Iceberg's metadata layer
  provides.

Either way the engine-facing API is identical: ``write_table`` /
``read_table`` / ``table_identifier``; callers never branch.

On a real cluster run: ``spark-submit --packages
org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<ver>`` plus the
two catalog confs set in ``catalog_conf`` activates the Iceberg path
with zero code changes.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

CATALOG = "xss"


def catalog_conf(warehouse: str) -> dict[str, str]:
    """The session confs that activate the Iceberg catalog (pass to
    ``get_spark(extra_conf=...)`` when the runtime jar is on the
    classpath)."""
    return {
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        f"spark.sql.catalog.{CATALOG}":
            "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{CATALOG}.type": "hadoop",
        f"spark.sql.catalog.{CATALOG}.warehouse": warehouse,
    }


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def _fallback_path(spark: SparkSession, name: str) -> str:
    wh = spark.conf.get(
        f"spark.sql.catalog.{CATALOG}.warehouse",
        os.path.join(os.environ.get("BENCH_CACHE", "/tmp/xss_bench_cache"),
                     "warehouse"),
    )
    return os.path.join(wh, *name.split("."))


def table_identifier(name: str) -> str:
    return f"{CATALOG}.{name}"


def write_table(
    df: DataFrame,
    name: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as table ``name`` partitioned by ``partition_by``.

    Iceberg path: ``writeTo(...).partitionedBy(...)`` (metadata-level
    partitioning).  No-jar path: the from-scratch Iceberg v2 table
    format (sources/iceberg_format.py) — real metadata json + Avro
    manifest chain, append snapshots, metadata-level pruning; the
    written layout is the spec's Hadoop-catalog layout, readable by a
    real iceberg runtime pointed at the warehouse."""
    spark = df.sparkSession
    if iceberg_available(spark):
        writer = df.writeTo(table_identifier(name))
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        elif mode == "append":
            writer.append()
        else:
            raise ValueError(f"unsupported mode {mode!r}")
        return
    from xarray_spatial_spark.sources import iceberg_format

    path = _fallback_path(spark, name)
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unsupported mode {mode!r}")
    if (mode == "overwrite" and os.path.exists(path)
            and not os.path.exists(
                os.path.join(path, "metadata", "version-hint.text"))):
        # legacy Hive-layout dir: replace wholesale
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    iceberg_format.write_iceberg(df, path, partition_by=list(partition_by),
                                 mode=mode)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Open table ``name``; partition predicates prune at the metadata
    layer (native format) or the scan (jar catalog / legacy layout)."""
    if iceberg_available(spark):
        return spark.table(table_identifier(name))
    path = _fallback_path(spark, name)
    if os.path.exists(os.path.join(path, "metadata", "version-hint.text")):
        from xarray_spatial_spark.sources import iceberg_format

        return iceberg_format.read_iceberg(spark, path)
    # legacy Hive-layout fallback written by older versions
    return spark.read.parquet(path)


def drop_table(spark: SparkSession, name: str) -> None:
    if iceberg_available(spark):
        spark.sql(f"DROP TABLE IF EXISTS {table_identifier(name)}")
        return
    import shutil

    shutil.rmtree(_fallback_path(spark, name), ignore_errors=True)
