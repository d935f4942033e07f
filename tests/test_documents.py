"""Documents synthesizer: determinism across parallelism levels and the
byte-identical extract_text(html) == text invariant (BASELINE.md)."""

from pyspark.sql import functions as F

from xarray_spatial_spark.operators.tiling import assign_cells, assign_cells_flat
from xarray_spatial_spark.sources.documents import documents, extract_text


def test_schema_and_determinism_across_parallelism(spark):
    a = documents(spark, 200, partitions=1).orderBy("doc_id").collect()
    b = documents(spark, 200, partitions=7).orderBy("doc_id").collect()
    assert a == b
    row = a[5]
    assert row["url"] == "https://site5.example/page/5"
    assert set(a[0].asDict()) == {
        "url", "warc_ts", "html", "text", "lang", "lat", "lon", "doc_id"
    }


def test_extract_text_byte_identical(spark):
    df = documents(spark, 300)
    bad = df.filter(extract_text(F.col("html")) != F.col("text")).count()
    assert bad == 0
    # and bytes round-trip exactly
    r = df.filter("doc_id = 42").collect()[0]
    assert bytes(r["html"]).decode() == f"<html><body>{r['text']}</body></html>"


def test_geocode_in_domain_and_cells(spark):
    df = assign_cells(documents(spark, 500), zoom=12, tile_zoom=5)
    stats = df.agg(
        F.min("lat"), F.max("lat"), F.min("lon"), F.max("lon"),
        F.count_distinct("tile_id").alias("tiles"),
    ).collect()[0]
    assert -85.0 <= stats[0] and stats[1] < 85.0
    assert -180.0 <= stats[2] and stats[3] < 180.0
    assert stats["tiles"] > 50  # spread over many tiles


def test_flat_cell_matches_morton_tile(spark):
    """JVM flat path and pandas-UDF Morton path agree on tile coords."""
    import numpy as np
    from xarray_spatial_spark import grid

    zoom = 7
    df = assign_cells_flat(assign_cells(documents(spark, 400), zoom=zoom), zoom=zoom)
    pdf = df.select("cell_id", "cell_flat").toPandas()
    xt, yt, _ = grid.decode(pdf["cell_id"].to_numpy())
    flat = xt * (1 << zoom) + yt
    np.testing.assert_array_equal(flat, pdf["cell_flat"].to_numpy())


def test_skew_variant_creates_hot_cells(spark):
    df = assign_cells(documents(spark, 2000, skew=True), zoom=6)
    top = (
        df.groupBy("cell_id").count().orderBy(F.desc("count")).limit(5).collect()
    )
    # ~20% of 2000 rows over 5 cities -> hot cells with ~80 rows each
    assert top[0]["count"] > 40
