"""Deterministic Common-Crawl-style document synthesizer.

Produces the ``input_hint`` table shape
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
plus derived geocode columns, entirely with JVM-side Column
expressions over ``spark.range`` — no Python in the generation path,
so the same generator scales from 10^3 test rows to any benchmark
size, with perfect partition-parallel determinism (row ``i`` is the
same bytes regardless of partitioning, parallelism, or retries).

Invariant (BASELINE.md correctness gate): ``extract_text(html) ==
text`` byte-identically per url; ``html`` is ``<html><body>{text}
</body></html>`` and ``extract_text`` strips tags.

Geocoding: a real pipeline would geocode pages with a model; here the
deterministic stand-in maps the doc key through integer arithmetic to
(lat, lon) in [-85, 85) x [-180, 180) (functions/geo.py geocode_*),
with an optional zipfian skew knob that piles 20% of rows onto 5 hot
city cells to exercise salting/AQE skew handling (FIXTURES.md §1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.geo import geocode_lat, geocode_lon

VOCAB = [
    "the", "of", "and", "to", "in", "data", "web", "page", "spark", "tile",
    "spatial", "index", "crawl", "river", "mountain", "city", "market",
    "report", "science", "open", "model", "query", "join", "cell", "zone",
    "raster", "vector", "stream", "light", "stone",
]

HOT_CITIES = [  # (lat, lon) — skew targets
    (40.7128, -74.0060),
    (51.5074, -0.1278),
    (35.6762, 139.6503),
    (-23.5505, -46.6333),
    (28.6139, 77.2090),
]

LANGS = ["en", "de", "fr", "es", "zh"]

_MULT = 2654435761  # Knuth multiplicative hash


def _word(seed: Column) -> Column:
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    return F.element_at(vocab, ((seed % len(VOCAB)) + 1).cast("int"))


def documents(
    spark: SparkSession,
    n: int,
    partitions: int | None = None,
    skew: bool = False,
) -> DataFrame:
    """n synthetic web pages; deterministic in i (seed-free by design)."""
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    h = (i + 1) * F.lit(_MULT)  # cheap integer mix, SQL-expressible

    n_words = (h % 64 + 8).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda j: _word((i + 1) * (j + 7) % F.lit(1000003)),
    )
    text = F.concat_ws(" ", words)

    lat = geocode_lat(i)
    lon = geocode_lon(i)
    if skew:
        # 20% of rows onto 5 hot cities -> hot cells at coarse zooms
        city = (h % 5).cast("int")
        lat_arr = F.array(*[F.lit(c[0]) for c in HOT_CITIES])
        lon_arr = F.array(*[F.lit(c[1]) for c in HOT_CITIES])
        is_hot = (h % 10) < 2
        lat = F.when(is_hot, F.element_at(lat_arr, city + 1)).otherwise(lat)
        lon = F.when(is_hot, F.element_at(lon_arr, city + 1)).otherwise(lon)

    langs = F.array(*[F.lit(lg) for lg in LANGS])

    return df.select(
        F.concat(
            F.lit("https://site"), (i % 1000).cast("string"),
            F.lit(".example/page/"), i.cast("string"),
        ).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=i)).alias(
            "warc_ts"
        ),
        F.encode(
            F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), "UTF-8"
        ).alias("html"),
        text.alias("text"),
        F.element_at(langs, (h % 5 + 1).cast("int")).alias("lang"),
        lat.alias("lat"),
        lon.alias("lon"),
        i.alias("doc_id"),
    )


def extract_text(html: Column) -> Column:
    """html binary -> text, byte-identical to the ``text`` column for
    synthesized pages (strip tags; collapse nothing else)."""
    return F.regexp_replace(F.decode(html, "UTF-8"), "<[^>]*>", "")
