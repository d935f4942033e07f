"""Toponym extraction + resolution (geoparsing) in pure Catalyst.

The engine's deterministic ``geocode_lat/lon`` (functions/geo.py) is a
hash stand-in for geocoding; this module is the REAL text->place
bridge: a gazetteer join that extracts place-name mentions from
document text and resolves ambiguous names the way production
geoparsers do (population prior + country-context boost, the CLAVIN /
Edinburgh-geoparser recipe).

Scale contract (100 TB): a world gazetteer is small (GeoNames'
cities15000 is ~25k rows; the full one ~5M — both broadcastable), so
BOTH joins here are broadcast hash joins against exploded document
tokens.  Tokenization happens in the scan stage (split+explode of the
projected text column only); candidate rows after the join are
mention-scale, orders of magnitude below token-scale.  The two
aggregations are keyed by (doc_id, name) / (doc_id) — no wide key, no
window over raw tokens.  Everything is JVM-side Catalyst; there is no
Python in the plan.

Determinism contract: the synthetic gazetteer, the tokenizer, and the
resolution rule are pure integer/string expressions replayable in any
ANSI SQL engine — the DuckDB oracle reruns the identical pipeline.

Resolution rule (deterministic, no scores to drift):
  per (doc, name): argmax by (country-context boost, population,
  -place_id); per doc the primary place additionally ranks by mention
  count first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from xarray_spatial_spark.functions.geo import geocode_lat, geocode_lon

# Synthetic gazetteer construction constants.  Names are 3 syllables
# drawn by fixed multiplicative rules, so distinct places collide on
# names at a realistic rate (~1728 combos); countries are 25 fixed
# tokens.  Everything below is a pure function of place_id.
SYLLABLES = [
    "ba", "den", "kara", "lin", "mo", "pora",
    "qui", "ras", "sto", "tul", "ver", "wick",
]
COUNTRIES = [
    "aldova", "brantia", "corvia", "drussel", "elbonia",
    "fendar", "gorvia", "hastein", "ivenia", "jorland",
    "kestrel", "lurania", "morvona", "nystrom", "ostrava",
    "pelagia", "quorath", "rovenia", "sardonia", "tirguz",
    "umbria", "velkania", "westmark", "xanadia", "yortuga",
]
_POP_MULT = 2654435761
_POP_MOD = 9_000_000


def make_gazetteer(spark: SparkSession, n: int = 400) -> DataFrame:
    """Deterministic synthetic gazetteer: (place_id, name, country,
    lat, lon, population).  ``name = syl[(i*7+3)%12] || syl[(i*5+1)%12]
    || syl[(i*11)%12]`` — collisions between distinct places are the
    ambiguity the resolver must break."""
    i = F.col("place_id")
    syl = F.array(*[F.lit(s) for s in SYLLABLES])
    cty = F.array(*[F.lit(c) for c in COUNTRIES])
    return (
        spark.range(n).withColumnRenamed("id", "place_id")
        .select(
            "place_id",
            F.concat(
                F.element_at(syl, ((i * 7 + 3) % 12 + 1).cast("int")),
                F.element_at(syl, ((i * 5 + 1) % 12 + 1).cast("int")),
                F.element_at(syl, ((i * 11) % 12 + 1).cast("int")),
            ).alias("name"),
            F.element_at(cty, ((i * 31) % 25 + 1).cast("int")).alias("country"),
            geocode_lat(i).alias("lat"),
            geocode_lon(i).alias("lon"),
            ((i * _POP_MULT) % _POP_MOD + 1000).alias("population"),
        )
    )


def gazetteer_sql(n: int = 400) -> str:
    """The identical gazetteer as a DuckDB CTE body (1-indexed lists)."""
    syl = "[" + ", ".join(f"'{s}'" for s in SYLLABLES) + "]"
    cty = "[" + ", ".join(f"'{c}'" for c in COUNTRIES) + "]"
    return f"""
        SELECT i AS place_id,
               {syl}[CAST((i*7+3)%12 AS INT) + 1]
                 || {syl}[CAST((i*5+1)%12 AS INT) + 1]
                 || {syl}[CAST((i*11)%12 AS INT) + 1] AS name,
               {cty}[CAST((i*31)%25 AS INT) + 1] AS country,
               ((i * {_POP_MULT}) % {_POP_MOD} + 1000) AS population,
               (((i) * 2654435761) % 1700000) / 10000.0 - 85.0 AS lat,
               (((i) * 2246822519) % 3600000) / 10000.0 - 180.0 AS lon
        FROM range({n}) t(i)
    """


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Scan-stage tokenization: lowercase, split on non-letters,
    explode NON-distinct (mention counts matter downstream)."""
    return (
        df.select(id_col, F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("tok"))
        .where(F.col("tok") != "")
    )


def extract_toponyms(
    df: DataFrame,
    gazetteer: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate mentions: every (doc, token, gazetteer row) whose
    token equals a place name.  Broadcast join — the gazetteer is
    small by construction at any corpus size."""
    toks = _tokens(df, text_col, id_col)
    return toks.join(
        F.broadcast(gazetteer.withColumnRenamed("name", "tok")), "tok")


def resolve_toponyms(
    df: DataFrame,
    gazetteer: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (doc, mentioned name): the winning gazetteer entry.

    Rule: a candidate is *boosted* when its country name is ALSO
    mentioned in the same document; per (doc, name) the winner is
    argmax by (boosted, population, -place_id).  Emits n_mentions
    (token occurrences of the name) for downstream primary-place
    ranking."""
    toks = _tokens(df, text_col, id_col)
    # Mention counts per (doc, name) BEFORE joining full gazetteer rows:
    # a broadcast semi-filter on distinct names keeps the aggregation
    # mention-scale, and the later row join can't fan counts out by
    # the number of places sharing a name.
    names = gazetteer.select(F.col("name").alias("tok")).distinct()
    mentions = (
        toks.join(F.broadcast(names), "tok")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
    )
    cand = mentions.join(
        F.broadcast(gazetteer.withColumnRenamed("name", "tok")), "tok")
    # Distinct country mentions per doc (tiny: bounded by |countries|).
    countries = gazetteer.select("country").distinct()
    mentioned = (
        toks.join(F.broadcast(countries.withColumnRenamed("country", "tok")),
                  "tok")
        .select(id_col, F.col("tok").alias("country")).distinct()
        .withColumn("boosted", F.lit(1))
    )
    cand = cand.join(F.broadcast(mentioned), [id_col, "country"], "left")
    cand = cand.withColumn("boosted", F.coalesce("boosted", F.lit(0)))
    rank = F.struct(
        F.col("boosted"), F.col("population"), (-F.col("place_id")).alias("np"))
    best = F.struct(
        F.col("place_id"), F.col("country"), F.col("lat"), F.col("lon"),
        F.col("population"), F.col("boosted"))
    out = (
        cand.groupBy(id_col, F.col("tok").alias("name"))
        .agg(F.max_by(best, rank).alias("b"),
             F.max("n_mentions").alias("n_mentions"))
    )
    return out.select(
        id_col, "name", F.col("b.place_id").alias("place_id"),
        F.col("b.country").alias("country"), F.col("b.lat").alias("lat"),
        F.col("b.lon").alias("lon"),
        F.col("b.population").alias("population"),
        F.col("b.boosted").alias("boosted"), "n_mentions")


def geotag_documents(
    df: DataFrame,
    gazetteer: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Primary place per document: among its resolved toponyms, argmax
    by (n_mentions, boosted, population, -place_id).  Docs with no
    mention are absent (inner semantics — callers left-join back)."""
    res = resolve_toponyms(df, gazetteer, text_col=text_col, id_col=id_col)
    rank = F.struct(
        F.col("n_mentions"), F.col("boosted"), F.col("population"),
        (-F.col("place_id")).alias("np"))
    best = F.struct(
        F.col("place_id"), F.col("name"), F.col("country"), F.col("lat"),
        F.col("lon"), F.col("population"), F.col("boosted"),
        F.col("n_mentions"))
    g = res.groupBy(id_col).agg(F.max_by(best, rank).alias("b"))
    return g.select(
        id_col, F.col("b.place_id").alias("place_id"),
        F.col("b.name").alias("name"), F.col("b.country").alias("country"),
        F.col("b.lat").alias("lat"), F.col("b.lon").alias("lon"),
        F.col("b.population").alias("population"),
        F.col("b.boosted").alias("boosted"),
        F.col("b.n_mentions").alias("n_mentions"))
