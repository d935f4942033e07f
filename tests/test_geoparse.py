"""Geoparsing: gazetteer determinism, extraction, disambiguation,
context boost, primary-place geotagging — pinned against a pure-Python
replay of the identical rules."""

import re

import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.functions import geoparse as gp

pytestmark = pytest.mark.usefixtures("spark")


def _py_gazetteer(n):
    rows = []
    for i in range(n):
        name = (gp.SYLLABLES[(i * 7 + 3) % 12]
                + gp.SYLLABLES[(i * 5 + 1) % 12]
                + gp.SYLLABLES[(i * 11) % 12])
        rows.append({
            "place_id": i, "name": name,
            "country": gp.COUNTRIES[(i * 31) % 25],
            "population": (i * gp._POP_MULT) % gp._POP_MOD + 1000,
            "lat": ((i * 2654435761) % 1700000) / 10000.0 - 85.0,
            "lon": ((i * 2246822519) % 3600000) / 10000.0 - 180.0,
        })
    return rows


def _py_resolve(docs, gaz):
    """Reference replay: tokenize, candidate join, boost, argmax."""
    by_name = {}
    for g in gaz:
        by_name.setdefault(g["name"], []).append(g)
    countries = {g["country"] for g in gaz}
    out = {}
    for doc_id, text in docs:
        toks = [t for t in re.split(r"[^a-z]+", text.lower()) if t]
        mentioned = {t for t in toks if t in countries}
        counts = {}
        for t in toks:
            if t in by_name:
                counts[t] = counts.get(t, 0) + 1
        for name, n_mentions in counts.items():
            best = max(
                by_name[name],
                key=lambda g: (int(g["country"] in mentioned),
                               g["population"], -g["place_id"]))
            out[(doc_id, name)] = {
                **best, "n_mentions": n_mentions,
                "boosted": int(best["country"] in mentioned)}
    return out


def test_gazetteer_deterministic(spark):
    g1 = gp.make_gazetteer(spark, 100).collect()
    ref = _py_gazetteer(100)
    assert len(g1) == 100
    for row, exp in zip(sorted(g1, key=lambda r: r.place_id), ref):
        assert row.name == exp["name"]
        assert row.country == exp["country"]
        assert row.population == exp["population"]
        assert abs(row.lat - exp["lat"]) < 1e-9
        assert abs(row.lon - exp["lon"]) < 1e-9
    # names collide across distinct places (the ambiguity we resolve)
    names = [r.name for r in g1]
    assert len(set(names)) < len(names)


def test_resolution_matches_python_replay(spark):
    gaz_rows = _py_gazetteer(200)
    # construct docs that mention real gazetteer names, with noise
    docs = []
    for d in range(40):
        g = gaz_rows[(d * 13) % 200]
        g2 = gaz_rows[(d * 7 + 3) % 200]
        text = (f"The quick fox visited {g['name']} twice; {g['name']} "
                f"and {g2['name']} are towns. plain words only here")
        if d % 3 == 0:
            text += f" somewhere in {g2['country']}"
        docs.append((d, text))
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    gaz = gp.make_gazetteer(spark, 200)
    got = {(r.doc_id, r.name): r
           for r in gp.resolve_toponyms(sdf, gaz).collect()}
    exp = _py_resolve(docs, gaz_rows)
    assert set(got) == set(exp)
    for k, e in exp.items():
        r = got[k]
        assert r.place_id == e["place_id"], k
        assert r.country == e["country"]
        assert r.population == e["population"]
        assert r.n_mentions == e["n_mentions"]
        assert r.boosted == e["boosted"]


def test_population_prior_breaks_ambiguity(spark):
    gaz = spark.createDataFrame(
        [(1, "springfield", "aldova", 10.0, 20.0, 100),
         (2, "springfield", "brantia", -30.0, 40.0, 90000)],
        "place_id long, name string, country string, lat double, "
        "lon double, population long")
    docs = spark.createDataFrame(
        [(0, "i moved to springfield last year")], "doc_id long, text string")
    [r] = gp.resolve_toponyms(docs, gaz).collect()
    assert r.place_id == 2 and r.population == 90000 and r.boosted == 0


def test_country_context_beats_population(spark):
    gaz = spark.createDataFrame(
        [(1, "springfield", "aldova", 10.0, 20.0, 100),
         (2, "springfield", "brantia", -30.0, 40.0, 90000)],
        "place_id long, name string, country string, lat double, "
        "lon double, population long")
    docs = spark.createDataFrame(
        [(0, "springfield, aldova: a small town")],
        "doc_id long, text string")
    [r] = gp.resolve_toponyms(docs, gaz).collect()
    assert r.place_id == 1 and r.boosted == 1


def test_geotag_primary_by_mentions(spark):
    gaz = spark.createDataFrame(
        [(1, "avalon", "aldova", 1.0, 2.0, 500),
         (2, "brigadoon", "brantia", 3.0, 4.0, 9000)],
        "place_id long, name string, country string, lat double, "
        "lon double, population long")
    docs = spark.createDataFrame(
        [(0, "avalon avalon avalon and brigadoon once")],
        "doc_id long, text string")
    [r] = gp.geotag_documents(docs, gaz).collect()
    assert r.name == "avalon" and r.n_mentions == 3 and r.place_id == 1


def test_no_mentions_absent_and_plan_pure_catalyst(spark):
    gaz = gp.make_gazetteer(spark, 50)
    docs = spark.createDataFrame(
        [(0, "nothing geographic here at all")], "doc_id long, text string")
    res = gp.resolve_toponyms(docs, gaz)
    assert res.count() == 0
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
