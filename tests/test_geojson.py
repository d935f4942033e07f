"""GeoJSON ingestion/export (sources/geojson.py): RFC 7946 parse
goldens, PolygonSet handoff into the PIP path, and the Catalyst
Feature export round-tripping through polygonize output."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.sources import geojson as gj

FC = json.dumps({
    "type": "FeatureCollection",
    "features": [
        {"type": "Feature",
         "properties": {"name": "unit", "zid": 10},
         "geometry": {"type": "Polygon", "coordinates": [
             [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]]}},
        {"type": "Feature",
         "properties": {"name": "twin", "zid": 20},
         "geometry": {"type": "MultiPolygon", "coordinates": [
             [[[10, 0], [12, 0], [12, 2], [10, 2], [10, 0]]],
             [[[20, 0], [22, 0], [22, 2], [20, 2], [20, 0]]]]}},
        {"type": "Feature", "properties": {},
         "geometry": {"type": "Point", "coordinates": [1, 1]}},
        {"type": "Feature",
         "properties": {"name": "donut", "zid": 30},
         "geometry": {"type": "Polygon", "coordinates": [
             [[30, 0], [40, 0], [40, 10], [30, 10], [30, 0]],
             [[33, 3], [37, 3], [37, 7], [33, 7], [33, 3]]]}},
    ],
})


def test_parse_feature_collection():
    parts = gj.parse_feature_collection(FC)
    # point skipped; multipolygon flattened to two parts
    assert [(p["feature"], p["part"]) for p in parts] == [
        (0, 0), (1, 0), (1, 1), (3, 0)]
    assert parts[0]["exterior"].shape == (5, 2)
    assert parts[0]["properties"]["name"] == "unit"
    assert len(parts[3]["holes"]) == 1
    assert parts[3]["holes"][0].shape == (5, 2)
    # bare geometry wraps
    bare = gj.parse_feature_collection(
        '{"type": "Polygon", "coordinates": [[[0,0],[1,0],[1,1],[0,0]]]}')
    assert len(bare) == 1 and bare[0]["properties"] == {}
    with pytest.raises(ValueError):
        gj.parse_feature_collection('{"type": "Nope"}')


def test_polygon_set_assignment(spark, tmp_path):
    p = tmp_path / "zones.geojson"
    p.write_text(FC)
    with pytest.raises(NotImplementedError):
        gj.polygon_set(str(p))
    pset, attrs = gj.polygon_set(str(p), ignore_holes=True)
    assert sorted(attrs) == [0, 1, 2, 3]
    assert attrs[0]["name"] == "unit"
    from xarray_spatial_spark.operators.pip import pip_join_expr

    pts = spark.createDataFrame(
        [(1.0, 1.0), (11.0, 1.0), (21.0, 1.0), (35.0, 1.0), (50.0, 50.0)],
        "lon double, lat double")
    got = [r.zone for r in pip_join_expr(pts, pset.verts).collect()]
    assert got == [0.0, 1.0, 2.0, 3.0, None]


def test_polygon_set_zone_property(tmp_path):
    single = json.dumps({"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"zid": 7},
         "geometry": {"type": "Polygon",
                      "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]}},
        {"type": "Feature", "properties": {"zid": 9},
         "geometry": {"type": "Polygon",
                      "coordinates": [[[2, 0], [3, 0], [3, 1], [2, 0]]]}},
    ]})
    pset, attrs = gj.polygon_set(
        gj.parse_feature_collection(single), zone_property="zid")
    assert sorted(attrs) == [7, 9]
    dup = gj.parse_feature_collection(single)
    dup[1]["properties"]["zid"] = 7
    with pytest.raises(ValueError):
        gj.polygon_set(dup, zone_property="zid")


def test_feature_export_roundtrip(spark):
    from xarray_spatial_spark.operators.polygonize import polygonize
    from xarray_spatial_spark.raster import df_from_numpy

    arr = np.zeros((8, 8), dtype=np.float64)
    arr[2:6, 2:6] = 5.0
    regions = polygonize(df_from_numpy(spark, arr))
    feats = gj.to_geojson_features(regions).collect()
    assert len(feats) == regions.count()
    parsed = [json.loads(r.feature) for r in feats]
    for f in parsed:
        assert f["type"] == "Feature"
        ring = f["geometry"]["coordinates"][0]
        assert ring[0] == ring[-1] and len(ring) >= 4
        assert set(f["properties"]) == {"region", "value", "area"}
    # the exported collection parses straight back into a PolygonSet
    fc = json.dumps({"type": "FeatureCollection", "features": parsed})
    pset, attrs = gj.polygon_set(gj.parse_feature_collection(fc))
    # a point inside the 5.0 square lands in the region exported as 5.0
    inner = [z for z, pr in attrs.items() if pr["value"] == 5.0]
    assert len(inner) == 1
    from xarray_spatial_spark.operators.pip import pip_join_expr

    pt = spark.createDataFrame([(3.5, 3.5)], "lon double, lat double")
    got = pip_join_expr(pt, {0: pset.verts[inner[0]]}).collect()[0].zone
    assert got == 0.0


def test_feature_export_plan_is_jvm_side(spark):
    df = spark.createDataFrame(
        [(1, 5.0, [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]], 3.0)],
        "region long, value double, exterior array<array<double>>, area double")
    out = gj.to_geojson_features(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in plan and "ArrowEval" not in plan
    assert "Exchange" not in plan
    s = out.collect()[0].feature
    ring = json.loads(s)["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1] == [0.0, 0.0] and len(ring) == 4
