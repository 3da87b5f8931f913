"""GeoJSON source: geometry breadth, CRS policy, shapefile-table parity,
round-trip with the engine's own minted footprint rings."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from extractors_geo_spark.sources import geojson as GJ


def _fc(features, crs=None):
    o = {"type": "FeatureCollection", "features": features}
    if crs:
        o["crs"] = {"type": "name", "properties": {"name": crs}}
    return json.dumps(o)


def _feat(geom, **props):
    return {"type": "Feature", "geometry": geom, "properties": props}


def test_polygon_with_hole_and_multipolygon():
    outer = [[-100, 40], [-99, 40], [-99, 41], [-100, 41], [-100, 40]]
    hole = [[-99.7, 40.3], [-99.3, 40.3], [-99.3, 40.7], [-99.7, 40.7], [-99.7, 40.3]]
    mp = {"type": "MultiPolygon",
          "coordinates": [[[[-97, 30], [-96, 30], [-96, 31], [-97, 31], [-97, 30]]],
                          [[[-95, 32], [-94, 32], [-94, 33], [-95, 33], [-95, 32]]]]}
    parsed = GJ.read_geojson(_fc([
        _feat({"type": "Polygon", "coordinates": [outer, hole]}, name="holed"),
        _feat(mp, name="multi"),
    ]))
    assert parsed["errors"] == [] and parsed["epsg"] == 4326
    f0, f1 = parsed["features"]
    assert f0["kind"] == "polygon" and len(f0["rings"]) == 2  # hole kept
    assert f1["kind"] == "polygon" and len(f1["rings"]) == 2  # two parts
    assert parsed["extent"] == (-100.0, 30.0, -94.0, 41.0)


def test_points_lines_and_bare_geometry():
    parsed = GJ.read_geojson(_fc([
        _feat({"type": "Point", "coordinates": [-100, 40]}),
        _feat({"type": "MultiPoint", "coordinates": [[-99, 41], [-98, 42]]}),
        _feat({"type": "LineString", "coordinates": [[-97, 30], [-96, 31]]}),
        _feat({"type": "MultiLineString",
               "coordinates": [[[-95, 32], [-94, 33]], [[-93, 34], [-92, 35]]]}),
    ]))
    kinds = [f["kind"] for f in parsed["features"]]
    assert kinds == ["point", "point", "polyline", "polyline"]
    assert parsed["features"][1]["rings"] == [[(-99.0, 41.0)], [(-98.0, 42.0)]]
    # a bare geometry document is accepted too
    bare = GJ.read_geojson(json.dumps({"type": "Point", "coordinates": [1, 2]}))
    assert bare["features"][0]["kind"] == "point"


def test_crs_policy():
    # RFC 7946 (no crs member) and CRS84 -> 4326
    assert GJ.read_geojson(_fc([_feat({"type": "Point", "coordinates": [0, 0]})]))["epsg"] == 4326
    ok = GJ.read_geojson(_fc([_feat({"type": "Point", "coordinates": [0, 0]})],
                             crs="urn:ogc:def:crs:OGC:1.3:CRS84"))
    assert ok["epsg"] == 4326 and ok["errors"] == []
    # legacy EPSG crs reprojects at ingest (web-mercator meters -> lon/lat)
    from extractors_geo_spark.functions import geo
    x, y = geo.merc_forward_np(np.array([-100.0]), np.array([40.0]))
    m = GJ.read_geojson(_fc([_feat({"type": "Point",
                                    "coordinates": [float(x[0]), float(y[0])]})],
                            crs="urn:ogc:def:crs:EPSG::3857"))
    assert m["errors"] == [] and m["epsg"] == 4326
    (p,) = m["features"][0]["rings"][0]
    assert abs(p[0] - -100.0) < 1e-9 and abs(p[1] - 40.0) < 1e-9
    # unknown named CRS -> explicit error, never silent 4326
    bad = GJ.read_geojson(_fc([_feat({"type": "Point", "coordinates": [0, 0]})],
                              crs="urn:ogc:def:crs:ESRI::102008"))
    assert "UNPROJECTABLE_CRS" in bad["errors"] or "UNKNOWN_CRS" in bad["errors"]
    assert not bad["features"]


def test_garbage_errors():
    assert GJ.read_geojson(b"not json at all")["errors"] == ["BAD_JSON"]
    assert GJ.read_geojson(json.dumps({"type": "Banana"}))["errors"] == ["NOT_GEOJSON"]


def test_ingest_parity_with_shapefile_table(spark, tmp_path):
    """A GeoJSON layer PIP-joins identically to the same polygons ingested
    as a shapefile (one feature table contract)."""
    from extractors_geo_spark.operators import pip_join

    sq = [[-101, 39], [-99, 39], [-99, 41], [-101, 41], [-101, 39]]
    d = tmp_path / "gj"
    d.mkdir()
    (d / "layer.geojson").write_text(_fc([
        _feat({"type": "Polygon", "coordinates": [sq]}, name="box"),
        _feat({"type": "Point", "coordinates": [-95.0, 35.0]}, name="pt"),
    ]))
    feats = GJ.ingest_geojson_dir(spark, str(d)).filter("size(errors) = 0")
    assert {r["kind"] for r in feats.collect()} == {"polygon", "point"}
    polys = feats.filter("kind = 'polygon'")
    pts = spark.createDataFrame([("in", -100.0, 40.0), ("out", -95.0, 40.0)],
                                ["image_id", "lon", "lat"])
    got = {r["image_id"] for r in pip_join.pip_join(pts, polys, point_cols=("image_id",)).collect()}
    assert got == {"in"}


def test_roundtrip_engine_minted_footprint(spark):
    """The engine's own GeoJSON ring (F6: geo.geojson_ring) reads back to
    the identical polygon — producer/consumer closure."""
    from extractors_geo_spark.functions import geo

    df = spark.createDataFrame([(-104.0, 39.0, -103.0, 40.0)],
                               ["minx", "miny", "maxx", "maxy"])
    ring = df.select(geo.geojson_ring(F.col("minx"), F.col("miny"),
                                      F.col("maxx"), F.col("maxy")).alias("r")).collect()[0]["r"]
    coords = [[list(p) for p in ring]] if not isinstance(ring[0][0], list) else [ring]
    doc = json.dumps({"type": "Feature", "properties": {},
                      "geometry": {"type": "Polygon", "coordinates": coords}})
    parsed = GJ.read_geojson(doc)
    assert parsed["errors"] == []
    assert parsed["features"][0]["bbox"] == (-104.0, 39.0, -103.0, 40.0)
    assert len(parsed["features"][0]["rings"][0]) == 5  # closed 5-point ring


def test_malformed_documents_emit_error_rows_not_crashes(spark, tmp_path):
    """Review finding: malformed-but-valid-JSON documents (bad coordinate
    nesting, string coords, string crs) must emit error rows."""
    bad1 = json.dumps({"type": "Feature", "properties": {},
                       "geometry": {"type": "Polygon", "coordinates": [[1, 2]]}})
    bad2 = json.dumps({"type": "Feature", "properties": {},
                       "geometry": {"type": "Point", "coordinates": ["a", "b"]}})
    bad3 = json.dumps({"type": "FeatureCollection", "features": [], "crs": "EPSG:4326"})
    for doc, want in [(bad1, "BAD_GEOMETRY"), (bad2, "BAD_GEOMETRY"), (bad3, "UNKNOWN_CRS")]:
        parsed = GJ.read_geojson(doc)
        assert want in parsed["errors"], (doc, parsed)
    # distributed: one bad file among good ones -> error row, job survives
    d = tmp_path / "mix"
    d.mkdir()
    (d / "good.geojson").write_text(_fc([_feat(
        {"type": "Polygon", "coordinates": [[[-101, 39], [-99, 39], [-99, 41], [-101, 41], [-101, 39]]]}, name="ok")]))
    (d / "bad.geojson").write_text(bad1)
    rows = GJ.ingest_geojson_dir(spark, str(d)).collect()
    by_src = {r["source"].rsplit("/", 1)[-1]: r for r in rows}
    assert by_src["good.geojson"]["errors"] == []
    assert "BAD_GEOMETRY" in by_src["bad.geojson"]["errors"]
