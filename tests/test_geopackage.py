"""GeoPackage source: SQLite+WKB parse, CRS policy, reproject, ingest."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from extractors_geo_spark.functions import geo
from extractors_geo_spark.sources import geopackage as GP


def _box(x0, y0, x1, y1):
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]


def test_roundtrip_all_geometry_kinds():
    feats = [
        {"rings": [_box(-101, 39, -99, 41),
                   _box(-100.5, 39.5, -99.5, 40.5)], "kind": "polygon",
         "attrs": {"name": "holed"}},
        {"rings": [[(-95.0, 35.0)]], "kind": "point", "attrs": {"name": "pt"}},
        {"rings": [[(-90.0, 30.0)], [(-89.0, 31.0)]], "kind": "point",
         "attrs": {"name": "mpt"}},
        {"rings": [[(-97, 30), (-96, 31), (-95, 30.5)]], "kind": "polyline",
         "attrs": {"name": "ln"}},
    ]
    parsed = GP.read_geopackage(GP.write_geopackage(feats))
    assert parsed["errors"] == [] and parsed["epsg"] == 4326
    got = [(f["kind"], len(f["rings"]), f["attrs"]["name"]) for f in parsed["features"]]
    assert got == [("polygon", 2, "holed"), ("point", 1, "pt"),
                   ("point", 2, "mpt"), ("polyline", 1, "ln")]
    assert parsed["features"][0]["rings"] == [
        [tuple(map(float, p)) for p in _box(-101, 39, -99, 41)],
        [tuple(map(float, p)) for p in _box(-100.5, 39.5, -99.5, 40.5)]]


def test_projected_gpkg_reprojects_at_ingest():
    lon = np.array([-122.5, -122.0, -122.0, -122.5, -122.5])
    lat = np.array([37.0, 37.0, 37.5, 37.5, 37.0])
    e, n = geo.lonlat_to_epsg_np(lon, lat, 32610)
    data = GP.write_geopackage(
        [{"rings": [list(zip(e.tolist(), n.tolist()))], "kind": "polygon", "attrs": {}}],
        epsg=32610)
    parsed = GP.read_geopackage(data)
    assert parsed["errors"] == [] and parsed["epsg"] == 4326
    assert parsed["epsg_native"] == 32610
    np.testing.assert_allclose([p[0] for p in parsed["features"][0]["rings"][0]],
                               lon, atol=1e-9)


def test_unknown_epsg_uses_definition_wkt():
    """An EPSG code without a closed form falls back to the row's own
    DEFINITION WKT (Poland CS92 TM parameters) — same policy as .prj."""
    wkt = ('PROJCS["ETRS89 / Poland CS92",GEOGCS["ETRS89"],'
           'PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",0],'
           'PARAMETER["central_meridian",19],PARAMETER["scale_factor",0.9993],'
           'PARAMETER["false_easting",500000],PARAMETER["false_northing",-5300000],'
           'UNIT["metre",1]]')
    prm = geo.parse_projcs_params(wkt)
    lon = np.array([18.0, 20.0, 20.0, 18.0, 18.0])
    lat = np.array([51.0, 51.0, 53.0, 53.0, 51.0])
    e, n = geo.params_forward_np(lon, lat, prm)
    data = GP.write_geopackage(
        [{"rings": [list(zip(e.tolist(), n.tolist()))], "kind": "polygon", "attrs": {}}],
        epsg=2180, definition=wkt)
    parsed = GP.read_geopackage(data)
    assert parsed["errors"] == [] and parsed["epsg"] == 4326
    np.testing.assert_allclose([p[1] for p in parsed["features"][0]["rings"][0]],
                               lat, atol=1e-9)


def test_garbage_and_non_gpkg_sqlite_error_rows():
    assert GP.read_geopackage(b"not sqlite")["errors"] == ["NOT_GPKG"]
    import sqlite3
    import tempfile, os
    fd, path = tempfile.mkstemp()
    os.close(fd)
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE t (a int)")
    con.commit()
    con.close()
    plain_sqlite = open(path, "rb").read()
    os.unlink(path)
    assert GP.read_geopackage(plain_sqlite)["errors"] == ["NOT_GPKG"]


def test_ingest_and_pip_join(spark, tmp_path):
    from extractors_geo_spark.operators import pip_join

    d = tmp_path / "gpkg"
    d.mkdir()
    (d / "layer.gpkg").write_bytes(GP.write_geopackage(
        [{"rings": [_box(-101, 39, -99, 41)], "kind": "polygon",
          "attrs": {"name": "box"}}]))
    (d / "bad.gpkg").write_bytes(b"corrupt bytes here")
    feats = GP.ingest_gpkg_dir(spark, str(d))
    good = feats.filter(F.size("errors") == 0)
    bad = feats.filter(F.size("errors") > 0)
    assert good.count() == 1 and bad.count() == 1
    pts = spark.createDataFrame([("in", -100.0, 40.0), ("out", -90.0, 40.0)],
                                ["image_id", "lon", "lat"])
    got = {r["image_id"] for r in pip_join.pip_join(
        pts, good.filter("kind='polygon'"), point_cols=("image_id",)).collect()}
    assert got == {"in"}
