"""Zipped-shapefile source vs the states.zip fixture goldens
(preview.geoshp/tests/: 49 polygons, 4326, 3857 bbox golden)."""

import io
import os
import shutil
import zipfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from extractors_geo_spark.functions import geo
from extractors_geo_spark.operators import pip_join
from extractors_geo_spark.sources import shapefile as S

STATES = "/root/reference/preview.geoshp/tests/states.zip"
needs_fixture = pytest.mark.skipif(not os.path.exists(STATES), reason="fixture absent")


@needs_fixture
def test_states_parse_goldens():
    parsed = S.read_zip_shapefile(open(STATES, "rb").read())
    assert parsed["errors"] == []
    assert parsed["epsg"] == 4326 and not parsed["epsg_defaulted"]
    assert len(parsed["features"]) == 49
    minx, miny, maxx, maxy = parsed["extent"]
    assert np.allclose([minx, miny, maxx, maxy],
                       [-124.731422, 24.955967, -66.969849, 49.371735], atol=1e-6)
    # 3857 golden: -13885038.383,2870337.13079,-7455049.48918,6338174.05576
    x, y = geo.merc_forward_np(np.array([minx, maxx]), np.array([miny, maxy]))
    assert np.allclose([x[0], y[0], x[1], y[1]],
                       [-13885038.383, 2870337.13079, -7455049.48918, 6338174.05576], atol=1e-3)
    # 22 DBF attributes with the documented names
    attrs = parsed["features"][0]["attrs"]
    assert len(attrs) == 22
    for k in ("STATE_NAME", "STATE_FIPS", "SUB_REGION", "STATE_ABBR", "P_MALE"):
        assert k in attrs


@needs_fixture
def test_states_ingest_dataframe(spark, tmp_path):
    d = tmp_path / "zips"
    d.mkdir()
    shutil.copy(STATES, d / "states.zip")
    polys = S.ingest_zip_dir(spark, str(d)).cache()
    good = polys.filter(F.size("errors") == 0)
    assert good.count() == 49
    names = {r["name"] for r in good.select("name").collect()}
    assert "Texas" in names and "California" in names
    assert good.filter(F.col("epsg") != 4326).count() == 0


@needs_fixture
def test_states_pip_join_sanity(spark, tmp_path):
    """Real-fixture PIP: known city points land in the right states."""
    d = tmp_path / "zips"
    d.mkdir()
    shutil.copy(STATES, d / "states.zip")
    polys = S.ingest_zip_dir(spark, str(d)).filter(F.size("errors") == 0)
    cities = spark.createDataFrame(
        [
            ("austin", -97.74, 30.27, "Texas"),
            ("la", -118.24, 34.05, "California"),
            ("chicago", -87.68, 41.84, "Illinois"),
            ("nyc", -73.94, 40.67, "New York"),
            ("denver", -104.99, 39.74, "Colorado"),
        ],
        ["image_id", "lon", "lat", "expected"],
    )
    out = pip_join.pip_join(cities, polys, point_cols=("image_id", "expected"),
                            poly_cols=("name",), res=5)
    rows = out.collect()
    assert len(rows) == 5
    for r in rows:
        assert r["name"] == r["expected"], r


def _mini_zip(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for n, b in members.items():
            z.writestr(n, b)
    return buf.getvalue()


def test_validation_paths():
    assert S.read_zip_shapefile(b"not a zip")["errors"] == ["NOT_ZIP"]
    errs, _ = S.validate_members(["a.shp", "b.shp", "a.shx", "a.dbf"])
    assert "MULTIPLE_SHP" in errs
    errs, _ = S.validate_members(["sub/a.shp"])
    assert "HAS_DIR" in errs
    errs, base = S.validate_members(["a.shp"])
    assert "MISSING_SHX" in errs and "MISSING_DBF" in errs and base == "a"
    errs, base = S.validate_members(["a.dbf"])
    assert "NO_SHP" in errs


@needs_fixture
def test_missing_prj_defaults_4326():
    z = zipfile.ZipFile(STATES)
    members = {n: z.read(n) for n in z.namelist() if not n.endswith(".prj")}
    parsed = S.read_zip_shapefile(_mini_zip(members))
    assert parsed["epsg"] == 4326 and parsed["epsg_defaulted"] is True
    assert len(parsed["features"]) == 49


def test_blacklisted_projection():
    prj = b'PROJCS["North_America_Albers_Equal_Area_Conic",GEOGCS["GCS_North_American_1983"]]'
    z = _mini_zip({"x.shp": b"\x00" * 10, "x.shx": b"", "x.dbf": b"", "x.prj": prj})
    parsed = S.read_zip_shapefile(z)
    assert "BLACKLISTED_PROJECTION" in parsed["errors"]
