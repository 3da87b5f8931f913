"""GeoParquet sink/source: spec footer metadata, WKB round trip, and
PIP-join parity after a write/read cycle."""

import json

import numpy as np
import pytest

from extractors_geo_spark import datagen
from extractors_geo_spark.sources import geoparquet as GP


def test_write_read_roundtrip_and_metadata(spark, tmp_path):
    polys = datagen.polygons_df(spark)
    out = str(tmp_path / "gp")
    manifest = GP.write_geoparquet(polys, out)
    assert manifest["rows"] == 50
    # every file carries a valid geo footer
    meta = GP.read_geo_metadata(manifest["files"][0]["path"])
    assert meta["version"] == GP.GEO_VERSION
    assert meta["primary_column"] == "geometry"
    assert meta["columns"]["geometry"]["encoding"] == "WKB"
    assert "Polygon" in meta["columns"]["geometry"]["geometry_types"]
    # overall bbox covers CONUS
    bb = manifest["bbox"]
    assert bb[0] < -124 and bb[2] > -67 and bb[1] < 25 and bb[3] > 49

    back = GP.read_geoparquet(spark, out)
    rows = {r["poly_id"]: r for r in back.collect()}
    orig = {r["poly_id"]: r for r in polys.collect()}
    assert set(rows) == set(orig)
    for pid in list(rows)[:5]:
        np.testing.assert_allclose(rows[pid]["xs"], orig[pid]["xs"])
        np.testing.assert_allclose(rows[pid]["ys"], orig[pid]["ys"])
        assert rows[pid]["kind"] == "polygon"


def test_pip_join_parity_after_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from extractors_geo_spark.operators import pip_join

    polys = datagen.polygons_df(spark)
    out = str(tmp_path / "gp2")
    GP.write_geoparquet(polys, out)
    back = GP.read_geoparquet(spark, out)
    pts = spark.createDataFrame(
        [(f"p{i}", -124.0 + i * 1.1, 26.0 + (i * 7 % 23)) for i in range(50)],
        ["image_id", "lon", "lat"])
    a = {(r["image_id"], r["poly_id"]) for r in pip_join.pip_join(pts, polys).collect()}
    b = {(r["image_id"], r["poly_id"]) for r in pip_join.pip_join(pts, back).collect()}
    assert a == b and len(a) > 30


def test_non_geoparquet_rejected(spark, tmp_path):
    plain = str(tmp_path / "plain")
    spark.range(5).write.parquet(plain)
    with pytest.raises(ValueError, match="geo"):
        GP.read_geoparquet(spark, plain)
