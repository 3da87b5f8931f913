"""EXIF APP1 GPS: write/read round trips, orientation, hemisphere signs,
error contracts, and the distributed exif_geo operator."""

import numpy as np
import pytest

from extractors_geo_spark import exif, jpeg


def _jpg():
    return jpeg.encode((np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251, quality=90)


def test_roundtrip_all_hemispheres():
    base = _jpg()
    for lat, lon, o in ((34.0522, -118.2437, 1), (-33.8688, 151.2093, 6),
                        (0.0001, -0.0001, 3), (89.9, 179.99, 8), (-89.9, -179.99, 2)):
        j = exif.insert_app1(base, exif.build_app1(lat, lon, o))
        r = exif.read_exif(j)
        assert abs(r["lat"] - lat) < 1e-9 and abs(r["lon"] - lon) < 1e-9
        assert r["orientation"] == o
        # the decoder skips APP1 transparently: pixels identical
        np.testing.assert_array_equal(jpeg.decode(j), jpeg.decode(base))


def test_no_gps_and_errors():
    assert exif.read_exif(_jpg()) == {"lat": None, "lon": None, "orientation": 1, "description": None}
    with pytest.raises(ValueError):
        exif.read_exif(b"\x00" * 16)
    # APP1 that is not Exif (e.g. XMP) is skipped, not an error
    xmp = b"\xff\xe1\x00\x10http://ns.adobe"
    j = _jpg()
    assert exif.read_exif(j[:2] + xmp + j[2:])["lat"] is None


def test_big_endian_tiff_header():
    """MM-order EXIF blocks read correctly (cameras emit both orders)."""
    import struct

    app1 = exif.build_app1(12.5, -99.25, 1)
    r = exif.read_exif(exif.insert_app1(_jpg(), app1))
    assert abs(r["lat"] - 12.5) < 1e-9  # sanity on LE first
    # hand-build a minimal MM block: orientation only
    tiff = b"MM\x00*" + struct.pack(">I", 8)
    tiff += struct.pack(">H", 1) + struct.pack(">HHIHH", 0x0112, 3, 1, 5, 0) + struct.pack(">I", 0)
    payload = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    r = exif.read_exif(exif.insert_app1(_jpg(), seg))
    assert r["orientation"] == 5 and r["lat"] is None


def test_exif_geo_operator(spark):
    from extractors_geo_spark.operators import multimodal as M

    base = _jpg()
    rows_in = [
        ("with_gps", bytearray(exif.insert_app1(base, exif.build_app1(40.7, -74.0, 6)))),
        ("no_gps", bytearray(base)),
        ("garbage", bytearray(b"\x01\x02\x03")),
    ]
    df = spark.createDataFrame(rows_in, "image_id string, bytes binary")
    got = {r["image_id"]: r for r in M.exif_geo(df).collect()}
    assert abs(got["with_gps"]["lat"] - 40.7) < 1e-9
    assert abs(got["with_gps"]["lon"] - -74.0) < 1e-9
    assert got["with_gps"]["orientation"] == 6 and got["with_gps"]["error"] is None
    assert got["no_gps"]["lat"] is None and got["no_gps"]["error"] is None
    assert got["garbage"]["error"] is not None  # errors-as-data, task alive


def test_image_description_caption():
    base = _jpg()
    j = exif.insert_app1(base, exif.build_app1(40.7, -74.0, 6,
                                               description="skyline at dusk"))
    r = exif.read_exif(j)
    assert r["description"] == "skyline at dusk"
    assert abs(r["lat"] - 40.7) < 1e-9 and r["orientation"] == 6
    # inline (<= 4 byte) and absent paths
    assert exif.read_exif(exif.insert_app1(base, exif.build_app1(1, 2, description="hi")))["description"] == "hi"
    assert exif.read_exif(exif.insert_app1(base, exif.build_app1(1, 2)))["description"] is None


def test_image_text_meta_operator(spark):
    import numpy as np

    from extractors_geo_spark import png as _png
    from extractors_geo_spark.operators import multimodal as M

    g = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251
    p = _png.add_text_chunks(_png.encode(g), {"Title": "lakeside", "Author": "cam"})
    j = exif.insert_app1(_jpg(), exif.build_app1(1, 2, description="a pier"))
    rows = [("png1", bytearray(p)), ("jpg1", bytearray(j)),
            ("plain", bytearray(_jpg())), ("junk", bytearray(b"\x00" * 10))]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = sorted((r["image_id"], r["key"], r["value"])
                 for r in M.image_text_meta(df).collect())
    assert got == [("jpg1", "Description", "a pier"),
                   ("png1", "Author", "cam"), ("png1", "Title", "lakeside")]
