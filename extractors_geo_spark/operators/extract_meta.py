"""extract_meta — batch GeoTIFF header/pixel decode as a mapInPandas stage.

Re-expresses the reference's per-file metadata extraction
(metadata.geotiff/ncsa.image.geotiff.py:63-120 and
preview.geotiff/geotiffutils.py:11-31,57-129) as ONE Arrow-batched Python
stage:

  images(image_id, bytes, fmt, ...) -> meta rows with
    box ordering [minx, maxy, maxx, miny]   (ncsa.image.geotiff.py:70)
    proj name from the CRS citation         (ncsa.image.geotiff.py:76-78)
    pixel size w>0 / h<0                    (ncsa.image.geotiff.py:85-89)
    exact band stats (min,max,mean,std)     (ncsa.image.geotiff.py:96-101)
    EPSG:3857 extent with origin clamping   (geotiffutils.py:93-151)
    error strings instead of exceptions     (ncsa.geo.tiff.py:243-253)

Scale notes:
  * Input projection is pruned to (pass-through cols + bytes); `bytes`
    never survives into the output, so nothing downstream shuffles pixels.
  * The whole stage is narrow (no shuffle) — 1 Arrow crossing per batch.
  * UNKNOWN-projection rejection (P1/P5) emits `error` rather than
    dropping rows, mirroring the reference's status messages; callers
    filter(error IS NULL) which Catalyst pushes into later scans when the
    result is persisted.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import tiff
from ..functions import geo

META_FIELDS = T.StructType(
    [
        T.StructField("minx", T.DoubleType()),
        T.StructField("miny", T.DoubleType()),
        T.StructField("maxx", T.DoubleType()),
        T.StructField("maxy", T.DoubleType()),
        T.StructField("epsg", T.IntegerType()),
        T.StructField("px_w", T.DoubleType()),
        T.StructField("px_h", T.DoubleType()),
        T.StructField("x_size", T.IntegerType()),
        T.StructField("y_size", T.IntegerType()),
        T.StructField("proj", T.StringType()),
        T.StructField("nodata", T.DoubleType()),
    ]
)
STATS_FIELDS = T.StructType(
    [
        T.StructField("min", T.DoubleType()),
        T.StructField("max", T.DoubleType()),
        T.StructField("average", T.DoubleType()),
        T.StructField("st_dev", T.DoubleType()),
    ]
)
EXTENT_FIELDS = T.StructType(
    [
        T.StructField("minx", T.DoubleType()),
        T.StructField("miny", T.DoubleType()),
        T.StructField("maxx", T.DoubleType()),
        T.StructField("maxy", T.DoubleType()),
    ]
)


def _decode_one(data: bytes, fmt: str, with_stats: bool) -> dict:
    out: dict = {"meta": None, "stats": None, "extent_3857": None,
                 "lon": None, "lat": None, "error": None}
    if fmt not in ("tiff", "tif"):
        # mimetype routing: non-tiff never reaches the raster decoder (P2)
        out["error"] = "not tiff"
        return out
    try:
        info = tiff.read_info(bytes(data))
    except Exception:
        out["error"] = "not a geotiff"  # checkGeotiff fail (geotiffutils.py:46-55)
        return out
    if info.epsg is None:
        out["error"] = "UNKNOWN projection"  # P1/P5 rejection
        return out
    if info.epsg in geo.EPSG_BLACKLIST:
        out["error"] = f"blacklisted epsg {info.epsg}"
        return out
    b = info.bounds()
    if b is None:
        out["error"] = "no geotransform"
        return out
    minx, miny, maxx, maxy = b
    out["meta"] = {
        "minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy,
        "epsg": info.epsg,
        "px_w": info.pixel_scale[0], "px_h": -info.pixel_scale[1],  # height<0, north-up
        "x_size": info.width, "y_size": info.height,
        "proj": info.citation, "nodata": info.nodata,
    }
    try:
        # validateBbox clamp on the ORIGIN before transform (geotiffutils.py:104-106)
        gt = info.geotransform
        x0, y0 = geo.clamp_origin_np(np.array([gt[0]]), np.array([gt[3]]), info.epsg)
        x1 = gt[0] + gt[1] * info.width + gt[2] * info.height
        y1 = gt[3] + gt[4] * info.width + gt[5] * info.height
        mx, my = geo.epsg_to_3857_np(np.array([x0[0], x1]), np.array([y0[0], y1]), info.epsg)
        out["extent_3857"] = {
            "minx": float(mx.min()), "miny": float(my.min()),
            "maxx": float(mx.max()), "maxy": float(my.max()),
        }
        clon, clat = geo.epsg_to_lonlat_np(
            np.array([(minx + maxx) / 2.0]), np.array([(miny + maxy) / 2.0]), info.epsg
        )
        out["lon"], out["lat"] = float(clon[0]), float(clat[0])
    except ValueError:
        out["error"] = "UNKNOWN projection"
        out["meta"] = None
        return out
    if with_stats:
        try:
            arr = tiff.read_pixels(bytes(data), info)
            mn, mx_, mean, std = tiff.band_stats(arr, info.nodata)
            out["stats"] = {"min": mn, "max": mx_, "average": mean, "st_dev": std}
        except Exception:
            out["error"] = "pixel decode failed"
    return out


def extract_meta(
    images: DataFrame,
    with_stats: bool = True,
    passthrough: tuple[str, ...] = ("w", "h", "fmt", "caption", "phash"),
) -> DataFrame:
    """images -> meta table. Output drops `bytes` (projection discipline:
    pixels never cross a shuffle)."""
    keep = [c for c in passthrough if c in images.columns]
    schema = T.StructType(
        [images.schema["image_id"]]
        + [images.schema[c] for c in keep]
        + [
            T.StructField("meta", META_FIELDS),
            T.StructField("stats", STATS_FIELDS),
            T.StructField("extent_3857", EXTENT_FIELDS),
            T.StructField("lon", T.DoubleType()),
            T.StructField("lat", T.DoubleType()),
            T.StructField("error", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = [_decode_one(d, f, with_stats) for d, f in zip(b["bytes"], b["fmt"])]
            res = pd.DataFrame(recs)
            out = pd.DataFrame({"image_id": b["image_id"].values})
            for c in keep:
                out[c] = b[c].values
            for c in ("meta", "stats", "extent_3857", "lon", "lat", "error"):
                out[c] = res[c].values
            yield out

    cols = ["image_id", "bytes", "fmt"] + [c for c in keep if c != "fmt"]
    return images.select(*dict.fromkeys(cols)).mapInPandas(run, schema)


def valid_meta(meta_df: DataFrame) -> DataFrame:
    return meta_df.filter(F.col("error").isNull())


def with_box_and_ring(meta_df: DataFrame) -> DataFrame:
    """Attach the reference's reordered `box` + closed GeoJSON ring
    (metadata.geotiff/ncsa.image.geotiff.py:70,115-117) as columns."""
    m = F.col("meta")
    return meta_df.withColumn(
        "box", geo.box_reordered(m.minx, m.miny, m.maxx, m.maxy)
    ).withColumn("ring", geo.geojson_ring(m.minx, m.miny, m.maxx, m.maxy))
