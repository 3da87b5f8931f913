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
        T.StructField("has_color_table", T.BooleanType()),
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


def _decode_header(data: bytes, fmt: str, with_stats: bool) -> dict:
    """Per-row part of the decode: TIFF header (+ optional pixel stats).
    Geodesy is deliberately NOT done here — projecting 2 corner points per
    row through numpy costs more in array overhead than the math; the
    batch layer below projects all rows of an epsg group in one shot."""
    out: dict = {"meta": None, "stats": None, "error": None,
                 "_gx0": 0.0, "_gy0": 0.0, "_gx1": 0.0, "_gy1": 0.0, "_epsg": 0}
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
        "has_color_table": info.has_color_table,
    }
    gt = info.geotransform
    out["_gx0"], out["_gy0"] = gt[0], gt[3]
    out["_gx1"] = gt[0] + gt[1] * info.width + gt[2] * info.height
    out["_gy1"] = gt[3] + gt[4] * info.width + gt[5] * info.height
    out["_epsg"] = info.epsg
    if with_stats:
        try:
            arr = tiff.read_pixels(bytes(data), info)
            mn, mx_, mean, std = tiff.band_stats(arr, info.nodata)
            out["stats"] = {"min": mn, "max": mx_, "average": mean, "st_dev": std}
        except Exception:
            out["error"] = "pixel decode failed"
    return out


def _project_batch(res: pd.DataFrame) -> tuple[list, list, list]:
    """Vectorized geodesy for a whole Arrow batch, grouped by epsg:
    validateBbox clamp on the ORIGIN corner before transform
    (geotiffutils.py:104-106), corners -> 3857 extent, centroid -> lonlat."""
    n = len(res)
    extents: list = [None] * n
    lons: list = [None] * n
    lats: list = [None] * n
    ok = res["error"].isna().to_numpy() & (res["_epsg"].to_numpy() != 0)
    if not ok.any():
        return extents, lons, lats
    epsgs = res["_epsg"].to_numpy()
    gx0 = res["_gx0"].to_numpy(np.float64)
    gy0 = res["_gy0"].to_numpy(np.float64)
    gx1 = res["_gx1"].to_numpy(np.float64)
    gy1 = res["_gy1"].to_numpy(np.float64)
    for code in np.unique(epsgs[ok]):
        idx = np.nonzero(ok & (epsgs == code))[0]
        try:
            x0, y0 = geo.clamp_origin_np(gx0[idx], gy0[idx], int(code))
            ax0, ay0 = geo.epsg_to_3857_np(x0, y0, int(code))
            ax1, ay1 = geo.epsg_to_3857_np(gx1[idx], gy1[idx], int(code))
            cx = (np.minimum(gx0[idx], gx1[idx]) + np.maximum(gx0[idx], gx1[idx])) / 2.0
            cy = (np.minimum(gy0[idx], gy1[idx]) + np.maximum(gy0[idx], gy1[idx])) / 2.0
            clon, clat = geo.epsg_to_lonlat_np(cx, cy, int(code))
        except ValueError:
            for i in idx:
                res.iat[i, res.columns.get_loc("error")] = "UNKNOWN projection"
                res.iat[i, res.columns.get_loc("meta")] = None
            continue
        mnx, mxx = np.minimum(ax0, ax1), np.maximum(ax0, ax1)
        mny, mxy = np.minimum(ay0, ay1), np.maximum(ay0, ay1)
        for j, i in enumerate(idx):
            extents[i] = {"minx": float(mnx[j]), "miny": float(mny[j]),
                          "maxx": float(mxx[j]), "maxy": float(mxy[j])}
            lons[i] = float(clon[j])
            lats[i] = float(clat[j])
    return extents, lons, lats


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
            recs = [_decode_header(d, f, with_stats) for d, f in zip(b["bytes"], b["fmt"])]
            res = pd.DataFrame(recs)
            extents, lons, lats = _project_batch(res)
            out = pd.DataFrame({"image_id": b["image_id"].values})
            for c in keep:
                out[c] = b[c].values
            for c in ("meta", "stats", "error"):
                out[c] = res[c].values
            out["extent_3857"] = extents
            out["lon"] = lons
            out["lat"] = lats
            yield out[["image_id", *keep, "meta", "stats", "extent_3857", "lon", "lat", "error"]]

    cols = ["image_id", "bytes", "fmt"] + [c for c in keep if c != "fmt"]
    return images.select(*dict.fromkeys(cols)).mapInPandas(run, schema)


def valid_meta(meta_df: DataFrame) -> DataFrame:
    return meta_df.filter(F.col("error").isNull())


def geo_positions(images: DataFrame) -> DataFrame:
    """Mixed crawl table -> one position table: GeoTIFF rows georeference
    from their tags (extract_meta footprint centroid), JPEG rows from
    their EXIF GPS IFD (multimodal.exif_geo) — the realistic web-image
    reality where both sources coexist. Output
    (image_id, lon, lat, src in {'geotiff','exif'}), rows without a
    usable position dropped (anti-joinable). Each branch filters by
    format FIRST so bytes take exactly one decode path."""
    from . import multimodal as _mm

    is_tiff = F.col("fmt").isin("tiff", "tif")
    tiffs = valid_meta(extract_meta(images.filter(is_tiff), with_stats=False))
    t_pos = tiffs.select("image_id", "lon", "lat", F.lit("geotiff").alias("src"))
    jp = _mm.exif_geo(images.filter(~is_tiff))
    j_pos = (jp.filter(F.col("error").isNull() & F.col("lon").isNotNull())
             .select("image_id", "lon", "lat", F.lit("exif").alias("src")))
    return t_pos.unionByName(j_pos)


def with_box_and_ring(meta_df: DataFrame) -> DataFrame:
    """Attach the reference's reordered `box` + closed GeoJSON ring
    (metadata.geotiff/ncsa.image.geotiff.py:70,115-117) as columns."""
    m = F.col("meta")
    return meta_df.withColumn(
        "box", geo.box_reordered(m.minx, m.miny, m.maxx, m.maxy)
    ).withColumn("ring", geo.geojson_ring(m.minx, m.miny, m.maxx, m.maxy))
