"""extractors_geo_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the capabilities of the reference
extractors-geo (Clowder geospatial extractors: GeoTIFF/shapefile bounds
extraction, EPSG inference, 4326<->3857 reprojection, WMS tile-pyramid
generation, CSW catalog maintenance) as distributed Spark DataFrame
operators over image+caption tables.

Layout:
  session     SparkSession factory (Arrow, AQE, sane shuffle partitions)
  tiff        pure-Python (Geo)TIFF reader/writer used by datagen + decode UDFs
  datagen     deterministic synthetic images / polygons / events tables
  functions/  column-expression library (Mercator math, clamps, URLs, text)
  operators/  engine operators (extract_meta, cells, pip_join, knn, tiles,
              dedup, similarity, catalog)
  plans/      planner functions (broadcast-vs-partitioned, salting, splitting)
  sources/    table loaders
  streaming/  per-partition lineage + checkpoint/resume, removal propagation
"""

__version__ = "0.3.0"


_API = {
        "get_spark": ("extractors_geo_spark.session", "get_spark"),
        "extract_meta": ("extractors_geo_spark.operators.extract_meta", None),
        "cells": ("extractors_geo_spark.operators.cells", None),
        "pip_join": ("extractors_geo_spark.operators.pip_join", None),
        "bbox_join": ("extractors_geo_spark.operators.bbox_join", None),
        "knn": ("extractors_geo_spark.operators.knn", None),
        "tiles": ("extractors_geo_spark.operators.tiles", None),
        "dedup": ("extractors_geo_spark.operators.dedup", None),
        "similarity": ("extractors_geo_spark.operators.similarity", None),
        "catalog": ("extractors_geo_spark.operators.catalog", None),
        "multimodal": ("extractors_geo_spark.operators.multimodal", None),
        "geo": ("extractors_geo_spark.functions.geo", None),
        "text": ("extractors_geo_spark.functions.text", None),
        "planner": ("extractors_geo_spark.plans.planner", None),
        "shapefile": ("extractors_geo_spark.sources.shapefile", None),
        "geojson": ("extractors_geo_spark.sources.geojson", None),
        "geopackage": ("extractors_geo_spark.sources.geopackage", None),
        "geoparquet": ("extractors_geo_spark.sources.geoparquet", None),
        "exif": ("extractors_geo_spark.exif", None),
        "h264": ("extractors_geo_spark.h264", None),
        "aac": ("extractors_geo_spark.aac", None),
        "mp3": ("extractors_geo_spark.mp3", None),
        "mp4": ("extractors_geo_spark.mp4", None),
        "subtitles": ("extractors_geo_spark.subtitles", None),
        "SnapshotTable": ("extractors_geo_spark.sources.snapshot_table", "SnapshotTable"),
        "run_with_lineage": ("extractors_geo_spark.streaming.lineage", "run_with_lineage"),
        "propagate_removals": ("extractors_geo_spark.streaming.removal", "propagate_removals"),
}


def __getattr__(name):
    """Lazy top-level API: `from extractors_geo_spark import pip_join` etc.
    without importing pyspark-heavy modules at package import time. The
    resolved value is cached in module globals so each name imports once
    per process."""
    import importlib

    if name not in _API:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    mod_name, attr = _API[name]
    mod = importlib.import_module(mod_name)
    val = getattr(mod, attr) if attr else mod
    globals()[name] = val
    return val
