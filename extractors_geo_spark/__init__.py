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

__version__ = "0.1.0"
