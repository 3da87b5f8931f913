"""GeoParquet (OGC) sink + source — the lakehouse interop format for
the engine's polygon/footprint tables.

Spec shape (GeoParquet 1.1.0, opengeospatial/geoparquet): plain parquet
whose geometry column holds ISO WKB and whose FILE metadata carries a
``geo`` JSON blob (version, primary_column, per-column encoding,
geometry_types, bbox, crs; CRS omitted = OGC:CRS84 lon/lat — exactly
this engine's post-ingest frame). QGIS/GeoPandas/DuckDB-spatial read
these files directly.

Distributed write: Spark cannot attach custom key-value metadata to its
parquet footers, so each PARTITION writes its own footer-complete file
through pyarrow inside one mapInPandas pass (bytes never hit the
driver); the driver only collects the tiny per-file manifest (path,
rows, bbox). Reading uses Spark's parquet scan for the data plus a
driver-side footer read for the ``geo`` metadata, and decodes WKB back
to the engine's feature-table shape with the GeoPackage WKB parser.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import fs as xfs
from .geopackage import _encode_wkb, _parse_wkb

GEO_VERSION = "1.1.0"
_KIND_TO_TYPES = {"polygon": "Polygon", "polyline": "LineString", "point": "Point"}


def write_geoparquet(features: DataFrame, out_dir: str,
                     attrs: tuple[str, ...] = ("poly_id", "name")) -> dict:
    """Feature table (xs/ys ring arrays [+ ring_lens] + attrs) ->
    directory of GeoParquet files, one per partition. Returns the
    manifest {files: [{path, rows, bbox}], bbox, rows}."""
    meta_fs, out_norm = xfs.resolve(out_dir)
    xfs.mkdirs(meta_fs, out_norm)
    has_lens = "ring_lens" in features.columns
    has_kind = "kind" in features.columns
    cols = [*attrs, "xs", "ys"] + (["ring_lens"] if has_lens else []) \
        + (["kind"] if has_kind else [])

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        from extractors_geo_spark import fs as _xfs

        # resolve the ORIGINAL URI per-executor: a driver-resolved local
        # filesystem object is meaningless on a remote executor, and a
        # scheme-stripped s3:// path would silently write to a local
        # relative dir (ADVICE r4)
        fs_x, out_norm_x = _xfs.resolve(out_dir)
        pid = TaskContext.get().partitionId()
        rows = {a: [] for a in attrs}
        wkbs = []
        kinds = set()
        bbox = [None, None, None, None]
        for b in batches:
            for rec in b.itertuples(index=False):
                d = rec._asdict()
                xs, ys = list(d["xs"]), list(d["ys"])
                if has_lens and d.get("ring_lens") is not None and len(d["ring_lens"]):
                    rings = []
                    p = 0
                    for ln in d["ring_lens"]:
                        rings.append(list(zip(xs[p : p + ln], ys[p : p + ln])))
                        p += ln
                else:
                    rings = [list(zip(xs, ys))]
                kind = d.get("kind", "polygon") or "polygon"
                kinds.add(_KIND_TO_TYPES.get(kind, "Polygon"))
                wkbs.append(_encode_wkb(rings, kind))
                for a in attrs:
                    rows[a].append(d[a])
                mnx, mxx = min(xs), max(xs)
                mny, mxy = min(ys), max(ys)
                bbox[0] = mnx if bbox[0] is None else min(bbox[0], mnx)
                bbox[1] = mny if bbox[1] is None else min(bbox[1], mny)
                bbox[2] = mxx if bbox[2] is None else max(bbox[2], mxx)
                bbox[3] = mxy if bbox[3] is None else max(bbox[3], mxy)
        if not wkbs:
            yield pd.DataFrame(columns=["path", "rows", "minx", "miny", "maxx", "maxy"])
            return
        geo_meta = {
            "version": GEO_VERSION,
            "primary_column": "geometry",
            "columns": {
                "geometry": {
                    "encoding": "WKB",
                    "geometry_types": sorted(kinds),
                    "bbox": bbox,
                    # no "crs": spec default OGC:CRS84 (lon/lat WGS84)
                }
            },
        }
        table = pa.table({**{a: rows[a] for a in attrs},
                          "geometry": pa.array(wkbs, pa.binary())})
        table = table.replace_schema_metadata(
            {b"geo": json.dumps(geo_meta).encode()})
        path = f"{out_norm_x}/part-{pid:05d}.parquet"
        pq.write_table(table, path, filesystem=fs_x)
        yield pd.DataFrame([{"path": path, "rows": len(wkbs),
                             "minx": bbox[0], "miny": bbox[1],
                             "maxx": bbox[2], "maxy": bbox[3]}])

    manifest_rows = (features.select(*cols)
                     .mapInPandas(part, "path string, rows long, minx double, "
                                        "miny double, maxx double, maxy double")
                     .collect())
    files = [r.asDict() for r in manifest_rows if r["rows"]]
    return {
        "files": files,
        "rows": sum(f["rows"] for f in files),
        "bbox": [min(f["minx"] for f in files), min(f["miny"] for f in files),
                 max(f["maxx"] for f in files), max(f["maxy"] for f in files)]
        if files else None,
    }


def read_geo_metadata(path: str) -> dict:
    """The `geo` footer blob of one GeoParquet file (driver-side)."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path).metadata or {}
    if b"geo" not in md:
        raise ValueError("not a GeoParquet file (no geo footer metadata)")
    return json.loads(md[b"geo"])


def read_geoparquet(spark, path: str) -> DataFrame:
    """GeoParquet dir/file -> the engine's feature table (attrs + xs/ys
    flattened rings + ring_lens + kind + bbox cols), ready for
    pip_join/bbox_join. Validates the geo footer of one file."""
    meta_fs, norm = xfs.resolve(path)
    first = None
    info = meta_fs.get_file_info(norm)
    from pyarrow import fs as pafs

    if info.type == pafs.FileType.Directory:
        for i in xfs.listdir(meta_fs, norm):
            if i.path.endswith(".parquet"):
                first = i.path
                break
    else:
        first = norm
    if first is None:
        raise ValueError("no parquet files at path")
    meta = read_geo_metadata(first)
    prim = meta["primary_column"]
    if meta["columns"][prim]["encoding"] != "WKB":
        raise ValueError("only WKB-encoded GeoParquet is supported")

    df = spark.read.parquet(path)
    others = [c for c in df.columns if c != prim]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for rec in b.itertuples(index=False):
                d = rec._asdict()
                rings, kind, _ = _parse_wkb(bytes(d[prim]), 0)
                xs = [float(x) for r in rings for x, _ in r]
                ys = [float(y) for r in rings for _, y in r]
                out.append({**{c: d[c] for c in others},
                            "xs": xs, "ys": ys,
                            "ring_lens": [len(r) for r in rings],
                            "kind": kind,
                            "minx": min(xs), "miny": min(ys),
                            "maxx": max(xs), "maxy": max(ys)})
            yield pd.DataFrame(out, columns=[*others, "xs", "ys", "ring_lens",
                                             "kind", "minx", "miny", "maxx", "maxy"])

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields if f.name != prim)
    schema = (f"{fields}, xs array<double>, ys array<double>, "
              f"ring_lens array<int>, kind string, minx double, miny double, "
              f"maxx double, maxy double")
    return df.mapInPandas(decode, schema)
