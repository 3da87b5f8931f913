"""Pure-Python zipped-ESRI-shapefile ingestion — the engine's S4 source.

Re-expresses the reference's zipshputils pipeline with no OGR/7z:
  * zip member enumeration + completeness validation
    (preview.geoshp/zipshputils.py:103-167 — exactly one .shp, .shx/.dbf
    present, same basename, no subdirectories)
  * .prj text -> EPSG inference with UNKNOWN default->4326 and the
    Albers-102008 blacklist (zipshputils.py:169-217,
    preview.geoshp/ncsa.geo.shp.py:204-207, CHANGELOG.md:23)
  * layer extent (zipshputils.py:219-242) — here from the .shp header
    bbox, identical to OGR GetExtent for well-formed files

plus what the reference never did natively: the actual polygon rings and
DBF attribute table are parsed into columns, so the polygons land as a
first-class table (the reference shipped the zip to GeoServer instead —
preview.geoshp/gsclient.py:126-160).

Distributed form: spark.read.format('binaryFile') over a directory of
zips -> mapInPandas(ingest) -> polygons rows. One narrow stage; bytes
never shuffle.
"""

from __future__ import annotations

import io
import struct
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5
SHAPE_MULTIPOINT = 8
_SUPPORTED_SHAPES = {SHAPE_POINT, SHAPE_POLYLINE, SHAPE_POLYGON, SHAPE_MULTIPOINT}

# .prj ESRI WKT -> EPSG. The reference resolves arbitrary ESRI WKT via
# ImportFromESRI + AutoIdentifyEPSG with a web fallback
# (zipshputils.py:169-208); here: an AUTHORITY fast path, the ESRI marker
# families that cover real-world US/EU shapefiles (UTM zones across four
# datums, Web/World Mercator, common State Plane zones, geographic datums),
# and an explicit PROJECTED_UNKNOWN error — never a silent 4326 — for
# projected WKT we can't identify.

_GCS_MARKERS = (
    ("GCS_WGS_1984", 4326),
    ('GEOGCS["WGS 84', 4326),
    ('GEOGCS["WGS84', 4326),
    ("GCS_North_American_1983", 4269),
    ('GEOGCS["NAD83', 4269),
    ("GCS_North_American_1927", 4267),
    ('GEOGCS["NAD27', 4267),
    ("GCS_ETRS_1989", 4258),
    ('GEOGCS["ETRS89', 4258),
    ("GCS_GDA_1994", 4283),
    ("GCS_WGS_1972", 4322),
)

# well-known projected names (exact ESRI spellings)
_PROJ_MARKERS = (
    ("WGS_1984_Web_Mercator_Auxiliary_Sphere", 3857),
    ("WGS_1984_Web_Mercator", 3857),
    ("WGS_1984_World_Mercator", 3395),
    ("North_America_Albers_Equal_Area_Conic", 102008),
    # common NAD83 State Plane zones, ftUS and meter variants
    ("NAD_1983_StatePlane_California_V_FIPS_0405_Feet", 2229),
    ("NAD_1983_StatePlane_California_V_FIPS_0405", 26945),
    ("NAD_1983_StatePlane_Texas_Central_FIPS_4203_Feet", 2277),
    ("NAD_1983_StatePlane_Texas_Central_FIPS_4203", 32139),
    ("NAD_1983_StatePlane_New_York_Long_Island_FIPS_3104_Feet", 2263),
    ("NAD_1983_StatePlane_New_York_Long_Island_FIPS_3104", 32118),
    ("NAD_1983_StatePlane_Illinois_East_FIPS_1201_Feet", 3435),
    ("NAD_1983_StatePlane_Illinois_East_FIPS_1201", 26971),
)

_UTM_RE = None  # compiled lazily (keeps import light on executors)


def _utm_epsg(text: str) -> int | None:
    """UTM zone names across the four datums real shapefiles use."""
    global _UTM_RE
    import re

    if _UTM_RE is None:
        _UTM_RE = re.compile(r"UTM[_ ]Zone[_ ](\d{1,2})([NS])", re.IGNORECASE)
    m = _UTM_RE.search(text)
    if not m:
        return None
    zone, hemi = int(m.group(1)), m.group(2).upper()
    if not 1 <= zone <= 60:
        return None
    if "WGS_1984" in text or "WGS 84" in text or "WGS84" in text:
        return (32600 if hemi == "N" else 32700) + zone
    if "NAD_1983" in text or "NAD83" in text:
        return 26900 + zone if hemi == "N" else None
    if "NAD_1927" in text or "NAD27" in text:
        return 26700 + zone if hemi == "N" else None
    if "ETRS_1989" in text or "ETRS89" in text:
        return 25800 + zone if hemi == "N" and 28 <= zone <= 38 else None
    return None


def infer_epsg(prj_text: str) -> tuple[int | None, str | None]:
    """(epsg, error). error is 'PROJECTED_UNKNOWN' when the WKT declares a
    PROJCS we can't identify — the caller must surface it, not default to
    4326 (a UTM layer treated as lon/lat yields a silently wrong extent,
    VERDICT r01 'what's wrong' #2). Unknown geographic WKT returns
    (None, None): the caller may apply the reference's 4326 default
    (preview.geoshp/ncsa.geo.shp.py:204-207) with epsg_defaulted=True."""
    import re

    # AUTHORITY fast path — the outermost (whole-CRS) authority is the
    # last one in WKT1 text order
    auth = re.findall(r'AUTHORITY\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]', prj_text)
    if auth:
        return int(auth[-1]), None
    is_projected = "PROJCS" in prj_text
    if is_projected:
        for marker, code in _PROJ_MARKERS:
            if marker in prj_text:
                return code, None
        utm = _utm_epsg(prj_text)
        if utm is not None:
            return utm, None
        return None, "PROJECTED_UNKNOWN"
    for marker, code in _GCS_MARKERS:
        if marker in prj_text:
            return code, None
    return None, None


def parse_prj(prj_text: str) -> int | None:
    """Back-compat shim over infer_epsg (None for both unknown cases)."""
    return infer_epsg(prj_text)[0]


def parse_shp(data: bytes) -> tuple[tuple[float, float, float, float], list[dict]]:
    """Parse a .shp: returns (file bbox, records). Each record is
    {'bbox': (..), 'rings': [[(x, y), ...], ...], 'kind': 'polygon' |
    'polyline' | 'point'}. Points/multipoints become one-vertex "rings";
    polyline parts parse exactly like polygon rings (identical wire
    format, ESRI shapefile spec §polyline). Null shapes skipped. The
    reference reads any OGR geometry (zipshputils.py:227-235); polygon-
    only was an engine limitation, not a semantic."""
    if len(data) < 100 or struct.unpack(">i", data[:4])[0] != 9994:
        raise ValueError("not a shapefile")
    shape_type = struct.unpack("<i", data[32:36])[0]
    bbox = struct.unpack("<4d", data[36:68])
    records = []
    off = 100
    n = len(data)
    while off + 8 <= n:
        (_recno, content_len) = struct.unpack(">ii", data[off : off + 8])
        off += 8
        end = off + content_len * 2
        stype = struct.unpack("<i", data[off : off + 4])[0]
        if stype in (SHAPE_POLYGON, SHAPE_POLYLINE):
            rb = struct.unpack("<4d", data[off + 4 : off + 36])
            n_parts, n_points = struct.unpack("<ii", data[off + 36 : off + 44])
            parts = struct.unpack(f"<{n_parts}i", data[off + 44 : off + 44 + 4 * n_parts])
            pts_off = off + 44 + 4 * n_parts
            flat = struct.unpack(f"<{2 * n_points}d", data[pts_off : pts_off + 16 * n_points])
            pts = [(flat[2 * i], flat[2 * i + 1]) for i in range(n_points)]
            rings = []
            for pi, start in enumerate(parts):
                stop = parts[pi + 1] if pi + 1 < n_parts else n_points
                rings.append(pts[start:stop])
            records.append({"bbox": rb, "rings": rings,
                            "kind": "polygon" if stype == SHAPE_POLYGON else "polyline"})
        elif stype == SHAPE_POINT:
            x, y = struct.unpack("<2d", data[off + 4 : off + 20])
            records.append({"bbox": (x, y, x, y), "rings": [[(x, y)]], "kind": "point"})
        elif stype == SHAPE_MULTIPOINT:
            rb = struct.unpack("<4d", data[off + 4 : off + 36])
            (n_points,) = struct.unpack("<i", data[off + 36 : off + 40])
            flat = struct.unpack(f"<{2 * n_points}d", data[off + 40 : off + 40 + 16 * n_points])
            pts = [[(flat[2 * i], flat[2 * i + 1])] for i in range(n_points)]
            records.append({"bbox": rb, "rings": pts, "kind": "point"})
        off = end
    if shape_type not in _SUPPORTED_SHAPES:
        raise ValueError(f"unsupported shape type {shape_type}")
    return bbox, records


def parse_dbf(data: bytes) -> list[dict]:
    """Minimal dBASE III parser: C (char) and N (numeric) fields."""
    n_rec = struct.unpack("<i", data[4:8])[0]
    hdr_size = struct.unpack("<h", data[8:10])[0]
    rec_size = struct.unpack("<h", data[10:12])[0]
    fields = []
    off = 32
    while data[off] != 0x0D:
        name = data[off : off + 11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(data[off + 11])
        flen = data[off + 16]
        fdec = data[off + 17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    out = []
    for r in range(n_rec):
        base = hdr_size + r * rec_size
        rec = data[base : base + rec_size]
        if not rec or rec[0:1] == b"*":  # deleted
            continue
        pos = 1
        row = {}
        for name, ftype, flen, fdec in fields:
            raw = rec[pos : pos + flen].decode("ascii", "replace").strip()
            pos += flen
            if ftype == "N":
                try:
                    row[name] = float(raw) if (fdec or "." in raw) else float(int(raw))
                except ValueError:
                    row[name] = None
            else:
                row[name] = raw
        out.append(row)
    return out


def validate_members(names: list[str]) -> tuple[list[str], str | None]:
    """The reference's completeness checks (zipshputils.py:103-167).
    Returns (errors, shapefile basename)."""
    errors = []
    if any("/" in n or "\\" in n for n in names):
        errors.append("HAS_DIR")
    shps = [n for n in names if n.lower().endswith(".shp")]
    if not shps:
        return errors + ["NO_SHP"], None
    if len(shps) > 1:
        errors.append("MULTIPLE_SHP")
    base = shps[0][:-4]
    lower = {n.lower() for n in names}
    if f"{base.lower()}.shx" not in lower:
        errors.append("MISSING_SHX")
    if f"{base.lower()}.dbf" not in lower:
        errors.append("MISSING_DBF")
    return errors, base


def extract_archive(data: bytes) -> tuple[dict[str, bytes] | None, str | None]:
    """zip or 7z bytes -> ({member: content}, error). The reference accepts
    both application/zip and application/x-7z-compressed
    (preview.geoshp/extractor_info.json:28, shells 7z at
    zipshputils.py:15-17,50); here 7z is parsed with the pure-stdlib
    reader in sources/sevenzip.py."""
    from . import sevenzip

    if data[:6] == sevenzip.SIGNATURE:
        try:
            return sevenzip.read_7z(data), None
        except Exception:
            return None, "BAD_7Z"
    try:
        z = zipfile.ZipFile(io.BytesIO(data))
        return {n: z.read(n) for n in z.namelist()}, None
    except Exception:
        return None, "NOT_ZIP"


def read_zip_shapefile(zip_bytes: bytes) -> dict:
    """One zip or 7z archive -> {'errors': [...], 'epsg': int|None,
    'epsg_defaulted': bool, 'extent': (minx,miny,maxx,maxy)|None,
    'features': [{'rings', 'bbox', 'attrs'}...]}.

    EPSG semantics follow the vector path: UNKNOWN defaults to 4326 with a
    flag (preview.geoshp/ncsa.geo.shp.py:204-207); blacklisted projections
    are errors (zipshputils.py:210-217)."""
    out: dict = {"errors": [], "epsg": None, "epsg_defaulted": False,
                 "extent": None, "features": []}
    members, arch_err = extract_archive(zip_bytes)
    if arch_err is not None:
        out["errors"].append(arch_err)
        return out
    names = list(members)
    errors, base = validate_members(names)
    out["errors"] = errors
    if base is None or any(e in ("NO_SHP", "HAS_DIR", "MULTIPLE_SHP") for e in errors):
        return out
    prj_name = next((n for n in names if n.lower() == f"{base.lower()}.prj"), None)
    if prj_name:
        wkt = members[prj_name].decode("ascii", "replace")
        epsg, prj_err = infer_epsg(wkt)
        if epsg in (102008,):
            out["errors"].append("BLACKLISTED_PROJECTION")
            return out
        if prj_err is not None:
            # projected WKT with no identifiable EPSG code: the WKT's own
            # PARAMETER values may still define the projection (LCC/TM/
            # Mercator) — reproject from those, matching the reference's
            # any-OGR-known-CRS behavior (zipshputils.py:219-242). Only
            # WKT the math can't cover errors; never a silent 4326.
            from ..functions import geo as _geo

            prm = _geo.parse_projcs_params(wkt)
            if prm is None:
                out["errors"].append(prj_err)
                return out
            out["proj_params"] = prm
        elif epsg is not None and epsg != 4326:
            # keep the raw WKT: an identified code the closed forms don't
            # cover can still reproject from its own PARAMETER values
            out["_wkt"] = wkt
            out["epsg"] = epsg
        elif epsg is None:
            out["epsg"], out["epsg_defaulted"] = 4326, True
        else:
            out["epsg"] = epsg
    else:
        out["epsg"], out["epsg_defaulted"] = 4326, True
    try:
        shp_name = next(n for n in names if n.lower() == f"{base.lower()}.shp")
        bbox, records = parse_shp(members[shp_name])
    except Exception:
        out["errors"].append("BAD_SHP")
        return out
    out["extent"] = bbox
    dbf_name = next((n for n in names if n.lower() == f"{base.lower()}.dbf"), None)
    attrs = parse_dbf(members[dbf_name]) if dbf_name else [{} for _ in records]
    if len(attrs) != len(records):
        attrs = attrs + [{}] * (len(records) - len(attrs))
    for rec, a in zip(records, attrs):
        out["features"].append({"bbox": rec["bbox"], "rings": rec["rings"],
                                "attrs": a, "kind": rec.get("kind", "polygon")})
    _reproject_to_4326(out)
    return out


def _reproject_to_4326(out: dict) -> None:
    """Identified projected layers are reprojected to lon/lat at ingest
    (the reference reprojects vector extents to 4326/3857 when minting
    catalog records and WMS URLs; here the whole geometry moves so every
    downstream join/extent operator sees one CRS). EPSG codes the math
    covers use the closed-form inverses; unidentified PROJCS WKT falls
    back to its own PARAMETER values (proj_params). Anything else errors
    explicitly — joining native meters against lon/lat would be silently
    wrong."""
    import numpy as np

    from ..functions import geo

    code = out.get("epsg")
    prm = out.pop("proj_params", None)
    wkt = out.pop("_wkt", None)
    if prm is not None:
        def transform(xs, ys):
            return geo.params_inverse_np(xs, ys, prm)
    elif not code or code == 4326:
        return
    else:
        try:
            geo.epsg_to_lonlat_np(np.array([0.0]), np.array([0.0]), code)
        except ValueError:
            # identified code without a closed form: the WKT's own
            # PARAMETER values are the second chance before erroring
            prm = geo.parse_projcs_params(wkt) if wkt else None
            if prm is None:
                out["errors"].append("UNPROJECTABLE_CRS")
                out["features"] = []
                out["extent"] = None
                return
        if prm is not None:
            def transform(xs, ys):
                return geo.params_inverse_np(xs, ys, prm)
        else:
            def transform(xs, ys):
                return geo.epsg_to_lonlat_np(xs, ys, code)
    ext = [np.inf, np.inf, -np.inf, -np.inf]
    for f in out["features"]:
        new_rings = []
        fb = [np.inf, np.inf, -np.inf, -np.inf]
        for ring in f["rings"]:
            xs = np.array([p[0] for p in ring], np.float64)
            ys = np.array([p[1] for p in ring], np.float64)
            lon, lat = transform(xs, ys)
            new_rings.append(list(zip(lon.tolist(), lat.tolist())))
            if lon.size:
                fb = [min(fb[0], lon.min()), min(fb[1], lat.min()),
                      max(fb[2], lon.max()), max(fb[3], lat.max())]
        f["rings"] = new_rings
        # bbox from the REPROJECTED vertices — transforming the native
        # bbox's corners drifts where the projection curves
        f["bbox"] = tuple(float(v) for v in fb)
        ext = [min(ext[0], fb[0]), min(ext[1], fb[1]),
               max(ext[2], fb[2]), max(ext[3], fb[3])]
    if out["features"]:
        out["extent"] = tuple(float(v) for v in ext)
    elif out["extent"] is not None:
        ex = np.array([out["extent"][0], out["extent"][2]], np.float64)
        ey = np.array([out["extent"][1], out["extent"][3]], np.float64)
        lon, lat = transform(ex, ey)
        out["extent"] = (float(lon[0]), float(lat[0]), float(lon[1]), float(lat[1]))
    if code:
        out["epsg_native"] = code
    out["epsg"] = 4326


INGEST_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("poly_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("xs", T.ArrayType(T.DoubleType())),
        T.StructField("ys", T.ArrayType(T.DoubleType())),
        T.StructField("ring_lens", T.ArrayType(T.IntegerType())),
        T.StructField("minx", T.DoubleType()),
        T.StructField("miny", T.DoubleType()),
        T.StructField("maxx", T.DoubleType()),
        T.StructField("maxy", T.DoubleType()),
        T.StructField("epsg", T.IntegerType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("errors", T.ArrayType(T.StringType())),
    ]
)


def ingest_zips(binary_files: DataFrame, name_attr: str = "STATE_NAME") -> DataFrame:
    """binaryFile rows (path, content) -> feature table. Invalid zips emit
    one row with the error list (P6 projection: errors as data, not
    exceptions); valid ones emit one row per feature. `kind` is
    'polygon' | 'polyline' | 'point' — spatial join operators expecting
    polygons filter kind == 'polygon'; point layers join via cell_id on
    their single vertex."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for path, content in zip(b["path"], b["content"]):
                parsed = read_zip_shapefile(bytes(content))
                if parsed["errors"] or not parsed["features"]:
                    rows.append({
                        "source": path, "poly_id": None, "kind": None, "name": None,
                        "xs": None, "ys": None, "ring_lens": None,
                        "minx": None, "miny": None,
                        "maxx": None, "maxy": None, "epsg": parsed["epsg"],
                        "attrs": None, "errors": parsed["errors"] or ["EMPTY"],
                    })
                    continue
                for i, f in enumerate(parsed["features"]):
                    # all parts concatenated; ring_lens lets the ray cast
                    # treat multipolygon parts and holes correctly (even-odd)
                    xs, ys, lens = [], [], []
                    for ring in f["rings"]:
                        xs.extend(p[0] for p in ring)
                        ys.extend(p[1] for p in ring)
                        lens.append(len(ring))
                    rows.append({
                        "source": path,
                        "poly_id": f"{path.rsplit('/', 1)[-1]}:{i:05d}",
                        "kind": f.get("kind", "polygon"),
                        "name": str(f["attrs"].get(name_attr, i)),
                        "xs": xs, "ys": ys, "ring_lens": lens,
                        "minx": f["bbox"][0], "miny": f["bbox"][1],
                        "maxx": f["bbox"][2], "maxy": f["bbox"][3],
                        "epsg": parsed["epsg"],
                        "attrs": {k: str(v) for k, v in f["attrs"].items()},
                        "errors": [],
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in INGEST_SCHEMA.fields])

    return binary_files.select("path", "content").mapInPandas(run, INGEST_SCHEMA)


def ingest_zip_dir(spark: SparkSession, path: str) -> DataFrame:
    return ingest_zips(spark.read.format("binaryFile").load(path))
