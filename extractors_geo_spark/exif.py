"""EXIF APP1 GPS + orientation for JPEG crawl images.

CIPA DC-008 / TIFF 6.0 IFD structure, pure struct: an APP1 segment
("Exif\\0\\0" + TIFF header) whose IFD0 carries Orientation (0x0112) and
a GPSInfo pointer (0x8825) to a GPS IFD with lat/lon as degree-minute-
second RATIONALs plus N/S/E/W refs. This is the dominant REAL-WORLD geo
signal for web images — a crawl JPEG with a GPS IFD georeferences
without any GeoTIFF tags, feeding the same PIP/tiling pipeline
(reference analog: the extractors' findProjection/extent chain for
rasters; EXIF is its photo-world counterpart).

Writer + reader; the reader handles both byte orders and malformed
segments (errors raise ValueError — callers map to error rows).
"""

from __future__ import annotations

import struct

_SEC_DEN = 10_000_000  # seconds denominator: ~3e-11 deg quantization


def _dms(value: float) -> tuple[int, int, int, int, int, int]:
    """abs(decimal degrees) -> ((deg,1),(min,1),(sec_num,_SEC_DEN))."""
    v = abs(value)
    deg = int(v)
    mn = int((v - deg) * 60)
    sec = (v - deg) * 3600 - mn * 60
    return deg, 1, mn, 1, round(sec * _SEC_DEN), _SEC_DEN


def build_app1(lat: float, lon: float, orientation: int = 1,
               description: str | None = None) -> bytes:
    """APP1 segment bytes (FFE1 + length + Exif payload), little-endian.
    `description` lands in ImageDescription (0x010E) — the EXIF caption."""
    # GPS IFD: 4 entries + next-IFD pointer; rational data appended after
    def entry(tag, typ, cnt, value_or_offset):
        return struct.pack("<HHII", tag, typ, cnt, value_or_offset)

    desc = (description.encode("ascii", "replace") + b"\x00") if description else None
    n_ifd0 = 2 + (1 if desc else 0)
    # layout (offsets relative to TIFF header start):
    # 8: IFD0 | gps ifd | rational block | description string
    ifd0_off = 8
    ifd0_size = 2 + n_ifd0 * 12 + 4
    gps_off = ifd0_off + ifd0_size
    gps_size = 2 + 4 * 12 + 4
    rat_off = gps_off + gps_size
    desc_off = rat_off + 48

    lat_rat = _dms(lat)
    lon_rat = _dms(lon)
    rat_block = struct.pack("<6I", *lat_rat) + struct.pack("<6I", *lon_rat)

    ifd0 = struct.pack("<H", n_ifd0)
    if desc:
        if len(desc) <= 4:
            ifd0 += entry(0x010E, 2, len(desc),
                          int.from_bytes(desc.ljust(4, b"\x00"), "little"))
        else:
            ifd0 += entry(0x010E, 2, len(desc), desc_off)
    ifd0 += entry(0x0112, 3, 1, orientation)  # SHORT
    ifd0 += entry(0x8825, 4, 1, gps_off)      # LONG pointer to GPS IFD
    ifd0 += struct.pack("<I", 0)

    lat_ref = b"N\x00" if lat >= 0 else b"S\x00"
    lon_ref = b"E\x00" if lon >= 0 else b"W\x00"
    gps = struct.pack("<H", 4)
    gps += entry(0x0001, 2, 2, int.from_bytes(lat_ref + b"\x00\x00", "little"))
    gps += entry(0x0002, 5, 3, rat_off)
    gps += entry(0x0003, 2, 2, int.from_bytes(lon_ref + b"\x00\x00", "little"))
    gps += entry(0x0004, 5, 3, rat_off + 24)
    gps += struct.pack("<I", 0)

    tiff = b"II*\x00" + struct.pack("<I", ifd0_off) + ifd0 + gps + rat_block
    if desc and len(desc) > 4:
        tiff += desc
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg_bytes: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI."""
    if jpeg_bytes[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return jpeg_bytes[:2] + app1 + jpeg_bytes[2:]


def _ifd_entries(tiff: bytes, bo: str, off: int):
    (n,) = struct.unpack(bo + "H", tiff[off : off + 2])
    for i in range(n):
        p = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(bo + "HHI", tiff[p : p + 8])
        yield tag, typ, cnt, p + 8


def _rationals(tiff: bytes, bo: str, off: int, cnt: int):
    out = []
    for i in range(cnt):
        num, den = struct.unpack(bo + "II", tiff[off + 8 * i : off + 8 * i + 8])
        out.append(num / den if den else 0.0)
    return out


def read_exif(jpeg_bytes: bytes) -> dict:
    """JPEG -> {lat, lon, orientation}. lat/lon are signed decimal
    degrees or None when no GPS IFD exists; raises ValueError on
    malformed containers."""
    if jpeg_bytes[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    tiff = None
    n = len(jpeg_bytes)
    while pos + 4 <= n:
        if jpeg_bytes[pos] != 0xFF:
            break
        marker = jpeg_bytes[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", jpeg_bytes[pos + 2 : pos + 4])
        if marker == 0xE1 and jpeg_bytes[pos + 4 : pos + 10] == b"Exif\x00\x00":
            tiff = jpeg_bytes[pos + 10 : pos + 2 + seglen]
            break
        if marker == 0xDA:  # entropy data: no EXIF past here
            break
        pos += 2 + seglen
    out = {"lat": None, "lon": None, "orientation": 1, "description": None}
    if tiff is None:
        return out
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("bad TIFF header in EXIF")
    (ifd0,) = struct.unpack(bo + "I", tiff[4:8])
    gps_ptr = None
    for tag, typ, cnt, vp in _ifd_entries(tiff, bo, ifd0):
        if tag == 0x0112:
            (out["orientation"],) = struct.unpack(bo + "H", tiff[vp : vp + 2])
        elif tag == 0x010E and typ == 2:  # ImageDescription: the caption
            if cnt <= 4:
                raw = tiff[vp : vp + cnt]
            else:
                (off,) = struct.unpack(bo + "I", tiff[vp : vp + 4])
                raw = tiff[off : off + cnt]
            out["description"] = raw.rstrip(b"\x00").decode("ascii", "replace")
        elif tag == 0x8825:
            (gps_ptr,) = struct.unpack(bo + "I", tiff[vp : vp + 4])
    if gps_ptr is None:
        return out
    refs = {}
    dms = {}
    for tag, typ, cnt, vp in _ifd_entries(tiff, bo, gps_ptr):
        if tag in (0x0001, 0x0003):  # ASCII ref, stored inline
            refs[tag] = tiff[vp : vp + 1].decode("ascii", "replace")
        elif tag in (0x0002, 0x0004):
            (off,) = struct.unpack(bo + "I", tiff[vp : vp + 4])
            dms[tag] = _rationals(tiff, bo, off, min(cnt, 3))
    if 0x0002 in dms and 0x0004 in dms:
        d, m, s = (dms[0x0002] + [0, 0, 0])[:3]
        lat = d + m / 60 + s / 3600
        d, m, s = (dms[0x0004] + [0, 0, 0])[:3]
        lon = d + m / 60 + s / 3600
        out["lat"] = -lat if refs.get(0x0001) == "S" else lat
        out["lon"] = -lon if refs.get(0x0003) == "W" else lon
    return out
