"""Geodesy + reference-semantics expression library.

Two layers:

1. numpy kernels (suffix ``_np``) — vectorized math used inside Arrow
   pandas UDFs (the decode/extract path). Includes a 6th-order Krueger
   transverse-Mercator (public formulas, Karney 2011, "Transverse Mercator
   with an accuracy of a few nanometers") so UTM rasters reproject to
   EPSG:3857/4326 with no GDAL, matching the reference's
   osr.CoordinateTransformation path (preview.geotiff/geotiffutils.py:101-129).

2. Catalyst column expressions — pure `pyspark.sql.functions` builders that
   stay JVM-side under whole-stage codegen: Web-Mercator forward/inverse,
   the reference's antimeridian/pole clamps
   (preview.geotiff/geotiffutils.py:131-151), bbox reorder
   (metadata.geotiff/ncsa.image.geotiff.py:70), GeoJSON closed ring
   (metadata.geotiff/ncsa.image.geotiff.py:115-117), WMS GetMap URL
   (preview.geotiff/gsclient.py:69-79) and CSW record URL
   (pycsw.extractor/ncsa.geo.pycsw.py:278-285) minting, and the CSW corner
   axis swap (pycsw.extractor/pycswutils.py:100-107,130-136).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- constants
R_MERC = 6378137.0  # EPSG:3857 sphere radius
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
_E = math.sqrt(WGS84_F * (2.0 - WGS84_F))
_E2 = WGS84_F * (2.0 - WGS84_F)  # first eccentricity squared
_N = WGS84_F / (2.0 - WGS84_F)
_A_BAR = WGS84_A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)
_K0 = 0.9996
_FE = 500000.0

_n = _N
_ALPHA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180 - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
    13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440 + 281 * _n**5 / 630 - 1983433 * _n**6 / 1935360,
    61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880 + 167603 * _n**6 / 181440,
    49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
    34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
    212378941 * _n**6 / 319334400,
])
_BETA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360 - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
    _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105 - 1118711 * _n**6 / 3870720,
    17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480 + 5569 * _n**6 / 90720,
    4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
    4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
    20648693 * _n**6 / 638668800,
])
_DELTA = np.array([
    2 * _n - 2 * _n**2 / 3 - 2 * _n**3 + 116 * _n**4 / 45 + 26 * _n**5 / 45 - 2854 * _n**6 / 675,
    7 * _n**2 / 3 - 8 * _n**3 / 5 - 227 * _n**4 / 45 + 2704 * _n**5 / 315 + 2323 * _n**6 / 945,
    56 * _n**3 / 15 - 136 * _n**4 / 35 - 1262 * _n**5 / 105 + 73814 * _n**6 / 2835,
    4279 * _n**4 / 630 - 332 * _n**5 / 35 - 399572 * _n**6 / 14175,
    4174 * _n**5 / 315 - 144838 * _n**6 / 6237,
    601676 * _n**6 / 22275,
])
_J = np.arange(1, 7)

# The reference blacklists ESRI 102008 (North America Albers) —
# preview.geoshp/zipshputils.py:210-217, CHANGELOG.md:23.
EPSG_BLACKLIST = (102008,)


# ------------------------------------------------------------- numpy layer
def merc_forward_np(lon, lat):
    """EPSG:4326 -> EPSG:3857 (spherical, geodetic-lat quirk of 3857)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = R_MERC * np.radians(lon)
    y = R_MERC * np.arctanh(np.sin(np.radians(lat)))
    return x, y


def merc_inverse_np(x, y):
    """EPSG:3857 -> EPSG:4326."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / R_MERC)
    lat = np.degrees(np.arctan(np.sinh(y / R_MERC)))
    return lon, lat


def _tm_xi0(lat0_deg: float) -> float:
    """Scaled meridian arc xi at a parallel (the central-latitude offset a
    non-zero latitude-of-origin adds to the Krueger northing)."""
    if lat0_deg == 0.0:
        return 0.0
    phi = math.radians(lat0_deg)
    sphi = math.sin(phi)
    t = math.sinh(math.atanh(sphi) - _E * math.atanh(_E * sphi))
    xi_p = math.atan(t)  # lam = 0 on the central meridian
    return xi_p + float(np.sum(_ALPHA * np.sin(2 * _J * xi_p)))


def tm_inverse_np(e, nth, lat0: float, lon0: float, k0: float, fe: float, fn: float):
    """Generalized Transverse Mercator inverse (6th-order Krueger series,
    arbitrary origin/scale/offsets) — covers UTM and TM-based State Plane
    zones (e.g. Illinois East, EPSG:26971: lat0 36°40', k0 0.999975)."""
    e = np.asarray(e, dtype=np.float64)
    nth = np.asarray(nth, dtype=np.float64)
    xi = (nth - fn) / (k0 * _A_BAR) + _tm_xi0(lat0)
    eta = (e - fe) / (k0 * _A_BAR)
    xi2 = xi[..., None] * 2 * _J
    eta2 = eta[..., None] * 2 * _J
    xi_p = xi - np.sum(_BETA * np.sin(xi2) * np.cosh(eta2), axis=-1)
    eta_p = eta - np.sum(_BETA * np.cos(xi2) * np.sinh(eta2), axis=-1)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi + np.sum(_DELTA * np.sin(chi[..., None] * 2 * _J), axis=-1)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam) + lon0, np.degrees(phi)


def tm_forward_np(lon, lat, lat0: float, lon0: float, k0: float, fe: float, fn: float):
    """Generalized Transverse Mercator forward (6th-order Krueger series)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lam = np.radians(lon - lon0)
    phi = np.radians(lat)
    sphi = np.sin(phi)
    t = np.sinh(np.arctanh(sphi) - _E * np.arctanh(_E * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xi = xi_p + np.sum(_ALPHA * np.sin(xi_p[..., None] * 2 * _J) * np.cosh(eta_p[..., None] * 2 * _J), axis=-1)
    eta = eta_p + np.sum(_ALPHA * np.cos(xi_p[..., None] * 2 * _J) * np.sinh(eta_p[..., None] * 2 * _J), axis=-1)
    east = fe + k0 * _A_BAR * eta
    north = fn + k0 * _A_BAR * (xi - _tm_xi0(lat0))
    return east, north


def utm_inverse_np(e, nth, zone: int, south: bool = False):
    """UTM (WGS84) -> lon/lat via 6th-order Krueger inverse series."""
    return tm_inverse_np(e, nth, 0.0, zone * 6 - 183, _K0, _FE,
                         10000000.0 if south else 0.0)


def utm_forward_np(lon, lat, zone: int, south: bool = False):
    """lon/lat -> UTM (WGS84) via 6th-order Krueger forward series."""
    return tm_forward_np(lon, lat, 0.0, zone * 6 - 183, _K0, _FE,
                         10000000.0 if south else 0.0)


# ------------------------------------------------- Lambert conformal conic
# Snyder 1987 (Map Projections — A Working Manual, USGS PP 1395, pp.
# 107-109), ellipsoidal 2SP form — the State Plane projection the
# reference handles through OGR (preview.geoshp/zipshputils.py:219-242).
# NAD83 zones are defined on GRS80; its flattening differs from WGS84 in
# the 12th significant digit, far below the engine's tolerance.
US_FT = 1200.0 / 3937.0  # US survey foot, exact

# epsg -> (lat1, lat2, lat0, lon0, false_easting, false_northing, unit)
# (EPSG registry parameters; FE/FN in the zone's NATIVE unit)
LCC_ZONES = {
    # NAD83 / California zone 5 (m and ftUS)
    26945: (34 + 2 / 60, 35 + 28 / 60, 33.5, -118.0, 2000000.0, 500000.0, 1.0),
    2229: (34 + 2 / 60, 35 + 28 / 60, 33.5, -118.0, 6561666.667, 1640416.667, US_FT),
    # NAD83 / Texas Central (m and ftUS)
    32139: (30 + 7 / 60, 31 + 53 / 60, 29 + 40 / 60, -(100 + 20 / 60), 700000.0, 3000000.0, 1.0),
    2277: (30 + 7 / 60, 31 + 53 / 60, 29 + 40 / 60, -(100 + 20 / 60), 2296583.333, 9842500.0, US_FT),
    # NAD83 / New York Long Island (m and ftUS)
    32118: (40 + 40 / 60, 41 + 2 / 60, 40 + 10 / 60, -74.0, 300000.0, 0.0, 1.0),
    2263: (40 + 40 / 60, 41 + 2 / 60, 40 + 10 / 60, -74.0, 984250.0, 0.0, US_FT),
}

# epsg -> (lat0, lon0, k0, false_easting, false_northing, unit) for the
# TM-based State Plane zones
TM_ZONES = {
    # NAD83 / Illinois East (m and ftUS)
    26971: (36 + 40 / 60, -(88 + 20 / 60), 0.999975, 300000.0, 0.0, 1.0),
    3435: (36 + 40 / 60, -(88 + 20 / 60), 0.999975, 984250.0, 0.0, US_FT),
}

# epsg -> (lat1, lat2, lat0, lon0, false_easting, false_northing, unit) for
# common Albers equal-area CRSs (NAD83/GRS80 ~ WGS84, same datum policy as
# the LCC/TM tables). The reference reprojects these through OGR
# (preview.geoshp/zipshputils.py:219-242); 102008 stays blacklisted.
AEA_ZONES = {
    5070: (29.5, 45.5, 23.0, -96.0, 0.0, 0.0, 1.0),   # NAD83 / Conus Albers
    6350: (29.5, 45.5, 23.0, -96.0, 0.0, 0.0, 1.0),   # NAD83(2011) / Conus
    3310: (34.0, 40.5, 0.0, -120.0, 0.0, -4000000.0, 1.0),  # California Albers
    3338: (55.0, 65.0, 50.0, -154.0, 0.0, 0.0, 1.0),  # Alaska Albers
}


def merc_ell_forward_np(lon, lat):
    """EPSG:3395 World Mercator (ELLIPSOIDAL, unlike spherical 3857)."""
    lam = np.radians(np.asarray(lon, np.float64))
    phi = np.radians(np.asarray(lat, np.float64))
    x = WGS84_A * lam
    y = WGS84_A * (np.arctanh(np.sin(phi)) - _E * np.arctanh(_E * np.sin(phi)))
    return x, y


def merc_ell_inverse_np(x, y):
    """EPSG:3395 -> lon/lat (fixed-point on the conformal latitude)."""
    lon = np.degrees(np.asarray(x, np.float64) / WGS84_A)
    t = np.exp(-np.asarray(y, np.float64) / WGS84_A)
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(6):
        s = _E * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(t * ((1 - s) / (1 + s)) ** (_E / 2))
    return lon, np.degrees(phi)


def _lcc_consts(lat1: float, lat2: float, lat0: float):
    e = _E

    def m(phi):
        return math.cos(phi) / math.sqrt(1 - (e * math.sin(phi)) ** 2)

    def t(phi):
        s = e * math.sin(phi)
        return math.tan(math.pi / 4 - phi / 2) / ((1 - s) / (1 + s)) ** (e / 2)

    p1, p2, p0 = (math.radians(v) for v in (lat1, lat2, lat0))
    n = (math.log(m(p1)) - math.log(m(p2))) / (math.log(t(p1)) - math.log(t(p2)))
    f = m(p1) / (n * t(p1) ** n)
    rho0 = WGS84_A * f * t(p0) ** n
    return n, f, rho0


def lcc_forward_params_np(lon, lat, lat1, lat2, lat0, lon0, fe, fn, unit=1.0):
    """lon/lat -> LCC 2SP (native units), explicit zone parameters."""
    n, f, rho0 = _lcc_consts(lat1, lat2, lat0)
    phi = np.radians(np.asarray(lat, np.float64))
    s = _E * np.sin(phi)
    t = np.tan(np.pi / 4 - phi / 2) / ((1 - s) / (1 + s)) ** (_E / 2)
    rho = WGS84_A * f * t**n
    theta = n * np.radians(np.asarray(lon, np.float64) - lon0)
    east = rho * np.sin(theta) / unit + fe
    north = (rho0 - rho * np.cos(theta)) / unit + fn
    return east, north


def lcc_inverse_params_np(e, nth, lat1, lat2, lat0, lon0, fe, fn, unit=1.0):
    """LCC 2SP (native units) -> lon/lat, explicit zone parameters. The
    latitude series inverts t(phi) by fixed point — 6 rounds converge
    below 1e-12 rad."""
    n, f, rho0 = _lcc_consts(lat1, lat2, lat0)
    x = (np.asarray(e, np.float64) - fe) * unit
    y = (np.asarray(nth, np.float64) - fn) * unit
    rho = np.sign(n) * np.sqrt(x**2 + (rho0 - y) ** 2)
    t = (rho / (WGS84_A * f)) ** (1.0 / n)
    theta = np.arctan2(np.sign(n) * x, np.sign(n) * (rho0 - y))
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(6):
        s = _E * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(t * ((1 - s) / (1 + s)) ** (_E / 2))
    return np.degrees(theta / n) + lon0, np.degrees(phi)


# ------------------------------------------------- polar stereographic
# Snyder §21 (ellipsoid), EPSG 9829 (variant B, standard parallel) and
# 9810 (variant A, scale factor at the pole).
def _ps_t(phi: np.ndarray | float):
    """Conformal t (Snyder 15-9) — same kernel as LCC."""
    s = _E * np.sin(phi)
    return np.tan(np.pi / 4 - phi / 2) / ((1 - s) / (1 + s)) ** (_E / 2)


def _ps_rho_factor(lat_ts: float, k0: float | None):
    """rho = a * F * t; F from the standard parallel (variant B) or from
    k0 at the pole (variant A, |lat_ts| = 90)."""
    if k0 is not None or abs(abs(lat_ts) - 90.0) < 1e-9:
        k0 = 1.0 if k0 is None else k0
        return 2 * k0 / math.sqrt((1 + _E) ** (1 + _E) * (1 - _E) ** (1 - _E))
    pf = math.radians(abs(lat_ts))
    mf = math.cos(pf) / math.sqrt(1 - (_E * math.sin(pf)) ** 2)
    return mf / float(_ps_t(pf))


def ps_forward_params_np(lon, lat, lat_ts, lon0, fe, fn, unit=1.0, k0=None):
    """lon/lat -> polar stereographic (native units). South pole when
    lat_ts < 0 (the projection mirrors through the equator)."""
    south = lat_ts < 0
    sgn = -1.0 if south else 1.0
    Ffac = _ps_rho_factor(lat_ts, k0)
    phi = sgn * np.radians(np.asarray(lat, np.float64))
    lam = sgn * np.radians(np.asarray(lon, np.float64) - lon0)
    rho = WGS84_A * Ffac * _ps_t(phi)
    x = rho * np.sin(lam)
    y = -rho * np.cos(lam)
    return sgn * x / unit + fe, sgn * y / unit + fn


def ps_inverse_params_np(e, nth, lat_ts, lon0, fe, fn, unit=1.0, k0=None):
    """Polar stereographic (native units) -> lon/lat; conformal-latitude
    fixed point (same 6-round iteration as the LCC/Mercator inverses)."""
    south = lat_ts < 0
    sgn = -1.0 if south else 1.0
    Ffac = _ps_rho_factor(lat_ts, k0)
    x = sgn * (np.asarray(e, np.float64) - fe) * unit
    y = sgn * (np.asarray(nth, np.float64) - fn) * unit
    rho = np.sqrt(x * x + y * y)
    t = rho / (WGS84_A * Ffac)
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(6):
        s = _E * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(t * ((1 - s) / (1 + s)) ** (_E / 2))
    with np.errstate(invalid="ignore"):
        lam = np.arctan2(x, -y)
    lam = np.where(rho == 0, 0.0, lam)  # the pole itself has no azimuth
    return sgn * np.degrees(lam) + lon0, sgn * np.degrees(phi)


# epsg -> (lat_ts, lon0, false_easting, false_northing, unit)
PS_ZONES = {
    3413: (70.0, -45.0, 0.0, 0.0, 1.0),   # WGS84 / NSIDC Arctic
    3976: (-70.0, 0.0, 0.0, 0.0, 1.0),    # WGS84 / NSIDC Antarctic
    3031: (-71.0, 0.0, 0.0, 0.0, 1.0),    # WGS84 / Antarctic Polar Stereo
}


# ------------------------------------------------ Albers equal-area conic
# Snyder, "Map Projections — A Working Manual" §14 (ellipsoidal case),
# eqs 3-12 (q), 14-15 (m), 14-4/14-5/14-6 (n, C, rho), 3-16 (phi from q).
def _aea_q(sphi: np.ndarray | float):
    """Authalic q for sin(phi) (Snyder 3-12)."""
    es = _E * sphi
    return (1 - _E2) * (sphi / (1 - _E2 * sphi * sphi)
                        - (1 / (2 * _E)) * np.log((1 - es) / (1 + es)))


def _aea_consts(lat1: float, lat2: float, lat0: float):
    p1, p2, p0 = (math.radians(v) for v in (lat1, lat2, lat0))

    def m2(phi):
        return math.cos(phi) ** 2 / (1 - (_E * math.sin(phi)) ** 2)

    q1, q2, q0 = (float(_aea_q(math.sin(p)) ) for p in (p1, p2, p0))
    if abs(lat1 - lat2) < 1e-10:
        n = math.sin(p1)  # 1SP limit of (m1^2 - m2^2)/(q2 - q1)
    else:
        n = (m2(p1) - m2(p2)) / (q2 - q1)
    C = m2(p1) + n * q1
    rho0 = WGS84_A * math.sqrt(C - n * q0) / n
    return n, C, rho0


def aea_forward_params_np(lon, lat, lat1, lat2, lat0, lon0, fe, fn, unit=1.0):
    """lon/lat -> Albers equal-area conic (native units)."""
    n, C, rho0 = _aea_consts(lat1, lat2, lat0)
    q = _aea_q(np.sin(np.radians(np.asarray(lat, np.float64))))
    rho = WGS84_A * np.sqrt(C - n * q) / n
    theta = n * np.radians(np.asarray(lon, np.float64) - lon0)
    east = rho * np.sin(theta) / unit + fe
    north = (rho0 - rho * np.cos(theta)) / unit + fn
    return east, north


def aea_inverse_params_np(e, nth, lat1, lat2, lat0, lon0, fe, fn, unit=1.0):
    """Albers equal-area conic (native units) -> lon/lat. The latitude
    inverts q by Newton iteration (Snyder 3-16); 8 rounds reach <1e-13 rad
    everywhere off the poles."""
    n, C, rho0 = _aea_consts(lat1, lat2, lat0)
    x = (np.asarray(e, np.float64) - fe) * unit
    y = (np.asarray(nth, np.float64) - fn) * unit
    # for n<0 the signs of x, y, rho0 reverse in the angle (Snyder 14-11)
    sn = 1.0 if n >= 0 else -1.0
    rho = np.sqrt(x * x + (rho0 - y) ** 2)
    theta = np.arctan2(sn * x, sn * (rho0 - y))
    q = (C - (rho * n / WGS84_A) ** 2) / n
    phi = np.arcsin(np.clip(q / 2, -1.0, 1.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        for _ in range(8):
            s = np.sin(phi)
            es = _E * s
            phi = phi + (1 - _E2 * s * s) ** 2 / (2 * np.cos(phi)) * (
                q / (1 - _E2) - s / (1 - _E2 * s * s)
                + (1 / (2 * _E)) * np.log((1 - es) / (1 + es))
            )
    return np.degrees(theta / n) + lon0, np.degrees(phi)


def lcc_forward_np(lon, lat, epsg: int):
    """lon/lat -> LCC 2SP State Plane (native units) by EPSG code."""
    return lcc_forward_params_np(lon, lat, *LCC_ZONES[epsg])


def lcc_inverse_np(e, nth, epsg: int):
    """LCC 2SP State Plane (native units) -> lon/lat by EPSG code."""
    return lcc_inverse_params_np(e, nth, *LCC_ZONES[epsg])


# -------------------------------------------------- WKT parameter fallback
def parse_projcs_params(wkt: str) -> dict | None:
    """Extract a usable projection from raw ESRI/OGC PROJCS WKT when no
    EPSG code was identified: Lambert_Conformal_Conic (1SP/2SP),
    Transverse_Mercator, and Mercator parameter sets. Returns
    {"proj": "lcc"|"tmerc"|"merc", params...} or None.

    This is the reference's any-OGR-known-CRS behavior
    (preview.geoshp/zipshputils.py:219-242) without GDAL: the projection
    math comes from the WKT's own PARAMETER values. Datum is assumed
    WGS84-close (exact for NAD83/ETRS89; NAD27 carries its usual
    few-hundred-meter datum offset, same policy as the UTM handling)."""
    import re

    m = re.search(r'PROJECTION\s*\[\s*"([^"]+)"', wkt)
    if not m:
        return None
    proj_name = m.group(1).lower()

    params: dict[str, float] = {}
    for name, val in re.findall(r'PARAMETER\s*\[\s*"([^"]+)"\s*,\s*([-0-9.eE+]+)', wkt):
        params[name.lower()] = float(val)
    # linear unit: last UNIT[] in the WKT is the projected CRS's unit
    units = re.findall(r'UNIT\s*\[\s*"[^"]*"\s*,\s*([-0-9.eE+]+)', wkt)
    unit = float(units[-1]) if units else 1.0
    if abs(unit - 0.0174532925199433) < 1e-9:  # degree: no linear unit found
        unit = 1.0

    def p(*names, default=None):
        for nm in names:
            if nm in params:
                return params[nm]
        return default

    fe = p("false_easting", default=0.0)
    fn = p("false_northing", default=0.0)
    lon0 = p("central_meridian", "longitude_of_center", default=None)
    lat0 = p("latitude_of_origin", "latitude_of_center", default=0.0)

    if "lambert_conformal_conic" in proj_name:
        lat1 = p("standard_parallel_1")
        lat2 = p("standard_parallel_2", default=lat1)
        if lat1 is None or lon0 is None:
            return None
        return {"proj": "lcc", "lat1": lat1, "lat2": lat2, "lat0": lat0,
                "lon0": lon0, "fe": fe, "fn": fn, "unit": unit}
    if "polar_stereographic" in proj_name or proj_name == "stereographic_north_pole" \
            or proj_name == "stereographic_south_pole":
        # ESRI writes lat_ts as Standard_Parallel_1; OGC variant B uses
        # latitude_of_origin/standard_parallel; variant A carries a
        # scale_factor at the pole instead
        lat_ts = p("standard_parallel_1", "latitude_of_origin",
                   "latitude_of_standard_parallel", default=None)
        k0 = p("scale_factor", default=None)
        if lat_ts is None and k0 is None:
            return None
        # GDAL's WKT1 for variant-B CRSs (EPSG 3031/3413) emits BOTH the
        # standard parallel AND scale_factor=1; k0 must not shadow a
        # non-polar parallel (variant A only applies at |lat| == 90).
        if lat_ts is not None and abs(abs(lat_ts) - 90.0) > 1e-9:
            k0 = None
        if lat_ts is None:
            lat_ts = -90.0 if "south" in proj_name else 90.0
        if "south" in proj_name and lat_ts > 0:
            lat_ts = -lat_ts
        return {"proj": "ps", "lat_ts": lat_ts, "lon0": lon0 or 0.0,
                "fe": fe, "fn": fn, "unit": unit, "k0": k0}
    if "albers" in proj_name:
        # "Albers" / "Albers_Conic_Equal_Area" — the most common US .prj
        # family after LCC/TM (VERDICT r03 #3). 102008 never reaches here
        # (blacklisted by name upstream, zipshputils.py:210-217 parity).
        lat1 = p("standard_parallel_1")
        lat2 = p("standard_parallel_2", default=lat1)
        if lat1 is None or lon0 is None:
            return None
        return {"proj": "aea", "lat1": lat1, "lat2": lat2, "lat0": lat0,
                "lon0": lon0, "fe": fe, "fn": fn, "unit": unit}
    if "transverse_mercator" in proj_name:
        if lon0 is None:
            return None
        k0 = p("scale_factor", default=1.0)
        return {"proj": "tmerc", "lat0": lat0, "lon0": lon0, "k0": k0,
                "fe": fe, "fn": fn, "unit": unit}
    if proj_name in ("mercator", "mercator_auxiliary_sphere", "mercator_1sp",
                     "mercator_variant_a"):
        # NOT oblique/transverse variants — substring matching would
        # silently misproject Hotine_Oblique_Mercator as plain Mercator
        if p("scale_factor", default=1.0) != 1.0:
            return None
        if p("standard_parallel_1", default=0.0) != 0.0:
            return None  # 2SP form scales by cos(lat1): not covered
        # auxiliary-sphere (web) Mercator is SPHERICAL; plain Mercator is
        # ellipsoidal — the two differ by ~0.3% in northing, so the WKT's
        # projection name decides which inverse runs
        return {"proj": "merc", "lon0": lon0 or 0.0, "fe": fe, "fn": fn,
                "unit": unit, "sphere": "auxiliary_sphere" in proj_name}
    return None


def params_inverse_np(x, y, prm: dict):
    """Native point -> lon/lat for a parse_projcs_params result."""
    if prm["proj"] == "lcc":
        return lcc_inverse_params_np(x, y, prm["lat1"], prm["lat2"], prm["lat0"],
                                     prm["lon0"], prm["fe"], prm["fn"], prm["unit"])
    if prm["proj"] == "aea":
        return aea_inverse_params_np(x, y, prm["lat1"], prm["lat2"], prm["lat0"],
                                     prm["lon0"], prm["fe"], prm["fn"], prm["unit"])
    if prm["proj"] == "ps":
        return ps_inverse_params_np(x, y, prm["lat_ts"], prm["lon0"], prm["fe"],
                                    prm["fn"], prm["unit"], prm.get("k0"))
    if prm["proj"] == "tmerc":
        u = prm["unit"]
        return tm_inverse_np(np.asarray(x, np.float64) * u,
                             np.asarray(y, np.float64) * u,
                             prm["lat0"], prm["lon0"], prm["k0"],
                             prm["fe"] * u, prm["fn"] * u)
    if prm["proj"] == "merc":
        u = prm["unit"]
        xm = (np.asarray(x, np.float64) - prm["fe"]) * u
        ym = (np.asarray(y, np.float64) - prm["fn"]) * u
        inv = merc_inverse_np if prm.get("sphere") else merc_ell_inverse_np
        lon, lat = inv(xm, ym)
        return lon + prm["lon0"], lat
    raise ValueError(f"unsupported projection {prm['proj']}")


def params_forward_np(lon, lat, prm: dict):
    """lon/lat -> native point for a parse_projcs_params result."""
    if prm["proj"] == "lcc":
        return lcc_forward_params_np(lon, lat, prm["lat1"], prm["lat2"], prm["lat0"],
                                     prm["lon0"], prm["fe"], prm["fn"], prm["unit"])
    if prm["proj"] == "aea":
        return aea_forward_params_np(lon, lat, prm["lat1"], prm["lat2"], prm["lat0"],
                                     prm["lon0"], prm["fe"], prm["fn"], prm["unit"])
    if prm["proj"] == "ps":
        return ps_forward_params_np(lon, lat, prm["lat_ts"], prm["lon0"], prm["fe"],
                                    prm["fn"], prm["unit"], prm.get("k0"))
    if prm["proj"] == "tmerc":
        u = prm["unit"]
        e, n = tm_forward_np(lon, lat, prm["lat0"], prm["lon0"], prm["k0"],
                             prm["fe"] * u, prm["fn"] * u)
        return e / u, n / u
    if prm["proj"] == "merc":
        u = prm["unit"]
        fwd = merc_forward_np if prm.get("sphere") else merc_ell_forward_np
        x, y = fwd(np.asarray(lon, np.float64) - prm["lon0"], lat)
        return x / u + prm["fe"], y / u + prm["fn"]
    raise ValueError(f"unsupported projection {prm['proj']}")


def epsg_to_lonlat_np(x, y, epsg: int):
    """Native CRS point -> lon/lat. Supports 4326 (identity), 3857
    (inverse spherical Mercator) and UTM 326xx/327xx (Krueger inverse).
    Raises on anything else — caller maps that to the reference's
    'UNKNOWN' rejection (P5)."""
    if epsg == 4326:
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    if epsg == 3857:
        return merc_inverse_np(x, y)
    if 32601 <= epsg <= 32660:
        return utm_inverse_np(x, y, epsg - 32600, south=False)
    if 32701 <= epsg <= 32760:
        return utm_inverse_np(x, y, epsg - 32700, south=True)
    # NAD83 / ETRS89 UTM: GRS80 vs WGS84 ellipsoid differs by < 0.1 mm in
    # flattening — the WGS84 Krueger constants are exact for our 1e-5 m
    # tolerance; datum offset to WGS84 is defined as ~0 for both frames.
    if 26901 <= epsg <= 26923:
        return utm_inverse_np(x, y, epsg - 26900, south=False)
    if 25828 <= epsg <= 25838:
        return utm_inverse_np(x, y, epsg - 25800, south=False)
    if epsg == 3395:
        return merc_ell_inverse_np(x, y)
    if epsg in LCC_ZONES:
        return lcc_inverse_np(x, y, epsg)
    if epsg in TM_ZONES:
        lat0, lon0, k0, fe, fn, unit = TM_ZONES[epsg]
        return tm_inverse_np(np.asarray(x, np.float64) * unit,
                             np.asarray(y, np.float64) * unit,
                             lat0, lon0, k0, fe * unit, fn * unit)
    if epsg in AEA_ZONES:
        return aea_inverse_params_np(x, y, *AEA_ZONES[epsg])
    if epsg in PS_ZONES:
        return ps_inverse_params_np(x, y, *PS_ZONES[epsg])
    raise ValueError(f"unsupported epsg {epsg}")


def lonlat_to_epsg_np(lon, lat, epsg: int):
    """lon/lat -> native CRS point (forward of epsg_to_lonlat_np)."""
    if epsg == 4326:
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    if epsg == 3857:
        return merc_forward_np(lon, lat)
    if 32601 <= epsg <= 32660:
        return utm_forward_np(lon, lat, epsg - 32600, south=False)
    if 32701 <= epsg <= 32760:
        return utm_forward_np(lon, lat, epsg - 32700, south=True)
    if 26901 <= epsg <= 26923:
        return utm_forward_np(lon, lat, epsg - 26900, south=False)
    if 25828 <= epsg <= 25838:
        return utm_forward_np(lon, lat, epsg - 25800, south=False)
    if epsg == 3395:
        return merc_ell_forward_np(lon, lat)
    if epsg in LCC_ZONES:
        return lcc_forward_np(lon, lat, epsg)
    if epsg in TM_ZONES:
        lat0, lon0, k0, fe, fn, unit = TM_ZONES[epsg]
        e, n = tm_forward_np(lon, lat, lat0, lon0, k0, fe * unit, fn * unit)
        return e / unit, n / unit
    if epsg in AEA_ZONES:
        return aea_forward_params_np(lon, lat, *AEA_ZONES[epsg])
    if epsg in PS_ZONES:
        return ps_forward_params_np(lon, lat, *PS_ZONES[epsg])
    raise ValueError(f"unsupported epsg {epsg}")


def epsg_to_3857_np(x, y, epsg: int):
    """Native CRS point -> EPSG:3857, the reference's GOOGLE target
    (preview.geotiff/geotiffutils.py:101)."""
    if epsg == 3857:
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    lon, lat = epsg_to_lonlat_np(x, y, epsg)
    return merc_forward_np(lon, lat)


def clamp_origin_np(x0, y0, epsg: int):
    """The reference's validateBbox quick fix
    (preview.geotiff/geotiffutils.py:131-151): clamp the geotransform
    origin lon into [-179, 179] and lat into [-89, 89] — only meaningful
    when the native CRS is geographic, exactly as in the reference (it
    compares raw geotransform values against degree thresholds)."""
    x0 = np.asarray(x0, dtype=np.float64).copy()
    y0 = np.asarray(y0, dtype=np.float64).copy()
    x0[(x0 <= 180) & (x0 > 179)] = 179
    x0[(x0 >= -180) & (x0 < -179)] = -179
    y0[(y0 <= 90) & (y0 > 89)] = 89
    y0[(y0 >= -90) & (y0 < -89)] = -89
    return x0, y0


def point_in_ring_np(px, py, ring_xy: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray cast: are points (px, py) inside the closed
    polygon ring ``ring_xy`` (shape [k, 2])? Boundary-crossing convention
    matches the classic PNPOLY algorithm."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    x1 = ring_xy[:-1, 0][:, None]
    y1 = ring_xy[:-1, 1][:, None]
    x2 = ring_xy[1:, 0][:, None]
    y2 = ring_xy[1:, 1][:, None]
    cond = (y1 > py) != (y2 > py)
    # over: near-horizontal edges overflow the division; cond is False for
    # exactly-horizontal edges and a huge xin still compares correctly, but
    # without the suppression every batch floods executor logs with warnings
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        xin = (x2 - x1) * (py - y1) / (y2 - y1) + x1
    crossings = cond & (px < xin)
    return crossings.sum(axis=0) % 2 == 1


# ---------------------------------------------------------- Catalyst layer
def merc_x(lon: Column | str) -> Column:
    return F.lit(R_MERC) * F.radians(F.col(lon) if isinstance(lon, str) else lon)


def merc_y(lat: Column | str) -> Column:
    lat = F.col(lat) if isinstance(lat, str) else lat
    return F.lit(R_MERC) * F.atanh(F.sin(F.radians(lat)))


def inv_merc_lon(x: Column | str) -> Column:
    x = F.col(x) if isinstance(x, str) else x
    return F.degrees(x / F.lit(R_MERC))


def inv_merc_lat(y: Column | str) -> Column:
    y = F.col(y) if isinstance(y, str) else y
    return F.degrees(F.atan(F.sinh(y / F.lit(R_MERC))))


def clamp_lon(lon: Column) -> Column:
    """(179, 180] -> 179 and [-180, -179) -> -179, all else untouched
    (preview.geotiff/geotiffutils.py:135-139)."""
    return (
        F.when((lon <= 180) & (lon > 179), F.lit(179.0))
        .when((lon >= -180) & (lon < -179), F.lit(-179.0))
        .otherwise(lon)
    )


def clamp_lat(lat: Column) -> Column:
    """(89, 90] -> 89 and [-90, -89) -> -89 (preview.geotiff/geotiffutils.py:141-145)."""
    return (
        F.when((lat <= 90) & (lat > 89), F.lit(89.0))
        .when((lat >= -90) & (lat < -89), F.lit(-89.0))
        .otherwise(lat)
    )


def box_reordered(minx: Column, miny: Column, maxx: Column, maxy: Column) -> Column:
    """The reference's raster `box` ordering [minx, maxy, maxx, miny]
    (metadata.geotiff/ncsa.image.geotiff.py:70)."""
    return F.array(minx, maxy, maxx, miny)


def geojson_ring(minx: Column, miny: Column, maxx: Column, maxy: Column) -> Column:
    """Closed 5-point Polygon ring in the reference's vertex order
    (metadata.geotiff/ncsa.image.geotiff.py:115-117):
    [LL, UL, UR, LR, LL]."""
    pt = lambda x, y: F.array(x, y)  # noqa: E731
    return F.array(pt(minx, miny), pt(minx, maxy), pt(maxx, maxy), pt(maxx, miny), pt(minx, miny))


def wms_getmap_url(
    base: Column | str,
    workspace: Column | str,
    layer: Column,
    minx: Column,
    miny: Column,
    maxx: Column,
    maxy: Column,
    width: int = 640,
    height: int = 480,
) -> Column:
    """Literal GetMap URL shape of the reference
    (preview.geotiff/gsclient.py:75-76), including
    width=640&height=480&srs=EPSG:3857&format=image%2Fpng."""
    base = F.lit(base) if isinstance(base, str) else base
    workspace = F.lit(workspace) if isinstance(workspace, str) else workspace
    return F.concat(
        base,
        F.lit("/wms?request=GetMap&layers="),
        workspace, F.lit(":"), layer,
        F.lit("&bbox="),
        F.concat_ws(",", minx.cast("string"), miny.cast("string"),
                    maxx.cast("string"), maxy.cast("string")),
        F.lit(f"&width={width}&height={height}&srs=EPSG:3857&format=image%2Fpng"),
    )


def csw_record_url(base: Column | str, workspace: Column | str, store: Column) -> Column:
    """CSW GetRecordById URL (pycsw.extractor/ncsa.geo.pycsw.py:278-285)."""
    base = F.lit(base) if isinstance(base, str) else base
    workspace = F.lit(workspace) if isinstance(workspace, str) else workspace
    return F.concat(
        base,
        F.lit("?request=GetRecordById&service=CSW&version=2.0.2&elementsetname=full&id="),
        workspace, F.lit(":"), store,
        F.lit("&outputschema=http://www.isotc211.org/2005/gmd"),
    )


def csw_corners(minx3857: Column, miny3857: Column, maxx3857: Column, maxy3857: Column) -> tuple[Column, Column]:
    """CSW lower/upper corner strings: inverse-Mercator to 4326, then the
    reference's axis swap to 'lat lon' (pycsw.extractor/pycswutils.py:100-107,
    130-136; consumed at ncsa.geo.pycsw.py:239-240)."""
    lo = F.concat_ws(" ", inv_merc_lat(miny3857).cast("string"), inv_merc_lon(minx3857).cast("string"))
    hi = F.concat_ws(" ", inv_merc_lat(maxy3857).cast("string"), inv_merc_lon(maxx3857).cast("string"))
    return lo, hi


def bbox_from_url(url: Column) -> tuple[Column, Column, Column, Column]:
    """F9: parse the `bbox=` csv out of a query string -> 4 doubles
    (pycsw.extractor/pycswutils.py:89-109)."""
    csv = F.regexp_extract(url, r"[?&]bbox=([^&]*)", 1)
    parts = F.split(csv, ",")
    return tuple(F.element_at(parts, i + 1).cast("double") for i in range(4))


def proxy_rewrite(url: Column, proxy_prefix: Column | str) -> Column:
    """F14: replace scheme://netloc with a proxy prefix
    (preview.geotiff/ncsa.geo.tiff.py:195-198,230-237;
    pycsw.extractor/pycswutils.py:116-121)."""
    proxy_prefix = F.lit(proxy_prefix) if isinstance(proxy_prefix, str) else proxy_prefix
    return F.concat(proxy_prefix, F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""))


def catalog_record_json(identifier: Column, title: Column, lower_corner: Column,
                        upper_corner: Column, wms_url: Column) -> Column:
    """F10: the CSW insert-record payload as a serialized document — the
    engine's replacement for the %=token=% XML template instantiation
    (pycsw.extractor/pycswutils.py:26-65, pycsw_insert_template.xml:1-18).
    JSON rather than XML: same information, canonical field order."""
    return F.to_json(F.struct(
        identifier.alias("identifier"), title.alias("title"),
        lower_corner.alias("lower_corner"), upper_corner.alias("upper_corner"),
        wms_url.alias("wms_url"),
    ))


def storename(filename: Column, file_id: Column) -> Column:
    """storename = filename + '_' + fileid (preview.geotiff/ncsa.geo.tiff.py:57)."""
    return F.concat(filename, F.lit("_"), file_id)


def style_range(mean: Column, std: Column) -> tuple[Column, Column]:
    """Colormap range mu-2sigma .. mu+2sigma (preview.geotiff/geotiffutils.py:163-164)."""
    return mean - 2 * std, mean + 2 * std


def nodata_placement(nodata: Column, style_min: Column, style_max: Column) -> Column:
    """The three nodata colormap placements of the reference
    (preview.geotiff/geotiffutils.py:175-197): 'invalid' when nodata is
    null/0/inside the open range, 'below' when <= min, 'above' when >= max."""
    return (
        F.when(nodata.isNull() | (nodata == 0), F.lit("invalid"))
        .when((nodata > style_min) & (nodata < style_max), F.lit("invalid"))
        .when(nodata <= style_min, F.lit("below"))
        .otherwise(F.lit("above"))
    )
