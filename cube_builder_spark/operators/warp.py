"""C1 (geometric half) — warp: reproject + resample scenes onto the
target grid.

Reference: ``processing.py:303-316`` calls ``rasterio.warp.reproject``
with (src_transform, src_crs) → (dst_transform, dst_crs) and a
resampling mode (nearest for quality, configurable for spectral).

This is a dependency-free reimplementation of that exact contract:

- Projection math from public formulas (Snyder, *Map Projections — A
  Working Manual*, USGS PP 1395): ellipsoidal Transverse Mercator /
  UTM (p. 60-64), ellipsoidal Albers Equal-Area (p. 101-102 — the
  BDC grid's projection), spherical Web Mercator, and geographic
  lon/lat. All vectorized over numpy arrays.
- ``reproject_array`` inverse-maps destination pixel centers through
  dst-CRS → lon/lat → src-CRS, then samples nearest or bilinear with
  nodata handling — the same algorithm GDAL's warper applies per
  block.
- ``warp_scenes`` runs it executor-side: ``mapInPandas`` over decoded
  scene rasters, one warp per (scene, band, target tile), emitting
  tile-grid pixel rows. Scenes are independent → embarrassingly
  parallel; the only shuffle downstream is the mosaic/blend groupBy
  that already exists.

Golden values in tests/test_warp.py are Snyder's own worked examples
(Clarke 1866), so correctness is anchored to the published standard,
not to another library.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# a, 1/f (None = sphere)
_ELLIPSOIDS = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "clrk66": (6378206.4, 294.978698214),
    "sphere": (6378137.0, None),
}


@dataclass(frozen=True)
class CRS:
    proj: str                       # longlat | tmerc | aea | webmerc
    a: float = 6378137.0
    e2: float = 0.0066943799901413165          # WGS84
    params: dict = field(default_factory=dict)

    def __hash__(self):
        return hash((self.proj, self.a, self.e2,
                     tuple(sorted(self.params.items()))))


def _ellps(name: str) -> tuple[float, float]:
    a, rf = _ELLIPSOIDS[name]
    if rf is None:
        return a, 0.0
    f = 1.0 / rf
    return a, f * (2 - f)


def parse_crs(spec) -> CRS:
    """EPSG codes (4326, 3857, 326xx/327xx UTM, 3413/3031 polar
    stereographic, 2154 Lambert-93) or a minimal proj4 string
    (+proj=utm/tmerc/aea/lcc/longlat/webmerc/sinu/stere +ellps=...
    +lat_0=...). Sinusoidal is the MODIS spherical form (the reference
    emits '+proj=sinu +a=6371007.181 +b=6371007.181',
    grids.py:115-116); its radius comes from +R or +a."""
    if isinstance(spec, CRS):
        return spec
    s = str(spec).strip()
    if s.upper().startswith("EPSG:"):
        code = int(s.split(":")[1])
        if code == 4326:
            a, e2 = _ellps("WGS84")
            return CRS("longlat", a, e2)
        if code == 3857:
            return CRS("webmerc", 6378137.0, 0.0)
        if code == 3413:        # NSIDC Sea Ice Polar Stereographic North
            a, e2 = _ellps("WGS84")
            return CRS("stere", a, e2, {
                "lat_0": 90.0, "lat_ts": 70.0, "lon_0": -45.0,
                "x_0": 0.0, "y_0": 0.0})
        if code == 3031:        # Antarctic Polar Stereographic
            a, e2 = _ellps("WGS84")
            return CRS("stere", a, e2, {
                "lat_0": -90.0, "lat_ts": -71.0, "lon_0": 0.0,
                "x_0": 0.0, "y_0": 0.0})
        if code == 2154:        # RGF93 / Lambert-93 (France national)
            a, e2 = _ellps("GRS80")
            return CRS("lcc", a, e2, {
                "lat_0": 46.5, "lon_0": 3.0, "lat_1": 49.0, "lat_2": 44.0,
                "x_0": 700000.0, "y_0": 6600000.0})
        if 32601 <= code <= 32660 or 32701 <= code <= 32760:
            zone = code % 100
            south = code // 100 == 327
            a, e2 = _ellps("WGS84")
            return CRS("tmerc", a, e2, {
                "lon_0": float(zone * 6 - 183), "lat_0": 0.0, "k_0": 0.9996,
                "x_0": 500000.0, "y_0": 10000000.0 if south else 0.0})
        raise ValueError(f"unsupported EPSG:{code}")
    if s.startswith("+"):
        kv = {}
        for tok in s.split():
            tok = tok.lstrip("+")
            k, _, v = tok.partition("=")
            kv[k] = v
        a, e2 = _ellps(kv.get("ellps", "WGS84"))
        proj = kv["proj"]
        if proj == "longlat":
            return CRS("longlat", a, e2)
        if proj == "webmerc":
            return CRS("webmerc", 6378137.0, 0.0)
        if proj == "utm":
            zone = int(kv["zone"])
            return CRS("tmerc", a, e2, {
                "lon_0": float(zone * 6 - 183), "lat_0": 0.0, "k_0": 0.9996,
                "x_0": 500000.0, "y_0": 10000000.0 if "south" in kv else 0.0})
        num = {k: float(v) for k, v in kv.items()
               if k in ("lat_0", "lon_0", "lat_1", "lat_2", "k_0", "x_0", "y_0")}
        if proj == "tmerc":
            return CRS("tmerc", a, e2, {
                "lon_0": num.get("lon_0", 0.0), "lat_0": num.get("lat_0", 0.0),
                "k_0": num.get("k_0", 1.0), "x_0": num.get("x_0", 0.0),
                "y_0": num.get("y_0", 0.0)})
        if proj == "aea":
            return CRS("aea", a, e2, {
                "lat_0": num.get("lat_0", 0.0), "lon_0": num.get("lon_0", 0.0),
                "lat_1": num["lat_1"], "lat_2": num["lat_2"],
                "x_0": num.get("x_0", 0.0), "y_0": num.get("y_0", 0.0)})
        if proj == "lcc":
            # 2SP form (EPSG 9802); +lat_2 defaults to +lat_1 (proj
            # convention), which degenerates to the tangent cone
            return CRS("lcc", a, e2, {
                "lat_0": num.get("lat_0", 0.0), "lon_0": num.get("lon_0", 0.0),
                "lat_1": num["lat_1"], "lat_2": num.get("lat_2", num["lat_1"]),
                "x_0": num.get("x_0", 0.0), "y_0": num.get("y_0", 0.0)})
        if proj == "sinu":
            # spherical sinusoidal (Snyder PP 1395 eq. 30-1/30-2) — the
            # MODIS grid form. Radius from +R or +a (a==b sphere);
            # an ellipsoidal +a/+b pair is not supported.
            R = float(kv.get("R", kv.get("a", 6371007.181)) or 6371007.181)
            b = kv.get("b")
            if b and abs(float(b) - R) > 1e-6:
                raise ValueError(
                    "+proj=sinu supports the spherical form only "
                    f"(a={R} != b={b})")
            return CRS("sinu", R, 0.0, {
                "lon_0": num.get("lon_0", 0.0),
                "x_0": num.get("x_0", 0.0), "y_0": num.get("y_0", 0.0)})
        if proj == "stere":
            # POLAR aspect only (lat_0 = ±90) — the polar-science
            # grids (NSIDC 3413, Antarctic 3031); oblique
            # stereographic still gates on rasterio like any other
            # unsupported family.
            lat0 = num.get("lat_0", 90.0)
            if abs(abs(lat0) - 90.0) > 1e-9:
                raise ValueError(
                    "+proj=stere supports the polar aspect only "
                    f"(lat_0=±90), got lat_0={lat0}")
            p = {"lat_0": lat0, "lon_0": num.get("lon_0", 0.0),
                 "x_0": num.get("x_0", 0.0), "y_0": num.get("y_0", 0.0)}
            if "lat_ts" in kv:
                p["lat_ts"] = float(kv["lat_ts"])
            else:
                p["k_0"] = num.get("k_0", 1.0)
            return CRS("stere", a, e2, p)
        raise ValueError(f"unsupported +proj={proj}")
    raise ValueError(f"cannot parse CRS {spec!r}")


# Snyder meridian arc (3-21) and footpoint latitude (3-26) -------------------

def _meridian_arc(a, e2, phi):
    e4, e6 = e2 * e2, e2 * e2 * e2
    return a * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
                - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
                + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
                - (35 * e6 / 3072) * np.sin(6 * phi))


def _footpoint(a, e2, M):
    mu = M / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 ** 3 / 256))
    e1 = (1 - np.sqrt(1 - e2)) / (1 + np.sqrt(1 - e2))
    return (mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
            + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
            + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
            + (1097 * e1 ** 4 / 512) * np.sin(8 * mu))


def _tmerc_fwd(crs, lon, lat):
    a, e2, p = crs.a, crs.e2, crs.params
    k0, lam0 = p["k_0"], np.radians(p["lon_0"])
    phi, lam = np.radians(lat), np.radians(lon)
    ep2 = e2 / (1 - e2)
    sin, cos, tan = np.sin(phi), np.cos(phi), np.tan(phi)
    N = a / np.sqrt(1 - e2 * sin ** 2)
    T = tan ** 2
    C = ep2 * cos ** 2
    A = (lam - lam0) * cos
    M = _meridian_arc(a, e2, phi)
    M0 = _meridian_arc(a, e2, np.radians(p["lat_0"]))
    x = k0 * N * (A + (1 - T + C) * A ** 3 / 6
                  + (5 - 18 * T + T ** 2 + 72 * C - 58 * ep2) * A ** 5 / 120)
    y = k0 * (M - M0 + N * tan * (A ** 2 / 2
              + (5 - T + 9 * C + 4 * C ** 2) * A ** 4 / 24
              + (61 - 58 * T + T ** 2 + 600 * C - 330 * ep2) * A ** 6 / 720))
    return x + p["x_0"], y + p["y_0"]


def _tmerc_inv(crs, x, y):
    a, e2, p = crs.a, crs.e2, crs.params
    k0, lam0 = p["k_0"], np.radians(p["lon_0"])
    x = np.asarray(x, float) - p["x_0"]
    y = np.asarray(y, float) - p["y_0"]
    ep2 = e2 / (1 - e2)
    M0 = _meridian_arc(a, e2, np.radians(p["lat_0"]))
    phi1 = _footpoint(a, e2, M0 + y / k0)
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    C1 = ep2 * cos1 ** 2
    T1 = tan1 ** 2
    N1 = a / np.sqrt(1 - e2 * sin1 ** 2)
    R1 = a * (1 - e2) / (1 - e2 * sin1 ** 2) ** 1.5
    D = x / (N1 * k0)
    phi = phi1 - (N1 * tan1 / R1) * (
        D ** 2 / 2
        - (5 + 3 * T1 + 10 * C1 - 4 * C1 ** 2 - 9 * ep2) * D ** 4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1 ** 2 - 252 * ep2
           - 3 * C1 ** 2) * D ** 6 / 720)
    lam = lam0 + (D - (1 + 2 * T1 + C1) * D ** 3 / 6
                  + (5 - 2 * C1 + 28 * T1 - 3 * C1 ** 2 + 8 * ep2
                     + 24 * T1 ** 2) * D ** 5 / 120) / cos1
    return np.degrees(lam), np.degrees(phi)


def _newton_refine(fwd, crs, x, y, lon, lat, eps=1e-7):
    """One vectorized Newton step against the EXACT forward map.

    Snyder's truncated inverse series leave ~1e-8 deg of error 4 deg
    from a tmerc central meridian; a single Newton iteration with a
    finite-difference Jacobian closes that to ~1e-12 deg (the residual
    is already tiny, so one step is quadratic overkill). Costs three
    extra forward evaluations — numpy-vectorized, negligible against
    the per-block resample work in the warp hot path."""
    X, Y = fwd(crs, lon, lat)
    Xl, Yl = fwd(crs, lon + eps, lat)
    Xp, Yp = fwd(crs, lon, lat + eps)
    j11, j21 = (Xl - X) / eps, (Yl - Y) / eps
    j12, j22 = (Xp - X) / eps, (Yp - Y) / eps
    det = j11 * j22 - j12 * j21
    rx, ry = np.asarray(x, float) - X, np.asarray(y, float) - Y
    with np.errstate(divide="ignore", invalid="ignore"):
        dlon = np.where(det != 0, (j22 * rx - j12 * ry) / det, 0.0)
        dlat = np.where(det != 0, (-j21 * rx + j11 * ry) / det, 0.0)
    return lon + dlon, lat + dlat


# Albers equal-area, ellipsoidal (Snyder 14-12..14-21) -----------------------

def _aea_qm(e2, phi):
    e = np.sqrt(e2)
    sin = np.sin(phi)
    q = (1 - e2) * (sin / (1 - e2 * sin ** 2)
                    - (1 / (2 * e)) * np.log((1 - e * sin) / (1 + e * sin)))
    m = np.cos(phi) / np.sqrt(1 - e2 * sin ** 2)
    return q, m


def _aea_consts(crs):
    e2, p = crs.e2, crs.params
    phi0, phi1, phi2 = (np.radians(p["lat_0"]), np.radians(p["lat_1"]),
                        np.radians(p["lat_2"]))
    q0, _ = _aea_qm(e2, phi0)
    q1, m1 = _aea_qm(e2, phi1)
    q2, m2 = _aea_qm(e2, phi2)
    n = (m1 ** 2 - m2 ** 2) / (q2 - q1) if phi1 != phi2 else np.sin(phi1)
    C = m1 ** 2 + n * q1
    rho0 = crs.a * np.sqrt(C - n * q0) / n
    return n, C, rho0


def _aea_fwd(crs, lon, lat):
    p = crs.params
    n, C, rho0 = _aea_consts(crs)
    q, _ = _aea_qm(crs.e2, np.radians(lat))
    rho = crs.a * np.sqrt(C - n * q) / n
    theta = n * (np.radians(lon) - np.radians(p["lon_0"]))
    return (rho * np.sin(theta) + p["x_0"],
            rho0 - rho * np.cos(theta) + p["y_0"])


def _aea_inv(crs, x, y):
    a, e2, p = crs.a, crs.e2, crs.params
    n, C, rho0 = _aea_consts(crs)
    x = np.asarray(x, float) - p["x_0"]
    y = np.asarray(y, float) - p["y_0"]
    rho = np.hypot(x, rho0 - y)
    theta = np.arctan2(np.sign(n) * x, np.sign(n) * (rho0 - y))
    q = (C - (rho * n / a) ** 2) / n
    e = np.sqrt(e2)
    # Snyder 3-16 iteration for phi from q
    phi = np.arcsin(np.clip(q / 2, -1, 1))
    for _ in range(6):
        sin = np.sin(phi)
        phi = phi + ((1 - e2 * sin ** 2) ** 2 / (2 * np.cos(phi))) * (
            q / (1 - e2) - sin / (1 - e2 * sin ** 2)
            + (1 / (2 * e)) * np.log((1 - e * sin) / (1 + e * sin)))
    lam = np.radians(p["lon_0"]) + theta / n
    return np.degrees(lam), np.degrees(phi)


# Polar stereographic (Snyder 21-33..21-41, ellipsoidal) --------------------

def _stere_t(e, phi):
    """Snyder 15-9: the isometric-latitude half-angle function."""
    es = e * np.sin(phi)
    return np.tan(np.pi / 4 - phi / 2) * ((1 + es) / (1 - es)) ** (e / 2)


def _stere_rho_scale(crs):
    """ρ = scale · t for the north-aspect core: either the standard-
    parallel form (a·m_c/t_c, Snyder 21-34) or the k_0 form
    (2·a·k0/√((1+e)^(1+e)(1−e)^(1−e)), Snyder 21-33)."""
    e = np.sqrt(crs.e2)
    p = crs.params
    if "lat_ts" in p:
        phic = np.radians(abs(p["lat_ts"]))
        mc = np.cos(phic) / np.sqrt(1 - crs.e2 * np.sin(phic) ** 2)
        return crs.a * mc / _stere_t(e, phic)
    k0 = p.get("k_0", 1.0)
    return 2 * crs.a * k0 / np.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))


def _stere_fwd(crs, lon, lat):
    """Polar aspect: the south pole solves through the north-aspect
    core with (φ, Δλ) negated and the axes flipped back — the proj
    convention (south: x = ρ·sinΔλ, y = +ρ·cosΔλ)."""
    p = crs.params
    s = 1.0 if p["lat_0"] > 0 else -1.0
    e = np.sqrt(crs.e2)
    phi = s * np.radians(lat)
    dlam = s * np.radians(lon - p["lon_0"])
    rho = _stere_rho_scale(crs) * _stere_t(e, phi)
    return (s * rho * np.sin(dlam) + p["x_0"],
            s * -rho * np.cos(dlam) + p["y_0"])


def _stere_inv(crs, x, y):
    p = crs.params
    s = 1.0 if p["lat_0"] > 0 else -1.0
    e = np.sqrt(crs.e2)
    xs = s * (np.asarray(x, float) - p["x_0"])
    ys = s * (np.asarray(y, float) - p["y_0"])
    rho = np.hypot(xs, ys)
    t = rho / _stere_rho_scale(crs)
    # Snyder 7-9 fixed-point for φ from t — 4 rounds reach float64
    # resolution for |e| of any geodetic ellipsoid
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(4):
        es = e * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(t * ((1 - es) / (1 + es)) ** (e / 2))
    dlam = np.arctan2(xs, -ys)
    # at the pole (ρ=0) every λ maps to the pole — pin λ0
    dlam = np.where(rho > 1e-12, dlam, 0.0)
    return (np.degrees(np.radians(p["lon_0"]) + s * dlam),
            np.degrees(s * phi))


# Lambert Conformal Conic, 2SP ellipsoidal (Snyder 14-1..14-4,
# 15-1..15-11; EPSG method 9802) --------------------------------------------

def _lcc_consts(crs):
    """n (cone constant), F, ρ0 per Snyder 15-8/15-10/15-7a. Shares
    the isometric-latitude half-angle t(φ) with polar stereographic
    (_stere_t is Snyder 15-9 verbatim). Equal standard parallels
    degenerate to the tangent cone: n = sin φ1 (Snyder p. 107)."""
    e = np.sqrt(crs.e2)
    p = crs.params
    phi0 = np.radians(p["lat_0"])
    phi1 = np.radians(p["lat_1"])
    phi2 = np.radians(p["lat_2"])

    def m(phi):
        return np.cos(phi) / np.sqrt(1 - crs.e2 * np.sin(phi) ** 2)

    t0, t1, t2 = (_stere_t(e, phi0), _stere_t(e, phi1), _stere_t(e, phi2))
    if abs(phi1 - phi2) > 1e-12:
        n = (np.log(m(phi1)) - np.log(m(phi2))) / (np.log(t1) - np.log(t2))
    else:
        n = np.sin(phi1)
    Fc = m(phi1) / (n * t1 ** n)
    rho0 = crs.a * Fc * t0 ** n
    return n, Fc, rho0


def _lcc_fwd(crs, lon, lat):
    p = crs.params
    e = np.sqrt(crs.e2)
    n, Fc, rho0 = _lcc_consts(crs)
    t = _stere_t(e, np.radians(lat))
    rho = crs.a * Fc * t ** n                       # Snyder 15-7
    theta = n * np.radians(np.asarray(lon, float) - p["lon_0"])  # 14-4
    return (rho * np.sin(theta) + p["x_0"],         # 14-1
            rho0 - rho * np.cos(theta) + p["y_0"])  # 14-2


def _lcc_inv(crs, x, y):
    p = crs.params
    e = np.sqrt(crs.e2)
    n, Fc, rho0 = _lcc_consts(crs)
    xs = np.asarray(x, float) - p["x_0"]
    ys = rho0 - (np.asarray(y, float) - p["y_0"])
    # sign(n) folds the south-aspect cone through the north core, the
    # same trick as _aea_inv (Snyder 14-10/14-11 note)
    rho = np.sign(n) * np.hypot(xs, ys)
    theta = np.arctan2(np.sign(n) * xs, np.sign(n) * ys)
    t = (rho / (crs.a * Fc)) ** (1.0 / n)           # 15-11
    # Snyder 7-9 fixed-point for φ from t (shared with _stere_inv)
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(4):
        es = e * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(t * ((1 - es) / (1 + es)) ** (e / 2))
    lam = np.radians(p["lon_0"]) + theta / n        # 14-9
    return np.degrees(lam), np.degrees(phi)


def forward(crs, lon, lat):
    """(lon, lat) degrees → projected (x, y). Vectorized."""
    crs = parse_crs(crs)
    lon, lat = np.asarray(lon, float), np.asarray(lat, float)
    if crs.proj == "longlat":
        return lon, lat
    if crs.proj == "webmerc":
        R = crs.a
        return (R * np.radians(lon),
                R * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2)))
    if crs.proj == "tmerc":
        return _tmerc_fwd(crs, lon, lat)
    if crs.proj == "aea":
        return _aea_fwd(crs, lon, lat)
    if crs.proj == "lcc":
        return _lcc_fwd(crs, lon, lat)
    if crs.proj == "stere":
        return _stere_fwd(crs, lon, lat)
    if crs.proj == "sinu":
        # Snyder 30-1, 30-2: x = R(λ−λ0)cosφ, y = Rφ
        R, p = crs.a, crs.params
        phi = np.radians(lat)
        return (R * (np.radians(lon) - np.radians(p["lon_0"]))
                * np.cos(phi) + p["x_0"],
                R * phi + p["y_0"])
    raise ValueError(crs.proj)


def inverse(crs, x, y):
    """Projected (x, y) → (lon, lat) degrees. Vectorized.

    Longitudes are normalized to [−180, 180): conic/azimuthal
    λ = λ0 + θ/n assembly can land past the antimeridian when λ0 is
    far from Greenwich (e.g. EPSG:3413's λ0 = −45 inverting a point
    at 136°E), and the wrapped angle is the same meridian. An
    in-range longitude (−180 included) passes through bit-exact;
    longlat stays a strict identity."""
    lon, lat = _inverse_core(crs, x, y)
    if parse_crs(crs).proj != "longlat":
        v = np.asarray(lon, float)
        w = np.mod(v + 180.0, 360.0) - 180.0
        # np.mod can round its result up to the modulus itself when
        # the operand is a tiny negative (mod(-3e-14, 360) == 360.0
        # at float64 spacing) — fold the escaped boundary back
        w = np.where(w >= 180.0, w - 360.0, w)
        lon = np.where((v >= -180.0) & (v < 180.0), v, w)
    return lon, lat


def _inverse_core(crs, x, y):
    crs = parse_crs(crs)
    x, y = np.asarray(x, float), np.asarray(y, float)
    if crs.proj == "longlat":
        return x, y
    if crs.proj == "webmerc":
        R = crs.a
        return (np.degrees(x / R),
                np.degrees(2 * np.arctan(np.exp(y / R)) - np.pi / 2))
    if crs.proj == "tmerc":
        lon, lat = _tmerc_inv(crs, x, y)
        return _newton_refine(_tmerc_fwd, crs, x, y, lon, lat)
    if crs.proj == "aea":
        return _aea_inv(crs, x, y)
    if crs.proj == "lcc":
        return _lcc_inv(crs, x, y)
    if crs.proj == "stere":
        return _stere_inv(crs, x, y)
    if crs.proj == "sinu":
        # Snyder 30-6, 30-7: φ = y/R, λ = λ0 + x/(R cosφ); at the
        # poles cosφ → 0 and every λ maps to the same point — pin λ0
        R, p = crs.a, crs.params
        phi = (y - p["y_0"]) / R
        cos = np.cos(phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            dlam = np.where(np.abs(cos) > 1e-12,
                            (x - p["x_0"]) / (R * cos), 0.0)
        return (np.degrees(np.radians(p["lon_0"]) + dlam),
                np.degrees(phi))
    raise ValueError(crs.proj)


def transform_points(src_crs, dst_crs, x, y):
    """src projected coords → dst projected coords (via lon/lat)."""
    src, dst = parse_crs(src_crs), parse_crs(dst_crs)
    if src == dst:
        return np.asarray(x, float), np.asarray(y, float)
    lon, lat = inverse(src, x, y)
    return forward(dst, lon, lat)


# Affine + reproject ---------------------------------------------------------

@dataclass(frozen=True)
class Affine:
    """GDAL-style affine: (x, y) = (a*col + b*row + c, d*col + e*row + f)."""
    a: float
    b: float
    c: float
    d: float
    e: float
    f: float

    @staticmethod
    def from_origin(west: float, north: float, xres: float, yres: float):
        return Affine(xres, 0.0, west, 0.0, -yres, north)

    def apply(self, col, row):
        return (self.a * col + self.b * row + self.c,
                self.d * col + self.e * row + self.f)

    def invert(self) -> "Affine":
        det = self.a * self.e - self.b * self.d
        ia, ib, id_, ie = self.e / det, -self.b / det, -self.d / det, self.a / det
        return Affine(ia, ib, -(ia * self.c + ib * self.f),
                      id_, ie, -(id_ * self.c + ie * self.f))


def reproject_array(source: np.ndarray, src_transform: Affine, src_crs,
                    dst_shape: tuple[int, int], dst_transform: Affine,
                    dst_crs, src_nodata=None, dst_nodata=0,
                    resampling: str = "nearest") -> np.ndarray:
    """The rasterio.warp.reproject contract on numpy: inverse-map dst
    pixel centers to source pixel space, sample nearest or bilinear."""
    h, w = dst_shape
    rows, cols = np.meshgrid(np.arange(h, dtype=float),
                             np.arange(w, dtype=float), indexing="ij")
    dx, dy = dst_transform.apply(cols + 0.5, rows + 0.5)
    sx, sy = transform_points(dst_crs, src_crs, dx, dy)
    inv = src_transform.invert()
    scol, srow = inv.apply(sx, sy)
    scolf, srowf = scol - 0.5, srow - 0.5      # center-based index

    sh, sw = source.shape
    out = np.full(dst_shape, dst_nodata, dtype=source.dtype)
    if resampling == "nearest":
        ci = np.rint(scolf).astype(np.int64)
        ri = np.rint(srowf).astype(np.int64)
        ok = (ci >= 0) & (ci < sw) & (ri >= 0) & (ri < sh)
        vals = source[ri[ok], ci[ok]]
        if src_nodata is not None:
            vals = np.where(vals == src_nodata, dst_nodata, vals)
        out[ok] = vals
        return out
    if resampling != "bilinear":
        raise ValueError(f"unsupported resampling {resampling!r}")

    c0 = np.floor(scolf).astype(np.int64)
    r0 = np.floor(srowf).astype(np.int64)
    fc, fr = scolf - c0, srowf - r0
    acc = np.zeros(dst_shape, float)
    wacc = np.zeros(dst_shape, float)
    for dr_, dc_ in ((0, 0), (0, 1), (1, 0), (1, 1)):
        ri, ci = r0 + dr_, c0 + dc_
        wgt = ((fr if dr_ else 1 - fr) * (fc if dc_ else 1 - fc))
        ok = (ci >= 0) & (ci < sw) & (ri >= 0) & (ri < sh) & (wgt > 0)
        v = source[ri[ok], ci[ok]].astype(float)
        if src_nodata is not None:
            good = v != src_nodata
            idx = np.nonzero(ok)
            idx = tuple(i[good] for i in idx)
            acc[idx] += wgt[idx] * v[good]
            wacc[idx] += wgt[idx]
        else:
            acc[ok] += wgt[ok] * v
            wacc[ok] += wgt[ok]
    good = wacc > 1e-12
    out = np.full(dst_shape, dst_nodata, dtype=source.dtype)
    res = acc[good] / wacc[good]
    if np.issubdtype(source.dtype, np.integer):
        res = np.rint(res)
    out[good] = res.astype(source.dtype)
    return out


# Spark operator -------------------------------------------------------------

def warp_scenes(files: DataFrame, tiles: list[dict], dst_crs,
                src_crs, resampling: str = "nearest",
                nodata: int = -9999,
                extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Executor-side warp (processing.py:303-316 as mapInPandas): each
    input row is a stdlib-GeoTIFF scene (binaryFile ``content`` +
    passthrough columns); each output row a destination-grid pixel.

    ``tiles``: list of {tile_id, west, north, width, height, res} in
    ``dst_crs`` — the grid definition (C18), broadcast as a plain
    closure (tiny). A scene is warped once per *overlapping* tile
    (corner bbox test in dst space), so disjoint (scene, tile) pairs
    cost nothing. All heavy math is vectorized numpy inside the Arrow
    batch; no shuffle here at all."""
    from ..sinks.cog import read_geotiff_band

    dst_crs_p, src_crs_p = parse_crs(dst_crs), parse_crs(src_crs)
    extra_cols = list(extra_cols)

    def scene_bbox_dst(got, n_edge: int = 21):
        """Dst-space bbox of the scene OUTLINE, densified: projected
        edges are curved, so corners alone under-cover — a tile that
        overlaps only a bowed edge (no corner inside) would be
        silently skipped. Sampling n_edge points per edge bounds the
        sagitta error far below one pixel for any sane scene size."""
        ph, pw = got["array"].shape
        xres, yres = got["pixel_size"]
        west, north = got["origin"]
        t = np.linspace(0.0, 1.0, n_edge)
        cols = np.concatenate([t * pw, np.full_like(t, pw), (1 - t) * pw,
                               np.zeros_like(t)])
        rows = np.concatenate([np.zeros_like(t), t * ph, np.full_like(t, ph),
                               (1 - t) * ph])
        xs = cols * xres + west
        ys = north - rows * yres
        dxs, dys = transform_points(src_crs_p, dst_crs_p, xs, ys)
        return dxs.min(), dxs.max(), dys.min(), dys.max()

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for i in range(len(pdf)):
                got = read_geotiff_band(bytes(pdf["content"].iloc[i]))
                xmin, xmax, ymin, ymax = scene_bbox_dst(got)
                src_tr = Affine.from_origin(got["origin"][0], got["origin"][1],
                                            got["pixel_size"][0],
                                            got["pixel_size"][1])
                src_nd = got.get("nodata")
                for t in tiles:
                    te = t["west"] + t["width"] * t["res"]
                    ts = t["north"] - t["height"] * t["res"]
                    if t["west"] > xmax or te < xmin or ts > ymax or t["north"] < ymin:
                        continue
                    dst_tr = Affine.from_origin(t["west"], t["north"],
                                                t["res"], t["res"])
                    arr = reproject_array(
                        got["array"], src_tr, src_crs_p,
                        (t["height"], t["width"]), dst_tr, dst_crs_p,
                        src_nodata=src_nd, dst_nodata=nodata,
                        resampling=resampling)
                    flat = arr.reshape(-1)
                    keep = np.nonzero(flat != nodata)[0]
                    if not len(keep):
                        continue
                    f = {"tile_id": np.full(len(keep), t["tile_id"], np.int64),
                         "pixel_id": keep.astype(np.int64),
                         "value": flat[keep].astype(np.int64)}
                    for c in extra_cols:
                        f[c] = [pdf[c].iloc[i]] * len(keep)
                    frames.append(pd.DataFrame(f))
            cols = ["tile_id", "pixel_id", "value"] + extra_cols
            yield (pd.concat(frames, ignore_index=True) if frames
                   else pd.DataFrame({c: [] for c in cols}))

    schema = ("tile_id long, pixel_id long, value long"
              + "".join(f", {c} string" for c in extra_cols))
    return files.mapInPandas(work, schema)
