"""CRS transforms in pure numpy: UTM (Transverse Mercator, GRS80) <-> WGS84
geographic, with the Krüger/Karney series expansion (standard public
formulas, accurate to < 1e-9 degrees / < 0.1 mm within a UTM zone).

Reference parity: ssb-sgis rides pyproj CRS objects on every frame and
raises on binary-op mismatch (`overlay.py:109-110`, `neighbors.py:111-112`);
EPSG:25833 (UTM zone 33N, GRS80) is the blessed planar CRS
(`bounds.py:519-523`).  Here: vectorized coordinate kernels + a light crs
tag carried by the engine (sgspark.crs module).
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid (EPSG:25833 datum ETRS89; WGS84 differs < 1e-9 here)
_A = 6378137.0
_F = 1 / 298.257222101
_K0 = 0.9996
_FE = 500000.0  # false easting

_N = _F / (2 - _F)
# Karney's alpha / beta series coefficients (order 6)
_ALPHA = np.array([
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180,
    13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440,
    61 * _N**3 / 240 - 103 * _N**4 / 140,
    49561 * _N**4 / 161280])
_BETA = np.array([
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - 1 * _N**4 / 360,
    _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440,
    17 * _N**3 / 480 - 37 * _N**4 / 840,
    4397 * _N**4 / 161280])
_A_HAT = _A / (1 + _N) * (1 + _N**2 / 4 + _N**4 / 64)
_E = np.sqrt(_F * (2 - _F))


def wgs84_to_utm(lon: np.ndarray, lat: np.ndarray, zone: int = 33
                 ) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) degrees -> (easting, northing) meters, UTM `zone` north."""
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lon0 = np.radians(zone * 6.0 - 183.0)
    # conformal latitude
    t = np.sinh(np.arctanh(np.sin(lat))
                - _E * np.arctanh(_E * np.sin(lat)))
    xi_p = np.arctan2(t, np.cos(lon - lon0))
    eta_p = np.arctanh(np.sin(lon - lon0) / np.sqrt(1 + t * t))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(4):
        xi += _ALPHA[j] * np.sin(2 * (j + 1) * xi_p) \
            * np.cosh(2 * (j + 1) * eta_p)
        eta += _ALPHA[j] * np.cos(2 * (j + 1) * xi_p) \
            * np.sinh(2 * (j + 1) * eta_p)
    return _FE + _K0 * _A_HAT * eta, _K0 * _A_HAT * xi


def utm_to_wgs84(x: np.ndarray, y: np.ndarray, zone: int = 33
                 ) -> tuple[np.ndarray, np.ndarray]:
    """(easting, northing) meters UTM north -> (lon, lat) degrees."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon0 = np.radians(zone * 6.0 - 183.0)
    xi = y / (_K0 * _A_HAT)
    eta = (x - _FE) / (_K0 * _A_HAT)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(4):
        xi_p -= _BETA[j] * np.sin(2 * (j + 1) * xi) \
            * np.cosh(2 * (j + 1) * eta)
        eta_p -= _BETA[j] * np.cos(2 * (j + 1) * xi) \
            * np.sinh(2 * (j + 1) * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    # fixed-point iteration from conformal latitude:
    #   lat <- arcsin(tanh(artanh(sin(chi)) + e * artanh(e * sin(lat))))
    lat = chi.copy()
    s_chi = np.arctanh(np.sin(chi))
    for _ in range(8):
        lat = np.arcsin(np.clip(np.tanh(
            s_chi + _E * np.arctanh(_E * np.sin(lat))), -1, 1))
    lon = lon0 + np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lon), np.degrees(lat)
