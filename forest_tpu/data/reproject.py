"""Pure-numpy reprojection/regridding (no GDAL/pyproj in this image).

The reference aligns sources to a template grid with
``/root/reference/utils/rasterio.py:158-201`` (``needs_reprojection`` +
``align_to_template`` via ``rio.reproject_match``). This module carries
that contract for the CRS family the project actually uses (WGS84
geographic EPSG:4326 and WGS84/UTM EPSG:326xx/327xx — all GEE exports and
NAIP tiles are one of these):

- ``TransverseMercator``: Karney's Krueger-series transverse Mercator to
  n^6 (nanometre-level for in-zone use), WGS84 ellipsoid, vectorized.
- ``transform_coords(src_epsg, dst_epsg, x, y)``: identity, UTM <-> 4326,
  and UTM <-> UTM (through geographic).
- ``align_to_grid(raster, dst_transform, dst_shape, ...)``: sample the
  destination pixel centers in the source (nearest or NaN-propagating
  bilinear), the pure-numpy equivalent of ``reproject_match``.
- ``needs_reprojection``: grid/CRS equality test mirroring
  rasterio.py:158-177.

Accuracy is pinned by tests/test_reproject.py: series-vs-numerically-
integrated meridian arc, conformality of the numerical Jacobian, central
meridian invariants (E=500 km, k0=0.9996), and sub-nanometre roundtrips.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_E = np.sqrt(_E2)
_K0 = 0.9996
_FALSE_E = 500000.0
_FALSE_N_SOUTH = 10000000.0

# Krueger series in n = f / (2 - f), to n^6 (Karney 2011, eqs. 12/35-36).
_N = _F / (2.0 - _F)
_A_BAR = _A / (1.0 + _N) * (1.0 + _N ** 2 / 4.0 + _N ** 4 / 64.0
                            + _N ** 6 / 256.0)
_ALPHA = np.array([
    _N / 2.0 - 2.0 / 3.0 * _N ** 2 + 5.0 / 16.0 * _N ** 3
    + 41.0 / 180.0 * _N ** 4 - 127.0 / 288.0 * _N ** 5
    + 7891.0 / 37800.0 * _N ** 6,
    13.0 / 48.0 * _N ** 2 - 3.0 / 5.0 * _N ** 3 + 557.0 / 1440.0 * _N ** 4
    + 281.0 / 630.0 * _N ** 5 - 1983433.0 / 1935360.0 * _N ** 6,
    61.0 / 240.0 * _N ** 3 - 103.0 / 140.0 * _N ** 4
    + 15061.0 / 26880.0 * _N ** 5 + 167603.0 / 181440.0 * _N ** 6,
    49561.0 / 161280.0 * _N ** 4 - 179.0 / 168.0 * _N ** 5
    + 6601661.0 / 7257600.0 * _N ** 6,
    34729.0 / 80640.0 * _N ** 5 - 3418889.0 / 1995840.0 * _N ** 6,
    212378941.0 / 319334400.0 * _N ** 6,
])
_BETA = np.array([
    _N / 2.0 - 2.0 / 3.0 * _N ** 2 + 37.0 / 96.0 * _N ** 3
    - 1.0 / 360.0 * _N ** 4 - 81.0 / 512.0 * _N ** 5
    + 96199.0 / 604800.0 * _N ** 6,
    1.0 / 48.0 * _N ** 2 + 1.0 / 15.0 * _N ** 3 - 437.0 / 1440.0 * _N ** 4
    + 46.0 / 105.0 * _N ** 5 - 1118711.0 / 3870720.0 * _N ** 6,
    17.0 / 480.0 * _N ** 3 - 37.0 / 840.0 * _N ** 4
    - 209.0 / 4480.0 * _N ** 5 + 5569.0 / 90720.0 * _N ** 6,
    4397.0 / 161280.0 * _N ** 4 - 11.0 / 504.0 * _N ** 5
    - 830251.0 / 7257600.0 * _N ** 6,
    4583.0 / 161280.0 * _N ** 5 - 108847.0 / 3991680.0 * _N ** 6,
    20648693.0 / 638668800.0 * _N ** 6,
])
_J = np.arange(1, 7, dtype=np.float64)


def utm_zone_epsg(zone: int, northern: bool) -> int:
    if not 1 <= zone <= 60:
        raise ValueError(f"UTM zone {zone} out of range 1..60")
    return (32600 if northern else 32700) + zone


def _parse_utm_epsg(epsg: int) -> Tuple[int, bool]:
    """EPSG 326xx/327xx -> (zone, northern)."""
    if 32601 <= epsg <= 32660:
        return epsg - 32600, True
    if 32701 <= epsg <= 32760:
        return epsg - 32700, False
    raise ValueError(f"EPSG:{epsg} is not WGS84/UTM (326xx/327xx) — only "
                     "UTM and EPSG:4326 are supported in this image "
                     "(no pyproj)")


class TransverseMercator:
    """WGS84 transverse Mercator at ``lon0`` with scale ``k0``."""

    def __init__(self, lon0_deg: float, k0: float = _K0,
                 false_easting: float = _FALSE_E,
                 false_northing: float = 0.0):
        self.lon0 = np.deg2rad(lon0_deg)
        self.k0 = float(k0)
        self.fe = float(false_easting)
        self.fn = float(false_northing)

    def forward(self, lon_deg, lat_deg) -> Tuple[np.ndarray, np.ndarray]:
        """(lon, lat) degrees -> (easting, northing) meters."""
        lon = np.deg2rad(np.asarray(lon_deg, np.float64)) - self.lon0
        lat = np.deg2rad(np.asarray(lat_deg, np.float64))
        sphi = np.sin(lat)
        # conformal latitude tangent
        t = np.sinh(np.arctanh(sphi) - _E * np.arctanh(_E * sphi))
        xi_p = np.arctan2(t, np.cos(lon))
        eta_p = np.arcsinh(np.sin(lon) / np.hypot(t, np.cos(lon)))
        two_j_xi = 2.0 * _J * xi_p[..., None]
        two_j_eta = 2.0 * _J * eta_p[..., None]
        xi = xi_p + np.sum(_ALPHA * np.sin(two_j_xi) * np.cosh(two_j_eta),
                           axis=-1)
        eta = eta_p + np.sum(_ALPHA * np.cos(two_j_xi) * np.sinh(two_j_eta),
                             axis=-1)
        e_ = self.fe + self.k0 * _A_BAR * eta
        n_ = self.fn + self.k0 * _A_BAR * xi
        return e_, n_

    def inverse(self, easting, northing) -> Tuple[np.ndarray, np.ndarray]:
        """(easting, northing) meters -> (lon, lat) degrees."""
        eta = (np.asarray(easting, np.float64) - self.fe) \
            / (self.k0 * _A_BAR)
        xi = (np.asarray(northing, np.float64) - self.fn) \
            / (self.k0 * _A_BAR)
        two_j_xi = 2.0 * _J * xi[..., None]
        two_j_eta = 2.0 * _J * eta[..., None]
        xi_p = xi - np.sum(_BETA * np.sin(two_j_xi) * np.cosh(two_j_eta),
                           axis=-1)
        eta_p = eta - np.sum(_BETA * np.cos(two_j_xi) * np.sinh(two_j_eta),
                             axis=-1)
        t_p = np.sin(xi_p) / np.hypot(np.sinh(eta_p), np.cos(xi_p))
        lon = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        # geodetic from conformal latitude: Newton on the isometric
        # latitude psi(phi) = atanh(sin phi) - e atanh(e sin phi)
        psi = np.arcsinh(t_p)
        phi = np.arctan(t_p)
        for _ in range(5):
            s = np.sin(phi)
            f = np.arctanh(s) - _E * np.arctanh(_E * s) - psi
            dpsi = (1.0 - _E2) / (np.cos(phi) * (1.0 - _E2 * s * s))
            phi = phi - f / dpsi
        return (np.rad2deg(lon + self.lon0), np.rad2deg(phi))


def _utm_projector(epsg: int) -> TransverseMercator:
    zone, northern = _parse_utm_epsg(epsg)
    return TransverseMercator(
        lon0_deg=-183.0 + 6.0 * zone,
        false_northing=0.0 if northern else _FALSE_N_SOUTH)


def transform_coords(src_epsg: int, dst_epsg: int, x, y
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized coordinate transform between supported CRSs.

    Supported: EPSG:4326 (x=lon, y=lat) and WGS84/UTM 326xx/327xx,
    in any combination (UTM->UTM goes through geographic).
    """
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if src_epsg == dst_epsg:
        return x, y
    if src_epsg == 4326:
        lon, lat = x, y
    else:
        lon, lat = _utm_projector(src_epsg).inverse(x, y)
    if dst_epsg == 4326:
        return lon, lat
    return _utm_projector(dst_epsg).forward(lon, lat)


# ---------------------------------------------------------------------
# Grid alignment (rasterio.py:158-201 contract)
# ---------------------------------------------------------------------
def needs_reprojection(src_transform: Sequence[float],
                       dst_transform: Sequence[float],
                       src_epsg: Optional[int] = None,
                       dst_epsg: Optional[int] = None, *,
                       atol: float = 1e-9) -> bool:
    """True if CRS or affine grid differ (rasterio.needs_reprojection)."""
    if src_epsg is not None and dst_epsg is not None \
            and src_epsg != dst_epsg:
        return True
    # one-sided/absent EPSG: same CRS assumed (the GDAL convention);
    # align_to_grid still rejects flagrant degree/meter mixtures.
    return not np.allclose(np.asarray(src_transform, np.float64),
                           np.asarray(dst_transform, np.float64),
                           atol=atol)


def _sample(data: np.ndarray, rows: np.ndarray, cols: np.ndarray,
            method: str) -> np.ndarray:
    """NaN-outside sampling of [H, W(, C)] at fractional pixel coords."""
    H, W = data.shape[:2]
    out_shape = rows.shape + data.shape[2:]
    flat = data.reshape(H, W, -1).astype(np.float64)
    if method == "nearest":
        r = np.round(rows).astype(np.int64)
        c = np.round(cols).astype(np.int64)
        ok = (r >= 0) & (r < H) & (c >= 0) & (c < W)
        vals = np.full(rows.shape + (flat.shape[-1],), np.nan)
        vals[ok] = flat[r[ok], c[ok]]
        return vals.reshape(out_shape)
    if method != "bilinear":
        raise ValueError(f"Unsupported resampling mode: {method!r}")
    # valid anywhere inside the data support [0, H-1] x [0, W-1],
    # INCLUSIVE: a point landing exactly on the last row/col gets that
    # row/col exactly (fr/fc = 1 against a clamped base index).
    ok = (rows >= 0) & (rows <= H - 1) & (cols >= 0) & (cols <= W - 1)
    rs = np.clip(np.floor(rows).astype(np.int64), 0, max(H - 2, 0))
    cs = np.clip(np.floor(cols).astype(np.int64), 0, max(W - 2, 0))
    fr = (rows - rs)[..., None]
    fc = (cols - cs)[..., None]
    r1 = np.minimum(rs + 1, H - 1)
    c1 = np.minimum(cs + 1, W - 1)
    v00 = flat[rs, cs]
    v01 = flat[rs, c1]
    v10 = flat[r1, cs]
    v11 = flat[r1, c1]
    vals = (v00 * (1 - fr) * (1 - fc) + v01 * (1 - fr) * fc
            + v10 * fr * (1 - fc) + v11 * fr * fc)
    vals[~ok] = np.nan
    return vals.reshape(out_shape)


def align_to_grid(data: np.ndarray,
                  src_transform: Sequence[float],
                  dst_transform: Sequence[float],
                  dst_shape: Tuple[int, int], *,
                  src_epsg: Optional[int] = None,
                  dst_epsg: Optional[int] = None,
                  resampling: str = "nearest",
                  nodata: Optional[float] = None) -> np.ndarray:
    """Resample ``data`` onto the destination grid (reproject_match).

    ``data`` [H, W] or [H, W, C]; transforms are the cube convention
    (x0, dx, y0, dy). Destination pixel centers are mapped into the
    source CRS (when EPSGs are given and differ) and sampled with
    ``nearest`` or NaN-propagating ``bilinear``. Outside-source and
    nodata pixels come back NaN — the caller owns the dtype/fill mapping,
    like the builder does for GeoTIFF sources.
    """
    data = np.asarray(data)
    if nodata is not None:
        data = np.where(data == np.asarray(nodata, data.dtype),
                        np.nan, np.asarray(data, np.float64))
    dh, dw = int(dst_shape[0]), int(dst_shape[1])
    dx0, ddx, dy0, ddy = [float(v) for v in dst_transform]
    sx0, sdx, sy0, sdy = [float(v) for v in src_transform]
    cols = dx0 + (np.arange(dw, dtype=np.float64) + 0.5) * ddx
    rows = dy0 + (np.arange(dh, dtype=np.float64) + 0.5) * ddy
    xg, yg = np.meshgrid(cols, rows)
    if src_epsg is not None and dst_epsg is not None \
            and src_epsg != dst_epsg:
        xg, yg = transform_coords(dst_epsg, src_epsg, xg, yg)
    else:
        # Same CRS assumed (possibly because one side lacks an EPSG tag).
        # Catch the flagrant degree-vs-meter mixture that would otherwise
        # sample nothing and silently write a NaN band.
        ratio = abs(ddx) / abs(sdx)
        if ratio > 1e3 or ratio < 1e-3:
            raise ValueError(
                f"source pixel size {sdx} vs destination {ddx} differ by "
                f">1000x with no usable CRS pair (src_epsg={src_epsg}, "
                f"dst_epsg={dst_epsg}) -- a degrees/meters mix-up? Tag "
                "both grids with EPSG codes to reproject between CRSs")
    src_c = (xg - sx0) / sdx - 0.5
    src_r = (yg - sy0) / sdy - 0.5
    return _sample(data, src_r, src_c, resampling)


def align_raster_to(raster, dst_transform: Sequence[float],
                    dst_shape: Tuple[int, int], *,
                    dst_epsg: Optional[int] = None,
                    resampling: str = "nearest") -> np.ndarray:
    """``align_to_template`` for a :class:`forest_tpu.data.raster.Raster`:
    no-op passthrough when the grid already matches, else resampled onto
    the destination grid (float, NaN fill)."""
    if raster.transform is None:
        raise ValueError("source raster has no geo-transform")
    src_epsg = getattr(raster, "epsg", None)
    if not needs_reprojection(raster.transform, dst_transform,
                              src_epsg, dst_epsg) \
            and raster.data.shape[:2] == tuple(dst_shape):
        return raster.masked()
    return align_to_grid(raster.data, raster.transform, dst_transform,
                         dst_shape, src_epsg=src_epsg, dst_epsg=dst_epsg,
                         resampling=resampling, nodata=raster.nodata)


__all__ = ["TransverseMercator", "transform_coords", "utm_zone_epsg",
           "needs_reprojection", "align_to_grid", "align_raster_to"]
