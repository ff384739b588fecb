"""Minimal GeoTIFF reader/writer for aligned-grid ingestion (no GDAL).

The raster-helper role of ``/root/reference/utils/rasterio.py:27-397``
(windowed open, grid-alignment checks, per-year band stacks feeding the
cube builder) scoped to what this image supports: pixel decode is PIL
(baked in), and the GeoTIFF georeferencing tags are parsed from the TIFF
directory directly -- ModelPixelScale (33550) + ModelTiepoint (33922), or
ModelTransformation (34264), plus GDAL_NODATA (42113) and the EPSG code
from the GeoKeyDirectory (34735). By default every source must already
sit on the target grid, matching the reference's aligned-COG fast path,
and the builder rejects misaligned sources; opt-in resampling (and
WGS84/UTM <-> geographic reprojection) lives in ``data/reproject.py``.

The affine convention matches the cube's ``geo_transform`` attr consumed
by ``eval/embed_locations.py``: ``[x0, dx, y0, dy]`` with
``x = x0 + col * dx`` and ``y = y0 + row * dy`` (dy is negative for
north-up rasters).
"""
from __future__ import annotations

import glob as _glob
from dataclasses import dataclass
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922
_MODEL_TRANSFORMATION = 34264
_GEO_KEY_DIRECTORY = 34735
_GEO_ASCII_PARAMS = 34737
_GDAL_NODATA = 42113
# GeoKey ids (GeoTIFF 1.1 spec)
_GT_MODEL_TYPE = 1024          # 1 = projected, 2 = geographic
_GEOGRAPHIC_TYPE = 2048        # geographic EPSG (e.g. 4326)
_PROJECTED_CS_TYPE = 3072      # projected EPSG (e.g. 32610)


@dataclass
class Raster:
    """One decoded raster: ``data`` [H, W] (single band) or [H, W, C]."""
    data: np.ndarray
    transform: Optional[Tuple[float, float, float, float]]  # x0, dx, y0, dy
    nodata: Optional[float]
    epsg: Optional[int] = None  # from GeoKeyDirectory, when present
    crs_wkt: Optional[str] = None  # from GeoAsciiParams, when present

    @property
    def shape(self):
        return self.data.shape

    def masked(self) -> np.ndarray:
        """float32 copy with nodata -> NaN (the builder's fill contract)."""
        x = np.asarray(self.data, np.float32)
        if self.nodata is not None:
            x = np.where(x == np.float32(self.nodata), np.nan, x)
        return x


def _parse_transform(tags) -> Optional[Tuple[float, float, float, float]]:
    if _MODEL_TRANSFORMATION in tags:
        m = [float(v) for v in tags[_MODEL_TRANSFORMATION]]
        # 4x4 row-major: x = m[3] + col*m[0] + row*m[1]; y = m[7] + ...
        if m[1] != 0.0 or m[4] != 0.0:
            raise ValueError("rotated ModelTransformation rasters are not "
                             "supported (no resampling backend)")
        return (m[3], m[0], m[7], m[5])
    if _MODEL_PIXEL_SCALE in tags and _MODEL_TIEPOINT in tags:
        sx, sy = [float(v) for v in tags[_MODEL_PIXEL_SCALE][:2]]
        tp = [float(v) for v in tags[_MODEL_TIEPOINT][:6]]
        i, j, _, x, y, _ = tp
        # tiepoint maps pixel (i, j) -> map (x, y); GeoTIFF y decreases
        return (x - i * sx, sx, y + j * sy, -sy)
    return None


def _parse_epsg(tags) -> Optional[int]:
    """EPSG code from GeoKeyDirectoryTag (34735): short-array of
    (KeyID, TIFFTagLocation, Count, Value) entries after a 4-short
    header; ProjectedCSType (3072) wins over GeographicType (2048)."""
    if _GEO_KEY_DIRECTORY not in tags:
        return None
    try:
        d = [int(v) for v in tags[_GEO_KEY_DIRECTORY]]
    except (TypeError, ValueError):
        return None  # malformed tag: behave as if absent
    if len(d) < 4:
        return None
    keys = {}
    for i in range(4, min(len(d), 4 + 4 * d[3]), 4):
        entry = d[i:i + 4]
        if len(entry) < 4:
            break  # truncated mid-entry
        key_id, loc, _count, value = entry
        if loc == 0:  # inline short value
            keys[key_id] = value
    for k in (_PROJECTED_CS_TYPE, _GEOGRAPHIC_TYPE):
        code = keys.get(k)
        if code and code != 32767:  # 32767 = user-defined
            return code
    return None


def _parse_wkt(tags) -> Optional[str]:
    if _GEO_ASCII_PARAMS not in tags:
        return None
    s = str(tags[_GEO_ASCII_PARAMS]).strip("\x00| ")
    return s or None


def read_geotiff(path: str | Path,
                 window: Optional[Tuple[int, int, int, int]] = None
                 ) -> Raster:
    """Read a GeoTIFF -> :class:`Raster`.

    ``window``: optional (row_start, col_start, height, width) crop; the
    returned transform is shifted so the window's pixel (0, 0) keeps its
    true map coordinates (the reference's windowed-read contract).
    """
    from PIL import Image

    with Image.open(path) as im:
        tags = dict(im.tag_v2) if hasattr(im, "tag_v2") else {}
        data = np.array(im)
    transform = _parse_transform(tags)
    nodata = None
    if _GDAL_NODATA in tags:
        try:
            nodata = float(str(tags[_GDAL_NODATA]).strip("\x00 "))
        except ValueError:
            pass
    if window is not None:
        r0, c0, h, w = window
        if r0 < 0 or c0 < 0 or r0 + h > data.shape[0] \
                or c0 + w > data.shape[1]:
            raise ValueError(f"window {window} outside raster "
                             f"{data.shape[:2]}")
        data = data[r0:r0 + h, c0:c0 + w]
        if transform is not None:
            x0, dx, y0, dy = transform
            transform = (x0 + c0 * dx, dx, y0 + r0 * dy, dy)
    return Raster(data=data, transform=transform, nodata=nodata,
                  epsg=_parse_epsg(tags), crs_wkt=_parse_wkt(tags))


def num_bands(path: str | Path) -> int:
    """Band count of a raster file: multi-page TIFFs expose one band per
    page/IFD (the synthesizer's layout for GDAL band-interleaved files,
    which PIL cannot decode); single-page files with an interleaved
    channel axis expose one band per channel."""
    from PIL import Image

    with Image.open(path) as im:
        n = getattr(im, "n_frames", 1)
        if n > 1:
            return n
        # Channel count without decoding pixels (validation walks every
        # referenced file; np.asarray(im) would decompress whole rasters
        # just to read .shape).
        return max(len(im.getbands()), 1)


def read_band(path: str | Path, band_index: int = 1) -> Raster:
    """Read ONE band (1-based) of a possibly multi-band raster file.

    The windowed single-band open of the reference builder
    (/root/reference/zarr_builder/build_zarr.py:395-492) scoped to PIL:
    multi-page TIFF -> seek to the page; interleaved [H, W, C] -> slice
    the channel. Geo tags are taken from the first directory (where GDAL
    and :func:`write_multiband_geotiff` put them)."""
    from PIL import Image

    with Image.open(path) as im:
        tags = dict(im.tag_v2) if hasattr(im, "tag_v2") else {}
        n = getattr(im, "n_frames", 1)
        if n > 1:
            if not 1 <= band_index <= n:
                raise IndexError(f"{path}: band {band_index} out of range "
                                 f"(1..{n})")
            im.seek(band_index - 1)
            data = np.array(im)
        else:
            data = np.array(im)
            if data.ndim == 3:
                if not 1 <= band_index <= data.shape[2]:
                    raise IndexError(f"{path}: band {band_index} out of "
                                     f"range (1..{data.shape[2]})")
                data = data[:, :, band_index - 1]
            elif band_index != 1:
                raise IndexError(f"{path}: band {band_index} out of range "
                                 "(single-band file)")
    nodata = None
    if _GDAL_NODATA in tags:
        try:
            nodata = float(str(tags[_GDAL_NODATA]).strip("\x00 "))
        except ValueError:
            pass
    return Raster(data=data, transform=_parse_transform(tags),
                  nodata=nodata, epsg=_parse_epsg(tags),
                  crs_wkt=_parse_wkt(tags))


def read_geotiff_tags(path: str | Path
                      ) -> Tuple[Optional[Tuple[float, float, float, float]],
                                 Optional[float], Optional[int]]:
    """(transform, nodata, epsg) from the TIFF directory WITHOUT decoding
    pixels — cheap grid-anchor probing for the cube builder."""
    from PIL import Image

    with Image.open(path) as im:
        tags = dict(im.tag_v2) if hasattr(im, "tag_v2") else {}
    nodata = None
    if _GDAL_NODATA in tags:
        try:
            nodata = float(str(tags[_GDAL_NODATA]).strip("\x00 "))
        except ValueError:
            pass
    return _parse_transform(tags), nodata, _parse_epsg(tags)


def _geo_ifd(transform, nodata, epsg, crs_wkt=None):
    from PIL import TiffImagePlugin

    ifd = TiffImagePlugin.ImageFileDirectory_v2()
    if transform is not None:
        x0, dx, y0, dy = [float(v) for v in transform]
        if dy >= 0:
            raise ValueError("north-up GeoTIFF requires dy < 0")
        ifd[_MODEL_PIXEL_SCALE] = (dx, -dy, 0.0)
        ifd.tagtype[_MODEL_PIXEL_SCALE] = TiffImagePlugin.TiffTags.DOUBLE
        ifd[_MODEL_TIEPOINT] = (0.0, 0.0, 0.0, x0, y0, 0.0)
        ifd.tagtype[_MODEL_TIEPOINT] = TiffImagePlugin.TiffTags.DOUBLE
    if nodata is not None:
        ifd[_GDAL_NODATA] = repr(float(nodata)) if nodata % 1 \
            else str(int(nodata))
        ifd.tagtype[_GDAL_NODATA] = TiffImagePlugin.TiffTags.ASCII
    if epsg is not None:
        # 4xxx is the geographic-2D range EXCEPT a handful of projected
        # world CRSs that landed in it (4087/4088 equidistant cylindrical).
        geographic = 4000 <= int(epsg) <= 4999 \
            and int(epsg) not in (4087, 4088)
        key = _GEOGRAPHIC_TYPE if geographic else _PROJECTED_CS_TYPE
        ifd[_GEO_KEY_DIRECTORY] = (
            1, 1, 0, 2,
            _GT_MODEL_TYPE, 0, 1, 2 if geographic else 1,
            key, 0, 1, int(epsg))
        ifd.tagtype[_GEO_KEY_DIRECTORY] = TiffImagePlugin.TiffTags.SHORT
    if crs_wkt:
        ifd[_GEO_ASCII_PARAMS] = crs_wkt + "|"
        ifd.tagtype[_GEO_ASCII_PARAMS] = TiffImagePlugin.TiffTags.ASCII
    return ifd


def _to_pil(plane: np.ndarray):
    from PIL import Image

    plane = np.asarray(plane)
    if plane.dtype == np.float64:
        plane = plane.astype(np.float32)
    if plane.dtype == np.int16:
        plane = plane.astype(np.int32)  # PIL has no I;16S writer
    return Image.fromarray(plane, mode="F" if plane.dtype.kind == "f"
                           and plane.ndim == 2 else None)


def write_geotiff(path: str | Path, data: np.ndarray,
                  transform: Optional[Sequence[float]] = None,
                  nodata: Optional[float] = None,
                  epsg: Optional[int] = None,
                  crs_wkt: Optional[str] = None) -> None:
    """Write [H, W] (float32/uint8/uint16/int32) or [H, W, 3] uint8."""
    ifd = _geo_ifd(transform, nodata, epsg, crs_wkt)
    _to_pil(data).save(path, tiffinfo=ifd)


def write_multiband_geotiff(path: str | Path, bands: np.ndarray,
                            transform: Optional[Sequence[float]] = None,
                            nodata: Optional[float] = None,
                            epsg: Optional[int] = None,
                            crs_wkt: Optional[str] = None) -> None:
    """Write [B, H, W] as a multi-page TIFF, one band per page (the layout
    :func:`read_band` / :func:`num_bands` consume; GDAL's band-interleaved
    single-IFD layout is not writable/readable through PIL). Geo tags live
    on the first directory."""
    bands = np.asarray(bands)
    if bands.ndim != 3:
        raise ValueError(f"expected [B, H, W], got {bands.shape}")
    ifd = _geo_ifd(transform, nodata, epsg, crs_wkt)
    frames = [_to_pil(b) for b in bands]
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   tiffinfo=ifd)


def assert_aligned(a: Raster, b: Raster, *, atol: float = 1e-6,
                   names: Tuple[str, str] = ("a", "b")) -> None:
    """Reject sources that don't share one grid (reference alignment
    check, utils/rasterio.py -- there is no resampling backend here)."""
    if a.data.shape[:2] != b.data.shape[:2]:
        raise ValueError(f"{names[0]} {a.data.shape[:2]} and {names[1]} "
                         f"{b.data.shape[:2]} differ in pixel grid size")
    if a.transform is not None and b.transform is not None:
        if not np.allclose(a.transform, b.transform, atol=atol):
            raise ValueError(
                f"{names[0]} transform {a.transform} != {names[1]} "
                f"transform {b.transform}: sources must be pre-aligned "
                "(no reprojection backend in this image)")


def read_year_stack(pattern: str | Path, base: str | Path = ".",
                    expect_t: Optional[int] = None, *,
                    masked: bool = True) -> Tuple[np.ndarray, Raster]:
    """Glob per-year GeoTIFFs (sorted) -> ([T, H, W], first Raster for the
    grid). ``masked=True`` returns float32 with nodata as NaN; the cube
    builder passes ``masked=False`` and maps nodata by the TARGET band
    dtype instead (an integer band cannot hold NaN). The reference builds
    annual stacks from per-year COG exports the same way."""
    paths = sorted(_glob.glob(str(Path(base) / str(pattern))))
    if not paths:
        raise FileNotFoundError(f"no rasters match {pattern!r} under "
                                f"{base}")
    first = read_geotiff(paths[0])
    layers = [first.masked() if masked else first.data]
    for p in paths[1:]:
        r = read_geotiff(p)
        assert_aligned(first, r, names=(paths[0], p))
        layers.append(r.masked() if masked else r.data)
    stack = np.stack(layers, axis=0)
    if expect_t is not None and stack.shape[0] != expect_t:
        raise ValueError(f"{pattern!r}: {stack.shape[0]} rasters found, "
                         f"expected {expect_t}")
    return stack, first


def align_fine_to_patches(fine: Raster,
                          coarse_transform: Sequence[float],
                          window: Tuple[int, int, int, int],
                          kshape: Tuple[int, int] = (3, 3),
                          out_dtype=np.float32) -> np.ndarray:
    """Align a fine-resolution raster (e.g. 10 m NAIP) onto a coarse-grid
    window as per-cell patches.

    The patch pre-bake contract of
    ``/root/reference/utils/raster_ops.py:96-131`` (_read_naip_block):
    map-project the coarse window ``(y0, y1, x0, x1)`` through
    ``coarse_transform``, locate it in the fine raster via ITS transform,
    read boundlessly (outside -> NaN), crop/pad to
    ``(yblk*krow, xblk*kcol)``, and reshape to
    ``[yblk, xblk, krow, kcol, band]``.
    """
    if fine.transform is None:
        raise ValueError("fine raster has no geo-transform")
    y0, y1, x0, x1 = window
    krow, kcol = kshape
    yblk, xblk = y1 - y0, x1 - x0
    cx0, cdx, cy0, cdy = [float(v) for v in coarse_transform]
    fx0, fdx, fy0, fdy = fine.transform
    left = cx0 + x0 * cdx
    top = cy0 + y0 * cdy
    c0 = int(round((left - fx0) / fdx))
    r0 = int(round((top - fy0) / fdy))
    eh, ew = yblk * krow, xblk * kcol

    data = fine.data
    if data.ndim == 2:
        data = data[..., None]
    bands = data.shape[-1]
    buf = np.full((eh, ew, bands), np.nan, out_dtype)
    rs, re = max(r0, 0), min(r0 + eh, data.shape[0])
    cs, ce = max(c0, 0), min(c0 + ew, data.shape[1])
    if rs < re and cs < ce:
        src = np.asarray(data[rs:re, cs:ce], out_dtype)
        if fine.nodata is not None:
            src = np.where(src == np.asarray(fine.nodata, src.dtype),
                           np.nan, src)
        buf[rs - r0:re - r0, cs - c0:ce - c0] = src
    # (yblk, krow, xblk, kcol, B) -> (yblk, xblk, krow, kcol, B)
    out = buf.reshape(yblk, krow, xblk, kcol, bands)
    return np.transpose(out, (0, 2, 1, 3, 4))


__all__ = ["Raster", "read_geotiff", "write_geotiff", "read_band",
           "num_bands", "write_multiband_geotiff", "assert_aligned",
           "read_year_stack", "align_fine_to_patches"]
