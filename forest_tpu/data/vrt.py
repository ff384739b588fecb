"""Minimal GDAL-VRT reader/writer (no GDAL in this image).

The reference cube builder ingests its sources as GDAL VRT mosaics
(``/root/reference/zarr_builder/va_vae_dataset_test.yaml`` references
``*.vrt`` for every annual/irregular group;
``/root/reference/zarr_builder/build_zarr.py:395-553`` opens them through
rasterio, which delegates VRT resolution to GDAL). This module implements
the subset of the VRT 1.x XML schema those pipelines actually exercise:

- ``VRTDataset`` raster size, ``GeoTransform`` (GDAL order: x0, dx, rot,
  y0, rot, dy; rotation must be zero), ``SRS`` (WKT or ``EPSG:n``);
- ``VRTRasterBand`` with ``band`` index, ``NoDataValue``, and
  ``SimpleSource`` / ``ComplexSource`` children;
- per-source ``SourceFilename`` (honouring ``relativeToVRT``),
  ``SourceBand``, ``SrcRect`` / ``DstRect`` placement (1:1 pixel mapping
  -- scaling sources would need a resampling kernel and is rejected), and
  ``ComplexSource`` ``ScaleRatio`` / ``ScaleOffset``.

Underlying tiles are decoded with :mod:`forest_tpu.data.raster` (PIL).
Unreferenced pixels are the band's NoDataValue (or NaN for floats), the
GDAL boundless-read contract.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from forest_tpu.data import raster as rio

_DTYPES = {
    "Byte": np.uint8, "UInt16": np.uint16, "Int16": np.int16,
    "UInt32": np.uint32, "Int32": np.int32,
    "Float32": np.float32, "Float64": np.float64,
}
_DTYPE_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}


def _parse_geotransform(text: str) -> Tuple[float, float, float, float]:
    vals = [float(v) for v in text.replace(",", " ").split()]
    if len(vals) != 6:
        raise ValueError(f"GeoTransform needs 6 values, got {len(vals)}")
    x0, dx, rxy, y0, ryx, dy = vals
    if rxy != 0.0 or ryx != 0.0:
        raise ValueError("rotated VRT grids are not supported")
    return (x0, dx, y0, dy)


def _parse_srs(text: Optional[str]) -> Tuple[Optional[str], Optional[int]]:
    """-> (crs_wkt, epsg). Accepts raw WKT or an ``EPSG:n`` shorthand."""
    if not text:
        return None, None
    s = text.strip()
    if s.upper().startswith("EPSG:"):
        return None, int(s.split(":", 1)[1])
    epsg = None
    # WKT AUTHORITY["EPSG","32617"] at the top level (last occurrence is
    # the CRS's own code; nested ones belong to datum/units).
    import re

    hits = re.findall(r'AUTHORITY\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]', s)
    if hits:
        epsg = int(hits[-1])
    return s, epsg


def _rect(elem: Optional[ET.Element], default_w: int, default_h: int
          ) -> Tuple[int, int, int, int]:
    """(xoff, yoff, xsize, ysize) from an Src/DstRect element."""
    if elem is None:
        return (0, 0, default_w, default_h)
    return (int(float(elem.get("xOff", 0))), int(float(elem.get("yOff", 0))),
            int(float(elem.get("xSize", default_w))),
            int(float(elem.get("ySize", default_h))))


class VRTDataset:
    """Parsed VRT: lazy per-band mosaic reads over PIL-decoded tiles."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        root = ET.fromstring(self.path.read_text())
        if root.tag != "VRTDataset":
            raise ValueError(f"{path}: not a VRTDataset (root {root.tag!r})")
        self.width = int(root.get("rasterXSize"))
        self.height = int(root.get("rasterYSize"))
        gt = root.find("GeoTransform")
        self.transform = _parse_geotransform(gt.text) if gt is not None \
            else None
        self.crs_wkt, self.epsg = _parse_srs(
            root.findtext("SRS"))
        self.bands: List[ET.Element] = root.findall("VRTRasterBand")
        # VRT band order follows the ``band`` attribute when present.
        self.bands.sort(key=lambda b: int(b.get("band", 1)))

    @property
    def num_bands(self) -> int:
        return len(self.bands)

    def band_nodata(self, band_index: int) -> Optional[float]:
        nd = self.bands[band_index - 1].findtext("NoDataValue")
        return float(nd) if nd not in (None, "") else None

    def read_band(self, band_index: int) -> np.ndarray:
        """Mosaic one band (1-based) -> [H, W] ndarray."""
        if not 1 <= band_index <= len(self.bands):
            raise IndexError(f"{self.path}: band {band_index} out of range "
                             f"(1..{len(self.bands)})")
        belem = self.bands[band_index - 1]
        dtype = _DTYPES.get(belem.get("dataType", "Float32"), np.float32)
        nodata = self.band_nodata(band_index)
        if np.dtype(dtype).kind == "f":
            fill = np.nan if nodata is None else nodata
        else:
            fill = 0 if nodata is None else nodata
        out = np.full((self.height, self.width), fill, dtype)
        for src in list(belem.findall("SimpleSource")) \
                + list(belem.findall("ComplexSource")):
            fn_elem = src.find("SourceFilename")
            if fn_elem is None or not fn_elem.text:
                raise ValueError(f"{self.path}: source without filename")
            rel = fn_elem.get("relativeToVRT", "0") in ("1", "true")
            fp = (self.path.parent / fn_elem.text) if rel \
                else Path(fn_elem.text)
            sband = int(src.findtext("SourceBand", "1"))
            tile = rio.read_band(fp, sband)
            th, tw = tile.data.shape[:2]
            sx, sy, sw, sh = _rect(src.find("SrcRect"), tw, th)
            dx_, dy_, dw, dh = _rect(src.find("DstRect"), self.width,
                                     self.height)
            if (sw, sh) != (dw, dh):
                raise ValueError(
                    f"{self.path}: scaled source ({sw}x{sh} -> {dw}x{dh}) "
                    "not supported (no resampling backend)")
            # Clip the destination placement to the VRT canvas AND to the
            # tile's real extent: a SrcRect may overhang the source file
            # (legal in GDAL, which nodata-pads the overhang); clamping
            # leaves those destination pixels at `fill`, honoring the
            # boundless-read contract instead of a broadcast error.
            cx0, cy0 = max(dx_, 0), max(dy_, 0)
            cx1 = min(dx_ + dw, self.width, dx_ + max(tw - sx, 0))
            cy1 = min(dy_ + dh, self.height, dy_ + max(th - sy, 0))
            if cx1 <= cx0 or cy1 <= cy0:
                continue
            block = np.asarray(
                tile.data[sy + (cy0 - dy_):sy + (cy1 - dy_),
                          sx + (cx0 - dx_):sx + (cx1 - dx_)])
            ratio = float(src.findtext("ScaleRatio", "1"))
            offset = float(src.findtext("ScaleOffset", "0"))
            if ratio != 1.0 or offset != 0.0:
                valid = np.ones(block.shape, bool) \
                    if tile.nodata is None else (block != tile.nodata)
                block = np.where(valid, block * ratio + offset, block)
            if tile.nodata is not None and nodata is not None \
                    and float(tile.nodata) != float(nodata):
                block = np.where(block == tile.nodata, nodata, block)
            out[cy0:cy1, cx0:cx1] = block.astype(dtype, copy=False)
        return out


def read_vrt_band(path: str | Path, band_index: int = 1) -> "rio.Raster":
    """One VRT band -> :class:`forest_tpu.data.raster.Raster`."""
    ds = VRTDataset(path)
    return rio.Raster(data=ds.read_band(band_index),
                      transform=ds.transform,
                      nodata=ds.band_nodata(band_index),
                      epsg=ds.epsg, crs_wkt=ds.crs_wkt)


def write_vrt(path: str | Path, size: Tuple[int, int],
              band_sources: Sequence[Sequence[Tuple[str, int]]],
              transform: Optional[Sequence[float]] = None,
              crs_wkt: Optional[str] = None,
              nodata: Optional[float] = None,
              dtype="float32") -> None:
    """Write a simple VRT: ``size`` = (height, width); ``band_sources[i]``
    lists (filename, source_band) mosaicked 1:1 onto band i+1. Filenames
    are stored relative to the VRT. The writer exists for tests and the
    reference-YAML source synthesizer; production VRTs come from GDAL."""
    h, w = size
    dname = _DTYPE_NAMES.get(np.dtype(dtype), "Float32")
    lines = [f'<VRTDataset rasterXSize="{w}" rasterYSize="{h}">']
    if crs_wkt:
        from xml.sax.saxutils import escape

        lines.append(f"  <SRS>{escape(crs_wkt)}</SRS>")
    if transform is not None:
        x0, dx, y0, dy = [float(v) for v in transform]
        lines.append(f"  <GeoTransform>{x0}, {dx}, 0, {y0}, 0, {dy}"
                     "</GeoTransform>")
    for i, sources in enumerate(band_sources, 1):
        lines.append(f'  <VRTRasterBand dataType="{dname}" band="{i}">')
        if nodata is not None:
            lines.append(f"    <NoDataValue>{nodata}</NoDataValue>")
        for fn, sband in sources:
            lines.append("    <SimpleSource>")
            lines.append(f'      <SourceFilename relativeToVRT="1">{fn}'
                         "</SourceFilename>")
            lines.append(f"      <SourceBand>{sband}</SourceBand>")
            lines.append("    </SimpleSource>")
        lines.append("  </VRTRasterBand>")
    lines.append("</VRTDataset>")
    Path(path).write_text("\n".join(lines))


__all__ = ["VRTDataset", "read_vrt_band", "write_vrt"]
