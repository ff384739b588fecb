"""Reference-schema hierarchical cube builder.

Builds the FULL dataset-YAML schema of the reference builder
(``/root/reference/zarr_builder/build_zarr.py``), so the UNMODIFIED
``va_vae_dataset*.yaml`` configs shipped with the reference build
end-to-end here (gated in CI by tests/test_build_zarr_v2.py):

- ``dataset:`` block -- out_zarr, spatial (CRS WKT + resolution +
  affine transform + bounds -> grid shape, build_zarr.py:65-77), dtype by
  semantic type (:138-166), default_chunk, blosc compressor, global time
  window, statistics flags, reprojection policy;
- top-level ``aoi`` / ``strata`` rasters written at the zarr root
  (:1493-1549) and ``annual`` / ``irregular`` / ``static`` group lists,
  each with data/quality/mask subsections (:224-316);
- per-kind loaders (:659-953): static single/multiband, annual per-year
  (``{yyyy}`` patterns), annual multiband (bands = years), annual
  per-band (one file per band spanning years), irregular snapshots with
  ``snapshot_year`` coords;
- fill-value priority band > group > raster nodata > semantic default
  (:955-1023) and temporal reindex onto the global window with
  semantic-typed pads (:1026-1052);
- per-variable statistics under the AOI spatial mask -- continuous
  mean/sd/min/quantiles/max, categorical class histograms, mask
  true/false counts (:1163-1346) -- embedded in zarr attrs and exported
  as JSON/CSV sidecars (:1650-1734);
- early validation: file existence, band ranges, per-band year/band-count
  mismatch, CRS + resolution screening with a reprojection-needed report
  (:1741-2061); ``--append`` / ``--validate-only`` / ``--out`` /
  ``--log-file`` CLI (:2068-2111).

Sources are GeoTIFFs (PIL decode, ``data/raster.py``) or minimal GDAL
VRT mosaics (``data/vrt.py``); compressed chunked output goes through
``data/zarrlite.py`` (ctypes blosc). Because the reference configs point
at absolute ``/data/...`` paths and continent-scale grids, the builder
adds two orthogonal testing levers the reference gets from its
environment: ``--path-root`` re-roots absolute source paths into a
sandbox, and ``--scale N`` multiplies the pixel size (dividing the grid
N-fold) without touching the YAML. ``synthesize_sources`` fabricates a
complete source tree for any config (the CI gate and the TPU demo use
it).
"""
from __future__ import annotations

import argparse
import csv
import json
import logging
import re
import shutil
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import yaml

from forest_tpu.data import raster as rio
from forest_tpu.data import vrt as vrtmod
from forest_tpu.data import zarrlite as zl

log = logging.getLogger("forest_tpu.build_zarr_v2")

_SUBSECTIONS = ("data", "quality", "mask")
_SEMANTIC_DEFAULTS = {"data": "continuous", "quality": "continuous",
                      "mask": "mask"}
_DTYPE_DEFAULTS = {"continuous": "float16", "categorical": "int16",
                   "mask": "uint8"}
# Temporal-reindex pads by semantic type (build_zarr.py:1040-1047).
_TEMPORAL_PAD = {"continuous": 0.0, "categorical": -1, "mask": 0}


# ---------------------------------------------------------------------------
# Config parsing
# ---------------------------------------------------------------------------

@dataclass
class SpatialConfig:
    """dataset.spatial: grid derived from bounds + resolution
    (build_zarr.py:65-77). ``transform`` is the YAML's rasterio-affine
    order (a=dx, b, c=x0, d, e=dy, f=y0)."""
    crs_wkt: str
    resolution: float
    transform: List[float]
    bounds: Dict[str, float]

    @property
    def shape(self) -> Tuple[int, int]:
        width = int((self.bounds["xmax"] - self.bounds["xmin"])
                    / self.resolution)
        height = int((self.bounds["ymax"] - self.bounds["ymin"])
                     / abs(self.transform[4]))
        return (height, width)

    @property
    def grid_transform(self) -> Tuple[float, float, float, float]:
        """(x0, dx, y0, dy) -- the repo raster convention."""
        a, _b, c, _d, e, f = [float(v) for v in self.transform]
        return (c, a, f, e)

    def scaled(self, factor: int) -> "SpatialConfig":
        """Same extent, ``factor``-times coarser pixels (testing lever)."""
        a, b, c, d, e, f = [float(v) for v in self.transform]
        return SpatialConfig(self.crs_wkt, self.resolution * factor,
                             [a * factor, b, c, d, e * factor, f],
                             dict(self.bounds))


@dataclass
class BandSpec:
    id: str
    source_band: Optional[int] = None
    fill_value: Optional[Dict[str, Any]] = None
    path: Optional[str] = None


@dataclass
class GroupSpec:
    name: str
    category: str       # annual | irregular | static
    subsection: str     # data | quality | mask
    semantic_type: str  # continuous | categorical | mask
    path: Optional[str] = None
    bands: List[BandSpec] = field(default_factory=list)
    years: Optional[List[int]] = None
    year_range: Optional[Tuple[int, int]] = None
    fill_value: Optional[Dict[str, Any]] = None


def load_config(path: str | Path) -> dict:
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"Config file not found: {p}")
    return yaml.safe_load(p.read_text())


def parse_spatial_config(cfg: dict) -> SpatialConfig:
    sp = cfg["dataset"]["spatial"]
    return SpatialConfig(crs_wkt=sp["crs"]["wkt"],
                         resolution=float(sp["resolution"]),
                         transform=[float(v) for v in sp["transform"]],
                         bounds={k: float(v)
                                 for k, v in sp["bounds"].items()})


def get_global_time_window(cfg: dict) -> Tuple[int, int]:
    t = cfg["dataset"]["time"]["continuous"]
    return (int(t["start"]), int(t["end"]))


def get_dtype_for_semantic_type(semantic_type: str, dtype_cfg: dict
                                ) -> np.dtype:
    name = (dtype_cfg or {}).get(semantic_type,
                                 _DTYPE_DEFAULTS.get(semantic_type,
                                                     "float16"))
    return np.dtype(name)


def _parse_bands(section_cfg: Any) -> List[BandSpec]:
    """Bands from a subsection: dict-with-'bands' or bare list
    (build_zarr.py:169-206)."""
    if isinstance(section_cfg, list):
        items = section_cfg
    elif isinstance(section_cfg, dict) and "bands" in section_cfg:
        items = section_cfg["bands"]
    else:
        raise ValueError("band configuration must be a list or a dict with "
                         f"'bands'; got {type(section_cfg).__name__}")
    return [BandSpec(id=b["id"], source_band=b.get("source_band"),
                     fill_value=b.get("fill_value"), path=b.get("path"))
            for b in items]


def parse_group_specs(cfg: dict) -> List[GroupSpec]:
    """annual/irregular/static group lists -> flat GroupSpec list, one per
    (group, subsection) like the reference (build_zarr.py:224-316)."""
    specs: List[GroupSpec] = []
    for category in ("annual", "irregular", "static"):
        for group in cfg.get(category) or []:
            years = year_range = None
            if category == "annual" and "years" in group:
                yc = group["years"]
                if isinstance(yc, dict):
                    year_range = (int(yc["start"]), int(yc["end"]))
                else:
                    years = [int(y) for y in yc]
            elif category == "irregular":
                years = [int(y) for y in group.get("years") or []]
            for subsection in _SUBSECTIONS:
                if subsection not in group:
                    continue
                section = group[subsection]
                semantic = section.get("semantic_type",
                                       _SEMANTIC_DEFAULTS[subsection]) \
                    if isinstance(section, dict) \
                    else _SEMANTIC_DEFAULTS[subsection]
                specs.append(GroupSpec(
                    name=group["group"], category=category,
                    subsection=subsection, semantic_type=semantic,
                    path=group.get("path"), bands=_parse_bands(section),
                    years=years, year_range=year_range,
                    fill_value=group.get("fill_value")))
    return specs


def detect_file_pattern(spec: GroupSpec) -> str:
    """per_year ({yyyy} template) | multiband (one group file) | per_band
    (every band carries its own path) -- build_zarr.py:323-339."""
    if spec.path:
        return "per_year" if ("{yyyy}" in spec.path
                              or "{year}" in spec.path) else "multiband"
    if spec.bands and all(b.path for b in spec.bands):
        return "per_band"
    raise ValueError(f"cannot determine file pattern for group {spec.name}")


def get_year_list(spec: GroupSpec, global_window: Tuple[int, int]
                  ) -> List[int]:
    if spec.category == "static":
        return []
    if spec.years:
        return sorted(spec.years)
    if spec.year_range:
        ys = list(range(spec.year_range[0], spec.year_range[1] + 1))
        if spec.category == "annual":
            g0, g1 = global_window
            ys = [y for y in ys if g0 <= y <= g1]
        return ys
    if spec.category == "annual":
        return list(range(global_window[0], global_window[1] + 1))
    raise ValueError(f"no year information for group {spec.name}")


# ---------------------------------------------------------------------------
# Path + raster resolution
# ---------------------------------------------------------------------------

class PathResolver:
    """Re-roots the config's absolute source paths under ``path_root``
    (the sandbox lever; with no root, paths resolve verbatim)."""

    def __init__(self, path_root: Optional[str | Path] = None):
        self.root = Path(path_root) if path_root else None

    def map(self, pattern: str, year: Optional[int] = None) -> Path:
        if year is not None:
            pattern = pattern.replace("{yyyy}", str(year))
            pattern = pattern.replace("{year}", str(year))
        p = Path(pattern)
        if self.root is not None and p.is_absolute():
            p = self.root / p.relative_to("/")
        return p

    def resolve(self, pattern: str, year: Optional[int] = None) -> Path:
        p = self.map(pattern, year)
        if not p.exists():
            raise FileNotFoundError(f"File not found: {p}")
        return p


def _is_vrt(path: Path) -> bool:
    if path.suffix.lower() == ".vrt":
        return True
    try:
        with open(path, "rb") as f:
            head = f.read(64)
        return b"<VRTDataset" in head
    except OSError:
        return False


def open_band(path: Path, band_index: int = 1) -> rio.Raster:
    """One band of a source file: VRT mosaics via data/vrt.py, anything
    else through the PIL GeoTIFF reader."""
    if _is_vrt(path):
        return vrtmod.read_vrt_band(path, band_index)
    return rio.read_band(path, band_index)


def source_num_bands(path: Path) -> int:
    if _is_vrt(path):
        return vrtmod.VRTDataset(path).num_bands
    return rio.num_bands(path)


def source_grid_info(path: Path) -> Tuple[
        Optional[Tuple[float, float, float, float]], Optional[str],
        Optional[int], int]:
    """(transform, crs_wkt, epsg, num_bands) without decoding pixels."""
    if _is_vrt(path):
        ds = vrtmod.VRTDataset(path)
        return ds.transform, ds.crs_wkt, ds.epsg, ds.num_bands
    tf, _nd, epsg = rio.read_geotiff_tags(path)
    from PIL import Image

    with Image.open(path) as im:
        wkt = rio._parse_wkt(dict(im.tag_v2)
                             if hasattr(im, "tag_v2") else {})
    return tf, wkt, epsg, rio.num_bands(path)


# ---------------------------------------------------------------------------
# CRS / resolution matching (no PROJ in this image)
# ---------------------------------------------------------------------------

def _wkt_info(wkt: Optional[str]) -> Optional[Dict[str, Any]]:
    """Projection name + PARAMETER dict + datum from a WKT1 string; the
    semantic comparison of build_zarr.py:2003-2055 without rasterio."""
    if not wkt:
        return None
    proj = re.search(r'PROJECTION\[\s*"([^"]+)"', wkt)
    datum = re.search(r'DATUM\[\s*"([^"]+)"', wkt)
    params = {m.group(1).lower(): float(m.group(2)) for m in
              re.finditer(r'PARAMETER\[\s*"([^"]+)"\s*,\s*'
                          r'([-+0-9.eE]+)', wkt)}
    epsg = None
    hits = re.findall(r'AUTHORITY\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]', wkt)
    if hits:
        epsg = int(hits[-1])
    return {"projection": proj.group(1) if proj else None,
            "datum": datum.group(1) if datum else None,
            "params": params, "epsg": epsg,
            "geographic": proj is None}


def crs_match(src_wkt: Optional[str], src_epsg: Optional[int],
              dst_wkt: Optional[str], dst_epsg: Optional[int],
              mode: str = "projection", tolerance: float = 1e-6) -> bool:
    """True when the CRSs agree. mode='projection' compares only the
    projection + parameters (the configs' crs_match_mode, which ignores
    the WGS84-vs-NAD83 datum difference); mode='exact' also requires the
    datum to match."""
    si = _wkt_info(src_wkt)
    di = _wkt_info(dst_wkt)
    se = src_epsg or (si or {}).get("epsg")
    de = dst_epsg or (di or {}).get("epsg")
    if se is not None and de is not None:
        return se == de
    if si is None or di is None:
        return False
    if si["geographic"] != di["geographic"]:
        return False
    if si["projection"] != di["projection"]:
        return False
    keys = set(si["params"]) | set(di["params"])
    for k in keys:
        if abs(si["params"].get(k, 0.0) - di["params"].get(k, 0.0)) \
                > tolerance:
            return False
    if mode == "exact" and si["datum"] != di["datum"]:
        return False
    return True


def resolution_match(src_transform: Sequence[float], resolution: float,
                     tolerance: float = 1.0) -> bool:
    _x0, dx, _y0, dy = src_transform
    return (abs(abs(dx) - resolution) < tolerance
            and abs(abs(dy) - resolution) < tolerance)


# ---------------------------------------------------------------------------
# Alignment
# ---------------------------------------------------------------------------

def align_to_grid(r: rio.Raster, spatial: SpatialConfig,
                  repro_cfg: Optional[dict] = None) -> np.ndarray:
    """Place a source raster onto the target grid (float64, out-of-extent
    = NaN). Same-CRS same-resolution sources are pasted by integer pixel
    offset -- the reference's clip-instead-of-reproject fast path
    (build_zarr.py:592-607), which is also how a CONUS-wide source gets
    clipped to the config bounds. Misaligned CRSs go through
    data/reproject.py when both sides carry EPSG codes."""
    repro_cfg = repro_cfg or {}
    h, w = spatial.shape
    gx0, gdx, gy0, gdy = spatial.grid_transform
    if r.transform is None:
        if r.data.shape[:2] != (h, w):
            raise ValueError(f"source without geo-transform has shape "
                             f"{r.data.shape[:2]}, grid is {(h, w)}")
        return np.asarray(r.data, np.float64)
    sx0, sdx, sy0, sdy = r.transform
    mode = repro_cfg.get("crs_match_mode", "projection")
    tol_m = float(repro_cfg.get("resolution_tolerance_m", 1.0))
    same_crs = (r.crs_wkt is None and r.epsg is None) or crs_match(
        r.crs_wkt, r.epsg, spatial.crs_wkt, None, mode=mode)
    res_ok = abs(abs(sdx) - abs(gdx)) < tol_m \
        and abs(abs(sdy) - abs(gdy)) < tol_m
    if same_crs and res_ok:
        col0 = (gx0 - sx0) / sdx
        row0 = (gy0 - sy0) / sdy
        if abs(col0 - round(col0)) > 0.01 or abs(row0 - round(row0)) > 0.01:
            raise ValueError(
                f"source grid is sub-pixel shifted from the target "
                f"(offsets {row0:.3f}, {col0:.3f}); reprojection of "
                "same-CRS sub-pixel shifts is not supported")
        col0, row0 = int(round(col0)), int(round(row0))
        out = np.full((h, w), np.nan, np.float64)
        sh, sw = r.data.shape[:2]
        rs, re_ = max(row0, 0), min(row0 + h, sh)
        cs, ce = max(col0, 0), min(col0 + w, sw)
        if rs < re_ and cs < ce:
            out[rs - row0:re_ - row0, cs - col0:ce - col0] = \
                np.asarray(r.data[rs:re_, cs:ce], np.float64)
        return out
    if not repro_cfg.get("enabled", True):
        raise ValueError("source CRS/resolution differs from the target "
                         "grid and reprojection is disabled in the config")
    from forest_tpu.data import reproject as rpj

    dst_info = _wkt_info(spatial.crs_wkt) or {}
    out = rpj.align_to_grid(
        np.asarray(r.data, np.float64), r.transform,
        (gx0, gdx, gy0, gdy), (h, w),
        src_epsg=r.epsg, dst_epsg=dst_info.get("epsg"),
        resampling=repro_cfg.get("interpolation", "nearest"),
        nodata=r.nodata)
    return np.asarray(out, np.float64)


# ---------------------------------------------------------------------------
# Fill values + temporal alignment
# ---------------------------------------------------------------------------

def handle_fill_values(data: np.ndarray, band: BandSpec, spec: GroupSpec,
                       src_nodata: Optional[float]
                       ) -> Tuple[np.ndarray, Any]:
    """(data, zarr fill_value) with the reference priority: band fill >
    group fill > raster nodata > untouched (build_zarr.py:955-1023).
    ``target: na`` maps to NaN (float storage); raster nodata maps by
    semantic type (continuous -> NaN, categorical -> 0, mask -> 0)."""
    for fv in (band.fill_value, spec.fill_value):
        if fv:
            source = fv.get("source")
            target = fv.get("target")
            if target in ("na", None):
                return np.where(data == source, np.nan, data), np.nan
            return np.where(data == source, target, data), target
    if src_nodata is not None:
        if spec.semantic_type == "continuous":
            return np.where(data == src_nodata, np.nan, data), np.nan
        fill = 0
        return np.where(data == src_nodata, fill, data), fill
    return data, np.nan if spec.semantic_type == "continuous" else 0


def align_temporal_to_window(data: np.ndarray, src_years: List[int],
                             target_years: List[int], semantic_type: str
                             ) -> np.ndarray:
    """Reindex [T, H, W] from src_years onto target_years; missing years
    take the semantic pad (build_zarr.py:1026-1052)."""
    pad = _TEMPORAL_PAD.get(semantic_type, 0)
    out = np.full((len(target_years),) + data.shape[1:], pad, data.dtype)
    index = {y: i for i, y in enumerate(src_years)}
    for j, y in enumerate(target_years):
        if y in index:
            out[j] = data[index[y]]
    return out


def _finalize_dtype(data: np.ndarray, dtype: np.dtype,
                    fill: Any) -> Tuple[np.ndarray, Any]:
    """Cast for storage; integer targets cannot hold NaN, so non-finite
    values (and a NaN fill) collapse to 0 like the reference's
    semantic-typed nodata replacement."""
    if np.dtype(dtype).kind == "f":
        return data.astype(dtype), fill
    if isinstance(fill, float) and np.isnan(fill):
        fill = 0
    return np.where(np.isfinite(data), data, fill).astype(dtype), fill


# ---------------------------------------------------------------------------
# Loaders (build_zarr.py:659-953)
# ---------------------------------------------------------------------------

def _band_file(band: BandSpec, spec: GroupSpec, resolver: PathResolver,
               year: Optional[int] = None) -> Path:
    if band.path:
        return resolver.resolve(band.path, year)
    if spec.path:
        return resolver.resolve(spec.path, year)
    raise ValueError(f"no path specified for band {band.id}")


def load_static_band(band: BandSpec, spec: GroupSpec,
                     spatial: SpatialConfig, resolver: PathResolver,
                     repro_cfg: dict) -> Tuple[np.ndarray, Any]:
    fp = _band_file(band, spec, resolver)
    r = open_band(fp, band.source_band or 1)
    data = align_to_grid(r, spatial, repro_cfg)
    return handle_fill_values(data, band, spec, r.nodata)


def _load_per_year(band: BandSpec, spec: GroupSpec, years: List[int],
                   spatial: SpatialConfig, resolver: PathResolver,
                   repro_cfg: dict) -> Tuple[np.ndarray, Optional[float]]:
    planes, nodata = [], None
    for year in years:
        fp = resolver.resolve(spec.path, year)
        r = open_band(fp, band.source_band or 1)
        nodata = r.nodata if nodata is None else nodata
        planes.append(align_to_grid(r, spatial, repro_cfg))
    return np.stack(planes), nodata


def _load_multiband_annual(band: BandSpec, spec: GroupSpec,
                           years: List[int], spatial: SpatialConfig,
                           resolver: PathResolver, repro_cfg: dict
                           ) -> Tuple[np.ndarray, Optional[float]]:
    """One file whose bands ARE the years: band b = band_start + (year -
    anchor_year) (build_zarr.py:801-846). Divergence from the reference:
    it anchors at the first REQUESTED year (:833-836), which silently
    shifts the mapping when the global window clips the group range; we
    anchor at the group's declared year_range start so band 1 always
    means the group's first year."""
    fp = _band_file(band, spec, resolver)
    n = source_num_bands(fp)
    if n < len(years):
        raise ValueError(f"{fp} has {n} bands but config specifies "
                         f"{len(years)} years")
    band_start = band.source_band or 1
    anchor = spec.year_range[0] if spec.year_range else years[0]
    planes, nodata = [], None
    for year in years:
        r = open_band(fp, band_start + (year - anchor))
        nodata = r.nodata if nodata is None else nodata
        planes.append(align_to_grid(r, spatial, repro_cfg))
    return np.stack(planes), nodata


def _load_per_band_annual(band: BandSpec, spec: GroupSpec,
                          years: List[int], spatial: SpatialConfig,
                          resolver: PathResolver, repro_cfg: dict
                          ) -> Tuple[np.ndarray, List[int],
                                     Optional[float]]:
    """One file PER BAND whose pages span the group's years
    (build_zarr.py:849-911). Returns the years actually loaded: when the
    file's band count matches the group's full year_range instead of the
    clipped request, the range's years are used (the reference's
    fallback) and the caller reindexes onto the window."""
    fp = resolver.resolve(band.path)
    n = source_num_bands(fp)
    if n == len(years):
        file_years = list(years)
    elif spec.year_range is not None:
        full = list(range(spec.year_range[0], spec.year_range[1] + 1))
        if len(full) != n:
            raise ValueError(
                f"{fp}: {n} bands match neither the requested years "
                f"({len(years)}) nor the group year_range ({len(full)})")
        file_years = full
    else:
        # Reference fallback (build_zarr.py:895-898): band indices as
        # years. Reindexing [0..n) onto a real-year window has ZERO
        # overlap, so the variable stores pure semantic pad -- warn as
        # loudly as the reference does rather than build silent zeros.
        log.warning(
            "%s: %d bands != %d requested years and the group declares "
            "no year_range -- falling back to band indices 0..%d (the "
            "reference's behavior); the temporal reindex will PAD every "
            "requested year. Declare year_range to fix this.",
            fp, n, len(years), n - 1)
        file_years = list(range(n))
    planes, nodata = [], None
    for i in range(1, n + 1):
        r = open_band(fp, i)
        nodata = r.nodata if nodata is None else nodata
        planes.append(align_to_grid(r, spatial, repro_cfg))
    return np.stack(planes), file_years, nodata


def load_annual_band(band: BandSpec, spec: GroupSpec,
                     spatial: SpatialConfig,
                     global_window: Tuple[int, int],
                     resolver: PathResolver, repro_cfg: dict
                     ) -> Tuple[np.ndarray, Any, List[int]]:
    """-> ([T, H, W] on the GLOBAL window, zarr fill, global years)."""
    years = get_year_list(spec, global_window)
    pattern = detect_file_pattern(spec)
    if pattern == "per_year":
        data, nodata = _load_per_year(band, spec, years, spatial,
                                      resolver, repro_cfg)
        loaded_years = years
    elif pattern == "multiband":
        data, nodata = _load_multiband_annual(band, spec, years, spatial,
                                              resolver, repro_cfg)
        loaded_years = years
    else:
        data, loaded_years, nodata = _load_per_band_annual(
            band, spec, years, spatial, resolver, repro_cfg)
    global_years = list(range(global_window[0], global_window[1] + 1))
    data = align_temporal_to_window(data, loaded_years, global_years,
                                    spec.semantic_type)
    data, fill = handle_fill_values(data, band, spec, nodata)
    return data, fill, global_years


def load_irregular_band(band: BandSpec, spec: GroupSpec,
                        spatial: SpatialConfig, resolver: PathResolver,
                        repro_cfg: dict
                        ) -> Tuple[np.ndarray, Any, List[int]]:
    """-> ([S, H, W], zarr fill, snapshot years). Irregular groups only
    support the per-year pattern (build_zarr.py:914-952)."""
    years = spec.years
    if not years:
        raise ValueError(f"irregular group {spec.name} missing years list")
    if detect_file_pattern(spec) != "per_year":
        raise ValueError("irregular data only supports per_year pattern")
    data, nodata = _load_per_year(band, spec, sorted(years), spatial,
                                  resolver, repro_cfg)
    data, fill = handle_fill_values(data, band, spec, nodata)
    return data, fill, sorted(years)


# ---------------------------------------------------------------------------
# Statistics (build_zarr.py:1163-1346)
# ---------------------------------------------------------------------------

def compute_band_statistics(stored: np.ndarray, semantic_type: str,
                            aoi_mask: Optional[np.ndarray] = None
                            ) -> Dict[str, Any]:
    stats: Dict[str, Any] = {"semantic_type": semantic_type,
                             "shape": list(stored.shape),
                             "dtype": str(stored.dtype)}
    x = np.asarray(stored, np.float32)
    if aoi_mask is not None:
        sel = np.broadcast_to(aoi_mask > 0, x.shape)
        x = x[sel]
    x = x.ravel()
    if semantic_type == "continuous":
        v = x[~np.isnan(x)]
        if v.size == 0:
            stats.update({k: 0.0 for k in
                          ("mean", "std", "min", "max", "q02", "q25",
                           "q50", "q75", "q98", "sd")})
            stats["warning"] = "no_valid_data"
            return stats
        stats.update({
            "mean": float(v.mean()), "std": float(v.std()),
            "min": float(v.min()), "max": float(v.max())})
        q = np.percentile(v, [2, 25, 50, 75, 98])
        stats.update({"q02": float(q[0]), "q25": float(q[1]),
                      "q50": float(q[2]), "q75": float(q[3]),
                      "q98": float(q[4]), "sd": stats["std"]})
    elif semantic_type == "categorical":
        v = x[~np.isnan(x)]
        v = v[v != -1]  # temporal/na pad is not a class
        ids, counts = np.unique(v.astype(np.int64), return_counts=True)
        stats["histogram"] = {int(i): int(c)
                              for i, c in zip(ids, counts)}
        stats["num_classes"] = int(len(ids))
    elif semantic_type == "mask":
        v = x[~np.isnan(x)]
        true_count = int((v > 0).sum())
        false_count = int((v == 0).sum())
        total = true_count + false_count
        stats.update({"true_count": true_count,
                      "false_count": false_count,
                      "true_fraction": true_count / total if total else 0.0})
    return stats


def export_statistics_json(stats: Dict[str, Dict[str, Any]],
                           path: Path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(stats, indent=2, sort_keys=True))


def export_statistics_csv(stats: Dict[str, Dict[str, Any]],
                          path: Path) -> None:
    rows = []
    for var_path, st in stats.items():
        row: Dict[str, Any] = {"variable": var_path}
        for k, v in st.items():
            if not isinstance(v, dict):
                row[k] = v
        if "histogram" in st:
            row["histogram"] = json.dumps(st["histogram"])
        rows.append(row)
    if not rows:
        return
    fieldnames = sorted({k for r in rows for k in r})
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames)
        w.writeheader()
        w.writerows(rows)


# ---------------------------------------------------------------------------
# Validation (build_zarr.py:1741-2061)
# ---------------------------------------------------------------------------

def validate_configuration(cfg: dict, spatial: SpatialConfig,
                           specs: List[GroupSpec],
                           global_window: Optional[Tuple[int, int]],
                           resolver: PathResolver
                           ) -> Dict[str, List[str]]:
    """Fail-fast screening before any pixel decode: existence, band
    ranges, per-band year/band-count consistency, CRS + resolution match
    reporting. Returns {errors, warnings, reprojection_needed}; raises on
    errors (the reference's contract)."""
    repro_cfg = (cfg.get("dataset") or {}).get("reprojection") or {}
    mode = repro_cfg.get("crs_match_mode", "projection")
    tol_m = float(repro_cfg.get("resolution_tolerance_m", 1.0))
    errors: List[str] = []
    warnings: List[str] = []
    repro: List[str] = []

    def screen(label: str, fp: Path):
        tf, wkt, epsg, _n = source_grid_info(fp)
        if (wkt or epsg) and not crs_match(wkt, epsg, spatial.crs_wkt,
                                           None, mode=mode):
            repro.append(f"{label}: CRS mismatch ({fp.name})")
        if tf is not None and not resolution_match(tf, spatial.resolution,
                                                   tol_m):
            repro.append(
                f"{label}: resolution mismatch ({abs(tf[1]):.1f}m x "
                f"{abs(tf[3]):.1f}m -> {spatial.resolution}m, {fp.name})")

    for key in ("aoi", "strata"):
        sect = cfg.get(key) or {}
        if sect.get("path"):
            try:
                screen(key, resolver.resolve(sect["path"]))
            except FileNotFoundError as e:
                errors.append(f"{key}: {e}")
    for spec in specs:
        label = f"{spec.category}/{spec.name}/{spec.subsection}"
        try:
            pattern = detect_file_pattern(spec)
        except ValueError as e:
            errors.append(f"{label}: {e}")
            continue
        years = get_year_list(spec, global_window or (0, -1)) \
            if spec.category != "static" else []
        files: List[Path] = []
        if pattern == "per_year":
            for y in (years or [None]):
                try:
                    files.append(resolver.resolve(spec.path, y))
                except FileNotFoundError as e:
                    errors.append(f"{label}: {e}")
        elif pattern == "multiband":
            try:
                files.append(resolver.resolve(spec.path))
            except FileNotFoundError as e:
                errors.append(f"{label}: {e}")
        else:  # per_band
            for band in spec.bands:
                try:
                    fp = resolver.resolve(band.path)
                except FileNotFoundError as e:
                    errors.append(f"{label}/{band.id}: {e}")
                    continue
                files.append(fp)
                n = source_num_bands(fp)
                if spec.year_range:
                    expect = spec.year_range[1] - spec.year_range[0] + 1
                    if n not in (expect, len(years)):
                        errors.append(
                            f"{label}/{band.id}: year range mismatch -- "
                            f"config {expect} years, file {n} bands "
                            f"({fp.name}); this would zero the variable")
                elif n != len(years):
                    # No year_range to rescue a mismatch: the loader's
                    # band-index fallback would pad every requested year.
                    errors.append(
                        f"{label}/{band.id}: {n} bands != "
                        f"{len(years)} requested years and no "
                        f"year_range declared ({fp.name}); this would "
                        "zero the variable")
        for fp in dict.fromkeys(files):
            try:
                screen(label, fp)
                if pattern in ("multiband", "per_year"):
                    n = source_num_bands(fp)
                    for band in spec.bands:
                        if band.source_band is not None and not \
                                (1 <= band.source_band <= n):
                            errors.append(
                                f"{label}/{band.id}: source_band="
                                f"{band.source_band} out of range (file "
                                f"has {n} bands): {fp.name}")
            except Exception as e:  # unreadable/corrupt source
                errors.append(f"{label}: failed to validate {fp}: {e}")
    for item in repro:
        log.warning("reprojection required: %s", item)
    if errors:
        for e in errors:
            log.error("validation: %s", e)
        raise ValueError(
            f"Configuration validation failed with {len(errors)} "
            "error(s): " + "; ".join(errors[:5]))
    return {"errors": errors, "warnings": warnings,
            "reprojection_needed": repro}


# ---------------------------------------------------------------------------
# Build pipeline
# ---------------------------------------------------------------------------

def _require_group(parent: zl.ZarrGroup, name: str) -> zl.ZarrGroup:
    if name in parent:
        g = parent[name]
        if isinstance(g, zl.ZarrGroup):
            return g
    return parent.create_group(name)


def _zarr_compressor(cfg: dict) -> Dict[str, Any]:
    c = (cfg.get("dataset") or {}).get("compressor") or {}
    if c.get("name", "blosc") != "blosc":
        raise ValueError(f"unsupported compressor {c.get('name')!r}")
    return {"id": "blosc", "cname": c.get("cname", "lz4"),
            "clevel": int(c.get("clevel", 3)),
            "shuffle": int(c.get("shuffle", 1)), "blocksize": 0}


def _chunks_for(cfg: dict, category: str, shape: Tuple[int, ...]
                ) -> Tuple[int, ...]:
    spec = ((cfg.get("dataset") or {}).get("default_chunk") or {})
    c = spec.get(category) or spec.get("annual") or {}
    cy = int(c.get("y", 256))
    cx = int(c.get("x", 256))
    if len(shape) == 3:
        return (int(c.get("time", 1)), cy, cx)
    return (cy, cx)


def _load_root_raster(cfg: dict, key: str, spatial: SpatialConfig,
                      resolver: PathResolver, repro_cfg: dict
                      ) -> Optional[np.ndarray]:
    sect = cfg.get(key) or {}
    if not sect.get("path"):
        return None
    r = open_band(resolver.resolve(sect["path"]), 1)
    data = align_to_grid(r, spatial, repro_cfg)
    if key == "aoi":
        return (np.nan_to_num(data) > 0).astype(np.uint8)
    return np.nan_to_num(np.where(np.isnan(data), 0, data)
                         ).astype(np.int16)


def build(cfg: dict, out: Optional[str | Path] = None,
          append: bool = False, path_root: Optional[str | Path] = None,
          scale: int = 1, validate_only: bool = False
          ) -> Optional[zl.ZarrGroup]:
    """Run the full reference pipeline: validate -> aoi/strata -> stream
    every band (load, align, fill, cast, write, stats) -> embed stats +
    sidecars. ``append`` updates the listed variables in an existing
    store, preserving everything else (the evt_only --append ladder)."""
    resolver = PathResolver(path_root)
    spatial = parse_spatial_config(cfg)
    if scale != 1:
        spatial = spatial.scaled(scale)
    specs = parse_group_specs(cfg)
    has_temporal = cfg.get("annual") or cfg.get("irregular")
    global_window = get_global_time_window(cfg) if has_temporal else None
    repro_cfg = (cfg.get("dataset") or {}).get("reprojection") or {}
    dtype_cfg = (cfg.get("dataset") or {}).get("dtype") or {}
    stats_cfg = (cfg.get("dataset") or {}).get("statistics") or {}
    compressor = _zarr_compressor(cfg)

    validate_configuration(cfg, spatial, specs, global_window, resolver)
    if validate_only:
        log.info("validation passed (--validate-only)")
        return None

    out_path = resolver.map(str(
        out or cfg["dataset"]["out_zarr"]["path"]))
    if not append and out_path.exists():
        shutil.rmtree(out_path)
    if append and (out_path / ".zgroup").exists():
        root = zl.ZarrGroup(out_path)
    else:
        out_path.parent.mkdir(parents=True, exist_ok=True)
        root = zl.create_group(out_path)
    root.attrs.setdefault("dataset_name",
                          (cfg["dataset"].get("name") or ""))
    root.attrs["geo_transform"] = list(spatial.grid_transform)
    root.attrs["crs_wkt"] = spatial.crs_wkt
    if global_window:
        root.attrs["time_coords"] = list(range(global_window[0],
                                               global_window[1] + 1))
    root.write_attrs()

    h, w = spatial.shape
    chunks2d = _chunks_for(cfg, "static", (h, w))
    aoi = _load_root_raster(cfg, "aoi", spatial, resolver, repro_cfg)
    if aoi is not None:
        a = root.create_array("aoi", (h, w), chunks2d, np.uint8,
                              fill_value=0, compressor=compressor)
        a[:] = aoi
    strata = _load_root_raster(cfg, "strata", spatial, resolver,
                               repro_cfg)
    if strata is not None:
        s = root.create_array("strata", (h, w), chunks2d, np.int16,
                              fill_value=0, compressor=compressor)
        s[:] = strata
    aoi_mask = aoi if stats_cfg.get("spatial_mask") == "aoi" else None

    gx0, gdx, gy0, gdy = spatial.grid_transform
    y_coords = [gy0 + gdy * (i + 0.5) for i in range(h)]
    x_coords = [gx0 + gdx * (j + 0.5) for j in range(w)]

    all_stats: Dict[str, Dict[str, Any]] = {}
    total = sum(len(s.bands) for s in specs)
    counter = 0
    for spec in specs:
        target_dtype = get_dtype_for_semantic_type(spec.semantic_type,
                                                   dtype_cfg)
        prefix = f"{spec.category}/{spec.name}/{spec.subsection}"
        for band in spec.bands:
            counter += 1
            var_path = f"{prefix}/{band.id}"
            log.info("[%d/%d] %s", counter, total, var_path)
            coords_attrs: Dict[str, Any] = {"y_coords": y_coords,
                                            "x_coords": x_coords}
            if spec.category == "static":
                data, fill = load_static_band(band, spec, spatial,
                                              resolver, repro_cfg)
            elif spec.category == "annual":
                data, fill, yrs = load_annual_band(
                    band, spec, spatial, global_window, resolver,
                    repro_cfg)
                coords_attrs["time_coords"] = yrs
            else:
                data, fill, yrs = load_irregular_band(
                    band, spec, spatial, resolver, repro_cfg)
                coords_attrs["snapshot_coords"] = list(range(len(yrs)))
                coords_attrs["snapshot_year"] = yrs
            stored, fill = _finalize_dtype(data, target_dtype, fill)
            chunks = _chunks_for(
                cfg, spec.category if spec.category != "irregular"
                else "irregular", stored.shape)
            cat_g = _require_group(root, spec.category)
            grp_g = _require_group(cat_g, spec.name)
            sub_g = _require_group(grp_g, spec.subsection)
            sub_g.attrs["semantic_type"] = spec.semantic_type
            sub_g.write_attrs()
            arr = sub_g.create_array(band.id, stored.shape, chunks,
                                     target_dtype, fill_value=fill,
                                     compressor=compressor)
            arr[:] = stored
            st = compute_band_statistics(stored, spec.semantic_type,
                                         aoi_mask)
            all_stats[var_path] = st
            arr.attrs.update({"semantic_type": spec.semantic_type,
                              "category": spec.category,
                              "group": spec.name,
                              "subsection": spec.subsection,
                              **coords_attrs})
            if stats_cfg.get("embed_in_zarr", True):
                arr.attrs["statistics"] = st
            arr.write_attrs()
    if stats_cfg.get("export_json", True):
        export_statistics_json(all_stats,
                               out_path.with_suffix(".stats.json"))
    if stats_cfg.get("export_csv", True):
        export_statistics_csv(all_stats,
                              out_path.with_suffix(".stats.csv"))
    zl.consolidate_metadata(out_path)  # build_zarr.py:2287 parity
    log.info("built %s (%d variables)", out_path, counter)
    return root


# ---------------------------------------------------------------------------
# Source synthesis (CI gate for the verbatim reference YAMLs)
# ---------------------------------------------------------------------------

def synthesize_sources(cfg: dict, path_root: str | Path,
                       scale: int = 1, seed: int = 0) -> List[Path]:
    """Fabricate every raster a dataset YAML references, re-rooted under
    ``path_root``, on the (scaled) config grid: ``.vrt`` paths get a
    real VRT wrapping a multi-page GeoTIFF; others get the GeoTIFF
    directly. Values are seeded per file; categorical bands draw from a
    small class-code alphabet, masks are Bernoulli, and sources whose
    group declares a ``fill_value`` get that sentinel sprinkled in.
    Sources whose path mentions CONUS are synthesized on a LARGER extent
    so the builder's clip path is exercised. All sources share one
    latent TYPE FIELD (smooth seeded blobs): continuous bands are
    per-type base values + noise and categorical bands are per-type
    codes, so cubes built from the synthesized tree carry the cross-band
    spatial correlations contrastive training needs (the
    build_synthetic_v2_cube recipe). Returns the files written."""
    resolver = PathResolver(path_root)
    spatial = parse_spatial_config(cfg)
    if scale != 1:
        spatial = spatial.scaled(scale)
    specs = parse_group_specs(cfg)
    has_temporal = cfg.get("annual") or cfg.get("irregular")
    window = get_global_time_window(cfg) if has_temporal else None

    # file path -> {bands, semantic, sentinel}
    plans: Dict[Path, Dict[str, Any]] = {}

    def plan(pattern: str, year: Optional[int], n_bands: int,
             semantic: str, sentinel: Optional[float]):
        fp = resolver.map(pattern, year)
        p = plans.setdefault(fp, {"bands": 0, "semantic": semantic,
                                  "sentinel": None,
                                  "vrt": pattern.lower().endswith(".vrt")})
        p["bands"] = max(p["bands"], n_bands)
        if sentinel is not None:
            p["sentinel"] = sentinel
        # A file shared by several subsections is synthesized once; data
        # semantics win over mask reuse (a continuous band read from a
        # Bernoulli 0/1 plane would be garbage), categorical over both
        # (codes survive a continuous read, not vice versa).
        pri = {"mask": 0, "continuous": 1, "categorical": 2}
        if pri.get(semantic, 1) > pri.get(p["semantic"], 1):
            p["semantic"] = semantic

    for key in ("aoi", "strata"):
        sect = cfg.get(key) or {}
        if sect.get("path"):
            plan(sect["path"], None, 1,
                 "mask" if key == "aoi" else "categorical", None)
    for spec in specs:
        sentinel = None
        for fv in [spec.fill_value] + [b.fill_value for b in spec.bands]:
            if fv and isinstance(fv.get("source"), (int, float)):
                sentinel = float(fv["source"])
        pattern = detect_file_pattern(spec)
        if pattern == "per_band":
            n = len(get_year_list(spec, window or (0, -1))) \
                if spec.category != "static" else 1
            if spec.year_range:
                n = spec.year_range[1] - spec.year_range[0] + 1
            for band in spec.bands:
                plan(band.path, None, n, spec.semantic_type, sentinel)
        else:
            need = max((b.source_band or 1) for b in spec.bands)
            if pattern == "per_year":
                years = get_year_list(spec, window or (0, -1)) or [None]
                for y in years:
                    plan(spec.path, y, need, spec.semantic_type, sentinel)
            else:  # multiband: static needs source_band range; annual
                   # multiband needs band_start + years - 1
                if spec.category == "annual":
                    ys = get_year_list(spec, window or (0, -1))
                    need = max(need, (min((b.source_band or 1)
                                          for b in spec.bands)
                                      + len(ys) - 1))
                plan(spec.path, None, need, spec.semantic_type, sentinel)

    h, w = spatial.shape
    gx0, gdx, gy0, gdy = spatial.grid_transform
    # One latent type field over the padded union grid: smooth seeded
    # blobs (8x kron upsample of coarse noise), sliced per-file window.
    max_pad = 8
    hu, wu = h + 2 * max_pad, w + 2 * max_pad
    rng0 = np.random.default_rng((seed, 0))
    n_types = 12
    coarse = rng0.normal(size=(n_types, hu // 8 + 2, wu // 8 + 2))
    up = np.kron(coarse, np.ones((1, 8, 8)))[:, :hu, :wu]
    type_map_u = up.argmax(0)                       # [hu, wu]
    codes = np.asarray([7008, 7009, 7010, 7011, 7046, 7061,
                        7062, 7064, 9014, 9015, 9016, 9017])

    written: List[Path] = []
    for fp, p in sorted(plans.items()):
        fp.parent.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(
            (seed, hash(str(fp)) & 0x7FFFFFFF))
        big = "CONUS" in str(fp)
        pad = max_pad if big else 0
        hh, ww = h + 2 * pad, w + 2 * pad
        tf = (gx0 - pad * gdx, gdx, gy0 - pad * gdy, gdy)
        o = max_pad - pad
        tmap = type_map_u[o:o + hh, o:o + ww]
        n = max(1, int(p["bands"]))
        if p["semantic"] == "categorical":
            bands = np.broadcast_to(codes[tmap], (n, hh, ww)) \
                .astype(np.int32).copy()
            nodata = -32768.0
            bands[:, :2, :2] = -32768
        elif p["semantic"] == "mask":
            bands = (rng.random((n, hh, ww)) > 0.35).astype(np.uint8)
            nodata = None
        else:
            # per-(band, type) base value + pixel noise: spatially
            # structured, cross-band correlated through the type field
            base = rng.normal(0.0, 1.0, (n, n_types)).astype(np.float32)
            bands = (base[:, tmap]
                     + rng.normal(0, 0.3, (n, hh, ww))
                     ).astype(np.float32)
            nodata = p["sentinel"]
            if nodata is not None:
                hole = rng.random((n, hh, ww)) < 0.01
                bands = np.where(hole, np.float32(nodata), bands)
        if p["vrt"]:
            tile = fp.with_name(fp.stem + "_tiles.tif")
            rio.write_multiband_geotiff(tile, bands, transform=tf,
                                        nodata=nodata,
                                        crs_wkt=spatial.crs_wkt)
            vrtmod.write_vrt(fp, (hh, ww),
                             [[(tile.name, i + 1)] for i in range(n)],
                             transform=tf, crs_wkt=spatial.crs_wkt,
                             nodata=nodata, dtype=bands.dtype)
            written.extend([tile, fp])
        else:
            rio.write_multiband_geotiff(fp, bands, transform=tf,
                                        nodata=nodata,
                                        crs_wkt=spatial.crs_wkt)
            written.append(fp)
    return written


# ---------------------------------------------------------------------------
# CLI (build_zarr.py:2068-2111)
# ---------------------------------------------------------------------------

def main(argv: Optional[Sequence[str]] = None) -> None:
    ap = argparse.ArgumentParser(
        description="Build a hierarchical Zarr feature cube from a "
        "reference-schema dataset YAML.")
    ap.add_argument("config", type=Path)
    ap.add_argument("--out", type=Path, default=None,
                    help="override dataset.out_zarr.path")
    ap.add_argument("--append", action="store_true")
    ap.add_argument("--validate-only", action="store_true")
    ap.add_argument("--verbose", "-v", action="store_true")
    ap.add_argument("--log-file", default=None)
    ap.add_argument("--ncore", type=int, default=1,
                    help="accepted for reference-CLI parity (this host "
                    "builds sequentially)")
    ap.add_argument("--path-root", default=None,
                    help="re-root absolute source paths under this dir")
    ap.add_argument("--scale", type=int, default=1,
                    help="coarsen the grid N-fold (testing lever)")
    ap.add_argument("--synthesize-sources", action="store_true",
                    help="fabricate every referenced source under "
                    "--path-root before building")
    a = ap.parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if a.verbose else logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s")
    if a.log_file:
        logging.getLogger().addHandler(logging.FileHandler(a.log_file,
                                                           mode="a"))
    cfg = load_config(a.config)
    if a.synthesize_sources:
        if not a.path_root:
            raise SystemExit("--synthesize-sources requires --path-root")
        n = len(synthesize_sources(cfg, a.path_root, scale=a.scale))
        log.info("synthesized %d source files under %s", n, a.path_root)
    build(cfg, out=a.out, append=a.append, path_root=a.path_root,
          scale=a.scale, validate_only=a.validate_only)


if __name__ == "__main__":
    main()
