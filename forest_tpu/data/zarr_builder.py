"""YAML-driven hierarchical cube builder (zarr_builder v2 equivalent).

Behavioral contract from /root/reference/zarr_builder/build_zarr.py (SURVEY.md
§2.2): a YAML spec defines the spatial grid, time axis, chunking/compression,
and per-group band sources; the builder validates the config, loads each
band, writes the hierarchical ``annual/<group>/<kind>/<band>`` /
``static/<group>/<kind>/<band>`` layout, computes per-variable statistics
embedded in zarr attrs plus JSON/CSV sidecars, and supports ``--append``.

Source formats: the reference ingests COG rasters via rioxarray; here a
band source is one of

- ``.npy`` file / ``.npz`` member (``file.npz:key``), [H, W] or [T, H, W];
- a single ``.tif``/``.tiff`` GeoTIFF (static bands), decoded by
  ``data/raster.py`` -- its GDAL_NODATA becomes NaN on float bands, and
  the first GeoTIFF's geo-transform is stamped into the cube's
  ``geo_transform`` attr (consumed by eval/embed_locations --map-coords);
- a glob of per-year GeoTIFFs (``ndvi_*.tif``, sorted) stacked to
  [T, H, W] for annual bands.

GeoTIFF sources must share one grid by default (``raster.assert_aligned``,
the reference's aligned-COG fast path). A band may instead declare
``resample: nearest|bilinear`` to be regridded onto the cube grid --
including across WGS84/UTM <-> geographic CRSs via the GeoTIFF's EPSG
geokey (``data/reproject.py``, the align_to_template contract of
/root/reference/utils/rasterio.py:158-201). GEE export provenance
(SURVEY.md §2.1) stays upstream of this builder in both codebases.

Spec YAML:
  output: cube.zarr
  spatial: {height: H, width: W, chunk_y: 256, chunk_x: 256}
  time: {start: 2010, end: 2024}
  compression: {cname: lz4, clevel: 3}
  aoi: path.npy            # optional [H, W]
  groups:
    - name: ccdc
      kind: annual         # or static
      category: data       # data | mask | quality
      dtype: float16
      fill_value: .nan
      bands:
        - {name: ndvi, source: ndvi.npy, scale_factor: 1.0}
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np
import yaml

from forest_tpu.data import zarrlite as zl
from forest_tpu.data.io import write_json, write_tsv


def _load_source_ex(source: str, base: Path):
    """-> (array, Raster-or-None): the Raster carries grid metadata when
    the source is GeoTIFF so build_cube can check alignment and stamp the
    cube's geo_transform attr."""
    if source == "zeros":
        raise ValueError("'zeros'/'ones' need explicit shape via spatial")
    low = source.lower()
    if low.endswith((".tif", ".tiff")):
        # Raw values; GDAL_NODATA handling happens in build_cube where the
        # TARGET band dtype is known (NaN for float bands, the band's
        # fill_value for integer bands).
        from forest_tpu.data import raster as rio
        if "*" in source or "?" in source:
            return rio.read_year_stack(source, base, masked=False)
        r = rio.read_geotiff(base / source)
        return r.data, r
    if ":" in source and not source.endswith(".npy"):
        fp, key = source.rsplit(":", 1)
        with np.load(base / fp) as z:
            return np.asarray(z[key]), None
    return np.load(base / source), None


def _load_source(source: str, base: Path) -> np.ndarray:
    return _load_source_ex(source, base)[0]


def validate_spec(spec: Dict[str, Any]) -> List[str]:
    """Config validation (build_zarr.py:1741-2067 contract): required keys,
    dimension consistency, dtype validity. Returns a list of problems."""
    problems = []
    if "output" not in spec:
        problems.append("missing 'output'")
    sp = spec.get("spatial") or {}
    for k in ("height", "width"):
        if k not in sp:
            problems.append(f"missing spatial.{k}")
    t = spec.get("time") or {}
    has_annual = any(g.get("kind") == "annual"
                     for g in spec.get("groups", []))
    if has_annual and ("start" not in t or "end" not in t):
        problems.append("annual groups need time.start/end")
    for g in spec.get("groups", []):
        if "name" not in g:
            problems.append("group missing name")
        if g.get("kind") not in ("annual", "static"):
            problems.append(f"group {g.get('name')}: bad kind")
        try:
            np.dtype(g.get("dtype", "float32"))
        except TypeError:
            problems.append(f"group {g.get('name')}: bad dtype")
        for b in g.get("bands", []):
            if "name" not in b or "source" not in b:
                problems.append(f"group {g.get('name')}: band needs "
                                "name+source")
            if b.get("resample") not in (None, "nearest", "bilinear"):
                problems.append(f"group {g.get('name')}: bad resample "
                                f"{b.get('resample')!r} (nearest|bilinear)")
    return problems


def _band_stats(data: np.ndarray,
                semantic_type: str = "continuous") -> Dict[str, Any]:
    """Per-variable statistics BY SEMANTIC TYPE (build_zarr.py:1163-1346):
    percentiles are meaningless for class codes, so categorical bands get
    class-count histograms and mask bands get true/false counts instead
    (the reference's `statistics: {categorical: histogram, boolean:
    [true_count, false_count, true_fraction]}` contract)."""
    v = data[np.isfinite(data)]
    if v.size == 0:
        return {"n_valid": 0}
    if semantic_type == "categorical":
        ids, counts = np.unique(v.astype(np.int64), return_counts=True)
        return {"n_valid": int(v.size),
                "histogram": {int(i): int(c)
                              for i, c in zip(ids, counts)},
                "num_classes": int(len(ids))}
    if semantic_type == "mask":
        true_count = int((v > 0).sum())
        false_count = int((v == 0).sum())
        total = true_count + false_count
        return {"n_valid": int(v.size),
                "true_count": true_count, "false_count": false_count,
                "true_fraction": true_count / total if total else 0.0}
    return {
        "n_valid": int(v.size),
        "mean": float(v.mean()), "sd": float(v.std()),
        "min": float(v.min()), "max": float(v.max()),
        "q02": float(np.percentile(v, 2)),
        "q25": float(np.percentile(v, 25)),
        "q50": float(np.percentile(v, 50)),
        "q75": float(np.percentile(v, 75)),
        "q98": float(np.percentile(v, 98)),
    }


def build_cube(spec: Dict[str, Any], base_dir: str | Path = ".",
               append: bool = False) -> zl.ZarrGroup:
    problems = validate_spec(spec)
    if problems:
        raise ValueError("invalid spec: " + "; ".join(problems))
    base = Path(base_dir)
    out = base / spec["output"]
    sp = spec["spatial"]
    h, w = int(sp["height"]), int(sp["width"])
    cy, cx = int(sp.get("chunk_y", 256)), int(sp.get("chunk_x", 256))
    comp = dict(zl.DEFAULT_COMPRESSOR)
    comp.update(spec.get("compression", {}) or {})

    t_cfg = spec.get("time") or {}
    years = list(range(int(t_cfg.get("start", 0)),
                       int(t_cfg.get("end", -1)) + 1))

    created_fresh = not (append and (out / ".zgroup").exists())
    if not created_fresh:
        root = zl.ZarrGroup(out)
    else:
        root = zl.create_group(out)
        root.attrs["time_coords"] = years
        root.attrs["geo_transform"] = spec.get("geo_transform",
                                               [0.0, 30.0, 0.0, -30.0])
        root.write_attrs()

    if spec.get("aoi"):
        aoi = np.asarray(_load_source(spec["aoi"], base), np.uint8)
        a = root.create_array("aoi", (h, w), (cy, cx), np.uint8,
                              fill_value=0, compressor=comp)
        a[:] = aoi
    elif "aoi" not in root:
        a = root.create_array("aoi", (h, w), (cy, cx), np.uint8,
                              fill_value=0, compressor=comp)
        a[:] = np.ones((h, w), np.uint8)

    stats_all: Dict[str, Dict] = {}
    grid_raster = None  # first GeoTIFF source: alignment anchor + attr

    # Prescan for the grid anchor so a `resample:` band can never fall
    # back to its OWN (misaligned) grid just because it appears before
    # the first aligned GeoTIFF in the spec: the target grid is the spec
    # geo_transform, else the first non-resampled GeoTIFF's transform
    # (tags only, no pixel decode), else resampling is an error.
    anchor_tf = spec.get("geo_transform")
    anchor_epsg = spec.get("epsg")
    if anchor_tf is None:
        import glob as _glob

        from forest_tpu.data.raster import read_geotiff_tags
        for g_ in spec.get("groups", []):
            for b_ in g_.get("bands", []):
                src = b_["source"]
                if b_.get("resample") \
                        or not src.lower().endswith((".tif", ".tiff")):
                    continue
                paths = sorted(_glob.glob(str(base / src))) \
                    if ("*" in src or "?" in src) else [base / src]
                if paths:
                    tf, _, ep = read_geotiff_tags(paths[0])
                    if tf is not None:
                        anchor_tf = tf
                        anchor_epsg = anchor_epsg or ep
                        break
            if anchor_tf is not None:
                break
    for g in spec.get("groups", []):
        kind = g["kind"]
        category = g.get("category", "data")
        dtype = np.dtype(g.get("dtype", "float32"))
        fv = g.get("fill_value", float("nan")
                   if dtype.kind == "f" else 0)
        top = "annual" if kind == "annual" else "static"
        for b in g.get("bands", []):
            data, rmeta = _load_source_ex(b["source"], base)
            data = np.asarray(data)
            resample = b.get("resample")
            if rmeta is not None and resample:
                # Misaligned source with an explicit resampling mode:
                # regrid onto the cube grid (reference align_to_template,
                # utils/rasterio.py:180-201) instead of rejecting. The
                # target grid is the spec geo_transform or the first
                # strictly-aligned GeoTIFF's; a resampled source never
                # anchors the grid itself.
                from forest_tpu.data import reproject as rpj
                if rmeta.transform is None:
                    raise ValueError(f"{b['source']}: resample needs a "
                                     "geo-transform on the source")
                if anchor_tf is None:
                    raise ValueError(
                        f"{b['source']}: resample has no target grid -- "
                        "set spec geo_transform or include at least one "
                        "aligned (non-resample) GeoTIFF band")
                tgt_tf, dst_epsg = anchor_tf, anchor_epsg
                planes = data if data.ndim == 3 else data[None]
                planes = np.stack([
                    rpj.align_to_grid(p, rmeta.transform, tgt_tf, (h, w),
                                      src_epsg=rmeta.epsg,
                                      dst_epsg=dst_epsg,
                                      resampling=resample,
                                      nodata=rmeta.nodata)
                    for p in planes])
                data = planes if data.ndim == 3 else planes[0]
                if dtype.kind != "f":  # NaN cannot live in an int band
                    data = np.where(np.isnan(data), fv, data)
            elif rmeta is not None:
                if grid_raster is None:
                    grid_raster = rmeta
                else:
                    from forest_tpu.data.raster import assert_aligned
                    assert_aligned(grid_raster, rmeta,
                                   names=("first GeoTIFF source",
                                          b["source"]))
                if rmeta.nodata is not None:
                    # Map the raster's nodata sentinel by TARGET dtype:
                    # NaN for float bands (the cube fill contract), the
                    # band's fill_value for integer bands -- regardless of
                    # the SOURCE dtype (an int source feeding a float band
                    # must not leak the sentinel into data/stats).
                    sentinel = np.asarray(rmeta.nodata, data.dtype) \
                        if np.dtype(data.dtype).kind != "f" \
                        else np.asarray(rmeta.nodata, np.float64)
                    hit = data == sentinel
                    if dtype.kind == "f":
                        data = np.where(hit, np.nan,
                                        data.astype(np.float64))
                    else:
                        data = np.where(hit, fv, data)
            scale = float(b.get("scale_factor", 1.0))
            offset = float(b.get("add_offset", 0.0))
            if kind == "annual":
                if data.ndim != 3 or data.shape[1:] != (h, w):
                    raise ValueError(
                        f"{g['name']}/{b['name']}: expected [T,{h},{w}], "
                        f"got {data.shape}")
                shape, chunks = (len(years), h, w), (1, cy, cx)
                if data.shape[0] != len(years):
                    raise ValueError(
                        f"{g['name']}/{b['name']}: T={data.shape[0]} != "
                        f"{len(years)} config years")
            else:
                if data.shape != (h, w):
                    raise ValueError(
                        f"{g['name']}/{b['name']}: expected [{h},{w}], "
                        f"got {data.shape}")
                shape, chunks = (h, w), (cy, cx)
            path = f"{top}/{g['name']}/{category}/{b['name']}"
            from forest_tpu.data.cube_v2 import create_band
            arr = create_band(root, path, shape, chunks, dtype, fill=fv)
            stored = (data.astype(np.float64) - offset) / scale \
                if (scale != 1.0 or offset != 0.0) else data
            arr[:] = stored.astype(dtype)
            # Statistics describe the STORED values (what every reader --
            # ZarrStatsLoader, ForestDatasetV2 -- actually consumes);
            # physical units are recoverable via scale_factor/add_offset.
            st = _band_stats(np.asarray(stored, np.float64),
                             g.get("semantic_type", "continuous"))
            arr.attrs.update({"scale_factor": scale, "add_offset": offset,
                              "semantic_type": g.get("semantic_type",
                                                     "continuous"),
                              "category": category, "group": g["name"],
                              "statistics": st})
            arr.write_attrs()
            stats_all[path] = st

    # GeoTIFF-derived georeferencing: explicit spec wins, else the first
    # raster source's transform replaces the placeholder default on any
    # cube CREATED by this invocation (--append onto an existing cube
    # keeps its attrs).
    if grid_raster is not None and grid_raster.transform is not None \
            and "geo_transform" not in spec and created_fresh:
        root.attrs["geo_transform"] = [float(v)
                                       for v in grid_raster.transform]
        root.write_attrs()

    # sidecars (build_zarr.py:1059-1740 contract)
    write_json(out.with_suffix(".stats.json"), stats_all)
    rows = [[k] + [v.get(s, "") for s in
                   ("n_valid", "mean", "sd", "min", "max", "q50")]
            for k, v in stats_all.items()]
    write_tsv(out.with_suffix(".stats.tsv"), rows,
              header=["band", "n_valid", "mean", "sd", "min", "max", "q50"])
    return root


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--base-dir", default=None)
    ap.add_argument("--append", action="store_true")
    ap.add_argument("--validate-only", action="store_true")
    a = ap.parse_args(argv)
    spec = yaml.safe_load(Path(a.config).read_text())
    if a.validate_only:
        problems = validate_spec(spec)
        if problems:
            raise SystemExit("invalid: " + "; ".join(problems))
        print("spec OK")
        return
    base = a.base_dir or Path(a.config).parent
    root = build_cube(spec, base, a.append)
    print(f"built {root.path}")


if __name__ == "__main__":
    main()
