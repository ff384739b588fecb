"""CSV-manifest raster stacking for the raster -> cube pipeline.

Dask-free port of ``/root/reference/utils/data_stack.py:45-419``: a CSV
manifest of per-feature rasters (year/kind/fid/path, headered with alias
tolerance or headerless with column sniffing) is indexed, validated for
cross-year feature consistency, and assembled lazily into the legacy flat
cube (``forest_tpu/data/cube.py``). The reference keeps the whole
(time, y, x, feature) array as a dask graph; here laziness is structural
instead: :class:`ManifestStack` reads ONE (year, feature) raster at a
time into the mask grid (``read_into_mask_grid`` =
``/root/reference/utils/raster_ops.py:56-83``, boundless read with NaN
fill), so peak memory is a single [H, W] band no matter the cube size —
the right shape for this image's 1-core host, where dask's thread-pooled
graph execution would buy nothing.

Feature-kind semantics match the reference ("int" = continuous, "cat" =
categorical codes < 255). Metadata mirrors
``data_stack.compute_feature_metadata``/``compute_naip_metadata``:
masked min/max/mean/std + q01/q25/q50/q75/q99 for continuous features
(exact — the reference's dask quantiles are exact too), fixed-bin 0..254
class histograms for categoricals, per-band quantiles for NAIP patches.
"""
from __future__ import annotations

import csv
import os
import re
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from forest_tpu.data import raster as rio


# ---------------------------------------------------------------------
# Year selection (data_stack.py:45-52)
# ---------------------------------------------------------------------
def select_years(end_years: Sequence[int], window_len: int) -> List[int]:
    """All years needed so every ``end_year`` has a full look-back window."""
    years = set()
    for e in end_years:
        for y in range(int(e) - int(window_len) + 1, int(e) + 1):
            years.add(int(y))
    out = sorted(years)
    if not out:
        raise ValueError("No years selected.")
    return out


# ---------------------------------------------------------------------
# Tolerant manifest parsing.
#
# Compat contract with data_stack.index_inputs (data_stack.py:57-230):
# the same manifests parse to the same {year: roster} index -- headered
# files with column aliases, headerless files with content-sniffed
# columns, comments/blank lines anywhere, comma/tab/whitespace
# separators. The implementation is a role-resolution pipeline: one
# cell-classifier table drives both the header normalizer and the
# headerless column sniffer, and both routes feed a single record
# builder.
# ---------------------------------------------------------------------

# Canonical column role for every header spelling the manifests use.
_ROLE_OF_ALIAS = {alias: role for role, aliases in (
    ("year", ("year", "yr")),
    ("kind", ("kind", "type")),
    ("path", ("file_path", "filepath", "path")),
    ("fid", ("fid", "feature", "feature_id", "name")),
) for alias in aliases}

_KINDS = frozenset(("int", "cat"))


def _cell_is_year(cell: str) -> bool:
    try:
        int(cell.strip())
    except (ValueError, TypeError):
        return False
    return True


def _cell_is_kind(cell: str) -> bool:
    return cell.strip().lower() in _KINDS


def _cell_is_path(cell: str) -> bool:
    cell = cell.strip()
    return ("/" in cell or "\\" in cell
            or "." in os.path.basename(cell))


# Content predicates, in resolution order, for headerless sniffing.
_CONTENT_SNIFF = (("year", _cell_is_year), ("kind", _cell_is_kind),
                  ("path", _cell_is_path))


def _stem(p: str) -> str:
    return os.path.splitext(os.path.basename(p))[0]


def _content_lines(path: str):
    """Non-comment, non-blank lines of the manifest."""
    with open(path, "r", encoding="utf-8") as f:
        for raw in f:
            line = raw.strip()
            if line and not line.startswith("#"):
                yield line


def _split_cells(line: str) -> List[str]:
    """Separator precedence for headerless rows: comma, then tab, then
    runs of whitespace."""
    for sep in (",", "\t"):
        if sep in line:
            return [c.strip() for c in line.split(sep)]
    return re.split(r"\s+", line)


def _records_headered(features_csv: str):
    """(year, kind, path, fid_cell, row) tuples via csv.reader -- the
    headered route honors quoting, so rows go through a sniffed csv
    dialect rather than the loose splitter."""
    with open(features_csv, "r", encoding="utf-8") as f:
        probe = f.read(4096)
        f.seek(0)
        try:
            dialect = csv.Sniffer().sniff(probe, delimiters=",\t; ")
        except csv.Error:
            dialect = csv.excel
        rows = csv.reader(f, dialect)
        col: Dict[str, int] = {}
        for row in rows:  # first non-comment, non-blank row is the header
            if not row or not row[0].strip() \
                    or row[0].strip().startswith("#"):
                continue
            for i, cell in enumerate(row):
                role = _ROLE_OF_ALIAS.get(cell.strip().lower())
                if role is not None and role not in col:
                    col[role] = i
            n_cols = len(row)
            break
        else:
            return
        if not all(r in col for r in ("year", "kind", "path")):
            raise ValueError(
                "Manifest header needs year, kind and path columns "
                f"(aliases accepted); resolved {sorted(col)} from "
                f"{features_csv}")
        for row in rows:
            if not row or (len(row) == 1 and not row[0].strip()):
                continue
            if row[0].strip().startswith("#"):
                continue
            row = row + [""] * (n_cols - len(row))  # trailing blanks
            if not _cell_is_year(row[col["year"]]):
                continue  # tolerated, like the reference (warn + skip)
            fid_cell = row[col["fid"]].strip() if "fid" in col else ""
            yield (int(row[col["year"]]),
                   row[col["kind"]].strip().lower(),
                   row[col["path"]].strip(), fid_cell, row)


def _records_headerless(features_csv: str):
    """(year, kind, path, fid_cell, row) tuples with columns resolved
    per row by cell content (_CONTENT_SNIFF)."""
    for line in _content_lines(features_csv):
        cells = _split_cells(line)
        if any(c.lower() in ("year", "yr", "type", "kind")
               for c in cells):
            continue  # stray header fragment
        at: Dict[str, Optional[int]] = {
            role: next((i for i, c in enumerate(cells) if pred(c)), None)
            for role, pred in _CONTENT_SNIFF}
        if None in at.values():
            raise ValueError("cannot resolve year/kind/path columns in "
                             f"headerless manifest row: {cells}")
        taken = set(at.values())
        fid_cell = next((cells[i].strip() for i in range(len(cells))
                         if i not in taken), "")
        # a leftover cell that itself reads as a year/kind/path is not a
        # usable feature id -- fall back to the file stem
        if fid_cell and any(pred(fid_cell) for _, pred in _CONTENT_SNIFF):
            fid_cell = ""
        yield (int(cells[at["year"]]), cells[at["kind"]].strip().lower(),
               cells[at["path"]].strip(), fid_cell, cells)


def index_inputs(features_csv: str | Path,
                 needed_years: Sequence[int]) -> Dict[int, List[Dict]]:
    """Manifest -> {year: [{fid, kind, path}, ...]} sorted by fid.

    Headered files may alias columns (year|yr, kind|type,
    file_path|filepath|path, fid|feature|feature_id|name); headerless
    files are column-sniffed (year = parses as int, kind = int|cat,
    path = has a separator or extension, fid = the leftover column or
    the file stem). Same accepted inputs and resulting index as
    data_stack.index_inputs.
    """
    features_csv = str(features_csv)
    first = next(_content_lines(features_csv), None)
    if first is None:
        raise ValueError(f"Empty features file: {features_csv}")
    # A manifest is headered iff its first content line names a year
    # column; only then is a full alias header worth resolving.
    headered = any(_ROLE_OF_ALIAS.get(tok.lower()) == "year"
                   for tok in re.split(r"[,\t\s]+", first))
    records = (_records_headered if headered
               else _records_headerless)(features_csv)

    y2f: Dict[int, List[Dict]] = {int(y): [] for y in needed_years}
    for year, kind, path, fid_cell, row in records:
        if kind not in _KINDS:
            raise ValueError(f"feature kind must be 'int' or 'cat', "
                             f"got {kind!r} in manifest row: {row}")
        if not path:
            raise ValueError(f"manifest row has no path: {row}")
        if year in y2f:
            y2f[year].append({"fid": fid_cell or _stem(path),
                              "kind": kind, "path": path})

    for year in y2f:
        y2f[year].sort(key=lambda r: r["fid"])
    missing = [y for y in (int(v) for v in needed_years) if not y2f[y]]
    if missing:
        raise ValueError(f"No features found for year={missing[0]}. "
                         f"Check {features_csv}.")
    return y2f


def enforce_consistent_features(
        y2f: Dict[int, List[Dict]],
        needed_years: Sequence[int]) -> Tuple[List[str], List[str]]:
    """Every year must list the same (fid, kind) roster in the same order
    (data_stack.enforce_consistent_features)."""
    base = y2f[int(needed_years[0])]
    base_fids = [r["fid"] for r in base]
    base_kinds = [r["kind"] for r in base]
    for y in (int(v) for v in needed_years):
        fids = [r["fid"] for r in y2f[y]]
        kinds = [r["kind"] for r in y2f[y]]
        if fids != base_fids or kinds != base_kinds:
            raise ValueError(
                f"Inconsistent features in year={y}. Expected "
                f"fids={base_fids} kinds={base_kinds} but got "
                f"fids={fids} kinds={kinds}")
    return base_fids, base_kinds


# ---------------------------------------------------------------------
# Boundless read into the mask grid (raster_ops.py:56-83)
# ---------------------------------------------------------------------
def read_into_mask_grid(ds_path: str | Path,
                        mask_shape: Tuple[int, int],
                        mask_transform: Sequence[float],
                        dtype=np.float32) -> np.ndarray:
    """Read a single-band raster into the (H, W) mask grid.

    The window is located by map coordinates through both transforms;
    pixels outside the source are NaN (rasterio's ``boundless=True,
    fill_value=nan`` contract). Same CRS/resolution assumed — pixel sizes
    must match to 1e-6 relative (there is no resampling backend in this
    image; the reference makes the same same-grid assumption at
    raster_ops.py:73).
    """
    H, W = int(mask_shape[0]), int(mask_shape[1])
    r = rio.read_geotiff(ds_path)
    if r.transform is None:
        raise ValueError(f"{ds_path}: no geo-transform; cannot window "
                         "into the mask grid")
    mx0, mdx, my0, mdy = [float(v) for v in mask_transform]
    sx0, sdx, sy0, sdy = r.transform
    if not (np.isclose(mdx, sdx, rtol=1e-6)
            and np.isclose(mdy, sdy, rtol=1e-6)):
        raise ValueError(
            f"{ds_path}: pixel size ({sdx}, {sdy}) != mask grid "
            f"({mdx}, {mdy}); sources must be pre-aligned (no resampling)")
    c0 = int(round((mx0 - sx0) / sdx))
    r0 = int(round((my0 - sy0) / sdy))

    data = r.data
    if data.ndim == 3:
        data = data[..., 0]
    out = np.full((H, W), np.nan, dtype)
    rs, re_ = max(r0, 0), min(r0 + H, data.shape[0])
    cs, ce = max(c0, 0), min(c0 + W, data.shape[1])
    if rs < re_ and cs < ce:
        src = np.asarray(data[rs:re_, cs:ce], dtype)
        if r.nodata is not None:
            src = np.where(src == np.asarray(r.nodata, src.dtype),
                           np.nan, src)
        out[rs - r0:re_ - r0, cs - c0:ce - c0] = src
    return out


# ---------------------------------------------------------------------
# Lazy stack
# ---------------------------------------------------------------------
class ManifestStack:
    """Lazy (time, y, x, feature) view over manifest rasters.

    Equivalent of ``data_stack.stack_attrs_raw_spatial`` without dask:
    nothing is read at construction; ``read_feature`` materializes one
    [H, W] band, ``read_year`` one [H, W, F] slab. Iteration order is the
    validated per-year fid-sorted roster.
    """

    def __init__(self, y2f: Dict[int, List[Dict]],
                 needed_years: Sequence[int],
                 mask_shape: Tuple[int, int],
                 mask_transform: Sequence[float],
                 base_dir: str | Path = "."):
        self.years = [int(y) for y in needed_years]
        self.fids, self.kinds = enforce_consistent_features(y2f, self.years)
        self._y2f = y2f
        self.mask_shape = (int(mask_shape[0]), int(mask_shape[1]))
        self.mask_transform = [float(v) for v in mask_transform]
        self.base = Path(base_dir)

    @property
    def shape(self) -> Tuple[int, int, int, int]:
        H, W = self.mask_shape
        return (len(self.years), H, W, len(self.fids))

    def _path(self, ti: int, fi: int) -> Path:
        rec = self._y2f[self.years[ti]][fi]
        p = Path(rec["path"])
        return p if p.is_absolute() else self.base / p

    def read_feature(self, ti: int, fi: int,
                     dtype=np.float32) -> np.ndarray:
        """[H, W] band for (year index, feature index), NaN outside."""
        return read_into_mask_grid(self._path(ti, fi), self.mask_shape,
                                   self.mask_transform, dtype)

    def read_year(self, ti: int, dtype=np.float32) -> np.ndarray:
        """[H, W, F] slab for one year."""
        return np.stack([self.read_feature(ti, fi, dtype)
                         for fi in range(len(self.fids))], axis=-1)


# ---------------------------------------------------------------------
# Metadata (data_stack.py:313-419)
# ---------------------------------------------------------------------
_QS = (0.01, 0.25, 0.50, 0.75, 0.99)


def compute_feature_metadata(stack: ManifestStack,
                             mask: np.ndarray) -> Dict:
    """Masked per-feature stats over all years.

    Continuous ("int"): min/max/mean/std + q01/q25/q50/q75/q99 (exact —
    per-feature masked values are gathered one feature at a time, so peak
    memory is T * n_masked floats). Categorical ("cat"): class counts for
    codes 0..254, non-finite dropped. Matches
    ``data_stack.compute_feature_metadata``'s output schema.
    """
    m = np.asarray(mask).astype(bool)
    if m.shape != stack.mask_shape:
        raise ValueError(f"mask {m.shape} != grid {stack.mask_shape}")
    values = [np.concatenate([stack.read_feature(ti, fi)[m]
                              for ti in range(len(stack.years))])
              for fi in range(len(stack.fids))]
    return _metadata_from_values(stack.fids, stack.kinds, values)


def _metadata_from_values(fids: Sequence[str], kinds: Sequence[str],
                          values: Sequence[np.ndarray]) -> Dict:
    """Metadata from already-gathered masked per-feature value arrays
    (lets the cube builder reuse its write-pass reads, 1x IO)."""
    meta: Dict = {"features": []}
    for name, kind, v in zip(fids, kinds, values):
        v = np.asarray(v, np.float64).ravel()
        v = v[np.isfinite(v)]
        if kind == "int":
            if v.size == 0:
                stats = {k: float("nan") for k in
                         ("min", "max", "mean", "std",
                          "q01", "q25", "q50", "q75", "q99")}
            else:
                q = np.quantile(v, _QS)
                stats = {"min": float(v.min()), "max": float(v.max()),
                         "mean": float(v.mean()), "std": float(v.std()),
                         "q01": float(q[0]), "q25": float(q[1]),
                         "q50": float(q[2]), "q75": float(q[3]),
                         "q99": float(q[4])}
            meta["features"].append(
                {"name": name, "kind": "int", "stats": stats})
        else:
            codes = np.clip(np.round(v), 0, 254).astype(np.int64)
            counts = np.bincount(codes, minlength=255)
            classes = [{"code": int(k), "count": int(n)}
                       for k, n in enumerate(counts) if n > 0]
            meta["features"].append(
                {"name": name, "kind": "cat", "classes": classes})
    return meta


def compute_naip_metadata(naip_patch: np.ndarray, mask: np.ndarray, *,
                          include_source: Optional[str] = None) -> Dict:
    """Per-band robust quantiles for a [H, W, krow, kcol, band] patch
    array, masked by ``mask`` (data_stack.compute_naip_metadata)."""
    naip_patch = np.asarray(naip_patch)
    if naip_patch.ndim != 5:
        raise ValueError(f"naip_patch must be [H,W,krow,kcol,band], got "
                         f"{naip_patch.shape}")
    m = np.asarray(mask).astype(bool)
    out: Dict = {"bands": int(naip_patch.shape[-1]),
                 "kshape": (int(naip_patch.shape[2]),
                            int(naip_patch.shape[3])),
                 "dtype": str(naip_patch.dtype)}
    if include_source:
        out["source"] = include_source
    qs = {f"q{int(q * 100):02d}": [] for q in _QS}
    for b in range(naip_patch.shape[-1]):
        v = naip_patch[m][..., b].ravel()
        v = v[np.isfinite(v)]
        for q, key in zip(_QS, qs):
            qs[key].append(float(np.quantile(v, q)) if v.size else None)
    out.update(qs)
    return out


# ---------------------------------------------------------------------
# End-to-end: manifest -> legacy flat cube (build_zarr v1 orchestration)
# ---------------------------------------------------------------------
def build_manifest_cube(features_csv: str | Path,
                        mask_path: str | Path,
                        out_path: str | Path, *,
                        end_years: Sequence[int],
                        window_len: int,
                        naip_path: Optional[str | Path] = None,
                        naip_k: int = 3,
                        base_dir: str | Path = ".",
                        chunk_yx: int = 32,
                        patch_size: int = 32):
    """Assemble the legacy flat cube from a feature manifest.

    The `/root/reference/scripts/build_zarr.py` v1 orchestration on top
    of data_stack: mask grid from the mask raster, years from
    ``select_years``, manifest indexed + validated, "int" features ->
    ``continuous`` [T, C, H, W], "cat" -> ``categorical`` [T, C, H, W]
    (int16, NaN -> -1 fill), optional NAIP pre-baked to [H, W, k, k, B]
    patches, feature/NAIP metadata in cube attrs, per-band cont_stats for
    the normalizer. One (year, feature) band is in memory at a time.
    """
    from forest_tpu.data import cube as legacy

    base = Path(base_dir)
    mask_r = rio.read_geotiff(
        mask_path if Path(mask_path).is_absolute() else base / mask_path)
    if mask_r.transform is None:
        raise ValueError("mask raster has no geo-transform")
    mask = np.asarray(mask_r.data) > 0
    if mask.ndim == 3:
        mask = mask[..., 0]
    H, W = mask.shape

    years = select_years(end_years, window_len)
    y2f = index_inputs(
        features_csv if Path(features_csv).is_absolute()
        else base / features_csv, years)
    stack = ManifestStack(y2f, years, (H, W), mask_r.transform,
                          base_dir=base)
    cont_idx = [i for i, k in enumerate(stack.kinds) if k == "int"]
    cat_idx = [i for i, k in enumerate(stack.kinds) if k == "cat"]
    cont_names = [stack.fids[i] for i in cont_idx]
    cat_names = [stack.fids[i] for i in cat_idx]

    naip_bands: List[str] = []
    naip_data = None
    if naip_path is not None:
        fine = rio.read_geotiff(
            naip_path if Path(naip_path).is_absolute()
            else base / naip_path)
        naip_data = rio.align_fine_to_patches(
            fine, mask_r.transform, (0, H, 0, W), kshape=(naip_k, naip_k))
        naip_bands = [f"band_{b}" for b in range(naip_data.shape[-1])]

    root = legacy.create_cube(out_path, years, cont_names, cat_names,
                              naip_bands, H, W, naip_k=naip_k,
                              chunk_yx=chunk_yx, patch_size=patch_size)
    cont = root["continuous"]
    cat = root["categorical"]
    # one decode per (year, feature): the write pass also gathers the
    # masked values the metadata pass needs (manifests decode via PIL on
    # a 1-core host -- a second full-manifest read would double the build)
    masked_vals: List[List[np.ndarray]] = [[] for _ in stack.fids]
    for ti in range(len(years)):
        for ci, fi in enumerate(cont_idx):
            band = stack.read_feature(ti, fi)
            cont[ti, ci] = band
            masked_vals[fi].append(band[mask])
        for ci, fi in enumerate(cat_idx):
            band = stack.read_feature(ti, fi)
            codes = np.where(np.isfinite(band),
                             np.round(band), -1).astype(np.int16)
            cat[ti, ci] = codes
            masked_vals[fi].append(band[mask])
    root["aoi_mask"][:] = mask.astype(np.uint8)
    if naip_data is not None:
        root["naip"][:] = np.asarray(naip_data, np.float32)

    meta = _metadata_from_values(
        stack.fids, stack.kinds,
        [np.concatenate(v) if v else np.empty((0,), np.float32)
         for v in masked_vals])
    cont_stats = {}
    for f in meta["features"]:
        if f["kind"] == "int":
            s = f["stats"]
            cont_stats[f["name"]] = {"mean": s["mean"], "sd": s["std"],
                                     "q01": s["q01"], "q99": s["q99"]}
    attrs = {"feature_meta": meta, "cont_stats": cont_stats,
             "geo_transform": [float(v) for v in mask_r.transform],
             "end_years": [int(y) for y in end_years],
             "window_len": int(window_len)}
    if naip_data is not None:
        attrs["naip_meta"] = compute_naip_metadata(
            naip_data, mask, include_source=str(naip_path))
    root.attrs.update(attrs)
    root.write_attrs()
    return root


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Build the legacy flat cube from a feature manifest "
                    "CSV (data_stack equivalent)")
    ap.add_argument("--features-csv", required=True)
    ap.add_argument("--mask", required=True, help="binary mask GeoTIFF "
                    "defining the target grid")
    ap.add_argument("--output", required=True)
    ap.add_argument("--end-years", type=int, nargs="+", required=True)
    ap.add_argument("--window-len", type=int, required=True)
    ap.add_argument("--naip", default=None)
    ap.add_argument("--naip-k", type=int, default=3)
    ap.add_argument("--base-dir", default=".")
    ap.add_argument("--chunk-yx", type=int, default=32)
    ap.add_argument("--patch-size", type=int, default=32)
    a = ap.parse_args(argv)
    root = build_manifest_cube(
        a.features_csv, a.mask, a.output, end_years=a.end_years,
        window_len=a.window_len, naip_path=a.naip, naip_k=a.naip_k,
        base_dir=a.base_dir, chunk_yx=a.chunk_yx, patch_size=a.patch_size)
    t, _, h, w = root["continuous"].shape
    print(f"wrote {a.output}: T={t} H={h} W={w} "
          f"cont={len(root.attrs['cont_names'])} "
          f"cat={len(root.attrs['cat_names'])}")


__all__ = ["select_years", "index_inputs", "enforce_consistent_features",
           "read_into_mask_grid", "ManifestStack",
           "compute_feature_metadata", "compute_naip_metadata",
           "build_manifest_cube"]


if __name__ == "__main__":
    main()
