"""Cube inspector CLI: structure, features, years, NAIP, stats, exports.

Behavioral contract from /root/reference/utils/zarr_info.py:47-331 (SURVEY.md
§2.2), section for section:

- core structure + feature roster (name, kind) + years;
- dataset attrs block (georeferencing / build params);
- NAIP presence, layout, and per-band NaN-aware stats (``--naip-stats``);
- continuous stats (``--cont-stats``) and categorical class counts with
  top-N codes (``--cat-stats --top N --top-feats M``);
- policy-free exports: ``--dump-meta`` (raw attrs JSON), ``--export-counts``
  (feature,code,count,prop CSV), ``--export-manifest`` (shapes/names/kinds
  JSON).

Works on both cube layouts: the legacy flat VQ-VAE cube (data/cube.py:
continuous/categorical/naip arrays + name attrs) and the hierarchical v2
cube (data/cube_v2.py: annual/static band tree). Stats the reference reads
from the builder's ``feature_meta`` attr are computed directly from the
arrays here (chunk-subsampled via ``--sample-chunks`` to bound IO on big
cubes) so the inspector has no builder dependency.

Run: python -m forest_tpu.data.zarr_info CUBE.zarr [--meta] [--naip-stats]
        [--cont-stats] [--cat-stats] [--export-manifest out.json] ...
"""
from __future__ import annotations

import argparse
import csv
import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from forest_tpu.data import zarrlite as zl


# --------------------------- structure walk ----------------------------

def _fmt_array(name: str, a: zl.ZarrArray, indent: str) -> List[str]:
    comp = (a.compressor or {}).get("id", "raw")
    lines = [f"{indent}{name}  shape={tuple(a.shape)} dtype={a.dtype} "
             f"chunks={tuple(a.chunks)} comp={comp}"]
    st = a.attrs.get("statistics")
    if st and st.get("n_valid"):
        if "histogram" in st:  # categorical: class counts, not moments
            top = sorted(st["histogram"].items(),
                         key=lambda kv: -kv[1])[:6]
            body = " ".join(f"{k}:{v}" for k, v in top)
            more = st.get("num_classes", len(st["histogram"])) - len(top)
            lines.append(f"{indent}  classes ({st.get('num_classes')}): "
                         f"{body}{f' +{more} more' if more > 0 else ''}")
        elif "true_count" in st:  # mask: boolean counts
            lines.append(
                f"{indent}  mask: true={st['true_count']} "
                f"false={st['false_count']} "
                f"frac={st.get('true_fraction', 0):.4g}")
        else:
            lines.append(
                f"{indent}  stats: mean={st.get('mean', 0):.4g} "
                f"sd={st.get('sd', 0):.4g} "
                f"[{st.get('min', 0):.4g}, {st.get('max', 0):.4g}] "
                f"n={st.get('n_valid')}")
    return lines


def _walk(g: zl.ZarrGroup, indent: str = "") -> List[str]:
    lines = []
    for k in g.keys():
        v = g[k]
        if isinstance(v, zl.ZarrGroup):
            lines.append(f"{indent}{k}/")
            lines.extend(_walk(v, indent + "  "))
        else:
            lines.extend(_fmt_array(k, v, indent))
    return lines


# --------------------------- feature roster ----------------------------

def list_years(root: zl.ZarrGroup) -> List[int]:
    """Years on the time axis: v2 ``time_coords`` attr or the legacy
    ``years`` array (reference list_years)."""
    if "time_coords" in root.attrs:
        return [int(y) for y in root.attrs["time_coords"]]
    if "years" in root:
        return [int(y) for y in np.asarray(root["years"][:])]
    return []


def list_features(root: zl.ZarrGroup) -> List[Tuple[str, str]]:
    """[(feature_name, kind)] (reference list_features): legacy cubes from
    cont_names/cat_names attrs; v2 cubes from the band tree (kind from the
    data/ vs mask/ folder and dtype)."""
    feats: List[Tuple[str, str]] = []
    if "cont_names" in root.attrs or "cat_names" in root.attrs:
        feats += [(n, "cont") for n in root.attrs.get("cont_names", [])]
        feats += [(n, "cat") for n in root.attrs.get("cat_names", [])]
        return feats

    def walk(g: zl.ZarrGroup, prefix: str):
        for k in g.keys():
            v = g[k]
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, zl.ZarrGroup):
                walk(v, path)
            elif k != "years":
                kind = ("mask" if "/mask/" in f"/{path}/"
                        else "cat" if np.issubdtype(v.dtype, np.integer)
                        else "cont")
                feats.append((path, kind))

    walk(root, "")
    return feats


def dataset_attrs_lines(root: zl.ZarrGroup) -> List[str]:
    """The reference print_dataset_attrs block: georeferencing / build
    params, printed tersely for whatever keys the cube carries."""
    keys = ("created", "crs", "transform", "geo_transform", "bounds",
            "resolution", "window_len", "end_years", "patch_size",
            "time_coords")
    lines = ["dataset attrs:"]
    for k in keys:
        if k in root.attrs:
            v = root.attrs[k]
            if k == "time_coords":
                v = f"{v[0]}..{v[-1]} ({len(v)})"
            lines.append(f"  {k:<13}: {v}")
    return lines


# ------------------------------- NAIP ----------------------------------

def naip_info(root: zl.ZarrGroup) -> Dict:
    """{'present', 'shape', 'kshape', 'bands'} (reference naip_info)."""
    if "naip" not in root:
        return {"present": False}
    a = root["naip"]
    shp = tuple(a.shape)
    return {"present": True, "shape": shp,
            "kshape": shp[2:4] if len(shp) >= 5 else None,
            "bands": shp[-1] if len(shp) >= 5 else None,
            "band_names": root.attrs.get("naip_band_names", [])}


def _iter_sample_chunks(a: zl.ZarrArray, sample_chunks: Optional[int],
                        seed: int = 0):
    grid = [range(n) for n in
            (-(-s // c) for s, c in zip(a.shape, a.chunks))]
    import itertools
    coords = list(itertools.product(*grid))
    if sample_chunks and len(coords) > sample_chunks:
        rng = np.random.default_rng(seed)
        coords = [coords[i] for i in
                  rng.choice(len(coords), sample_chunks, replace=False)]
    for c in coords:
        # read_chunk returns edge chunks at FULL chunk shape with
        # fill-value padding past the array bounds; trim to the in-bounds
        # extent so padding never enters the streamed stats.
        trim = tuple(slice(0, min(cs, s - ci * cs))
                     for ci, cs, s in zip(c, a.chunks, a.shape))
        yield a.read_chunk(c)[trim]


def naip_band_stats(root: zl.ZarrGroup,
                    sample_chunks: Optional[int] = 64) -> List[Dict]:
    """Per-band NaN-aware stats (reference naip_band_stats), computed by
    streaming decoded chunks rather than materializing the array."""
    if "naip" not in root:
        return []
    a = root["naip"]
    b = a.shape[-1]
    cnt = np.zeros(b)
    s1 = np.zeros(b)
    s2 = np.zeros(b)
    mn = np.full(b, np.inf)
    mx = np.full(b, -np.inf)
    for chunk in _iter_sample_chunks(a, sample_chunks):
        flat = chunk.reshape(-1, b).astype(np.float64)
        ok = np.isfinite(flat)
        cnt += ok.sum(0)
        fz = np.where(ok, flat, 0.0)
        s1 += fz.sum(0)
        s2 += (fz * fz).sum(0)
        with np.errstate(invalid="ignore"):
            mn = np.minimum(mn, np.nanmin(
                np.where(ok, flat, np.nan), axis=0, initial=np.inf))
            mx = np.maximum(mx, np.nanmax(
                np.where(ok, flat, np.nan), axis=0, initial=-np.inf))
    out = []
    for i in range(b):
        if cnt[i] == 0:
            out.append({"band": i, "min": None, "max": None,
                        "mean": None, "std": None})
            continue
        mean = s1[i] / cnt[i]
        var = max(s2[i] / cnt[i] - mean * mean, 0.0)
        out.append({"band": int(i), "min": float(mn[i]),
                    "max": float(mx[i]), "mean": float(mean),
                    "std": float(np.sqrt(var))})
    return out


# ---------------------- continuous / categorical ------------------------

def continuous_stats(root: zl.ZarrGroup,
                     sample_chunks: Optional[int] = 64) -> Dict[str, Dict]:
    """Per-channel stats for the legacy ``continuous`` array or every v2
    float band (reference print_continuous_stats source). Prefers the
    builder-persisted ``cont_stats`` attr; falls back to streaming."""
    if "cont_stats" in root.attrs:
        return dict(root.attrs["cont_stats"])
    out: Dict[str, Dict] = {}
    if "continuous" in root:
        a = root["continuous"]
        names = root.attrs.get("cont_names",
                               [f"c{i}" for i in range(a.shape[1])])
        for i, name in enumerate(names):
            vals = []
            for chunk in _iter_sample_chunks(a, sample_chunks):
                v = chunk[:, i].ravel()
                vals.append(v[np.isfinite(v)])
            v = (np.concatenate(vals) if vals
                 else np.zeros(0, np.float32))
            if v.size:
                out[name] = {"min": float(v.min()), "max": float(v.max()),
                             "mean": float(v.mean()),
                             "std": float(v.std()),
                             "q01": float(np.percentile(v, 1)),
                             "q99": float(np.percentile(v, 99)),
                             "n": int(v.size)}
        return out
    for name, kind in list_features(root):
        if kind != "cont":
            continue
        a = root[name]
        vals = []
        for chunk in _iter_sample_chunks(a, sample_chunks):
            v = chunk.ravel()
            vals.append(v[np.isfinite(v)])
        v = np.concatenate(vals) if vals else np.zeros(0, np.float32)
        if v.size:
            out[name] = {"min": float(v.min()), "max": float(v.max()),
                         "mean": float(v.mean()), "std": float(v.std()),
                         "q01": float(np.percentile(v, 1)),
                         "q99": float(np.percentile(v, 99)),
                         "n": int(v.size)}
    return out


def categorical_counts(root: zl.ZarrGroup,
                       sample_chunks: Optional[int] = 64
                       ) -> Dict[str, Dict[int, int]]:
    """{feature: {code: count}} for the legacy ``categorical`` array or
    every v2 integer band (reference print_categorical_stats source)."""
    out: Dict[str, Dict[int, int]] = {}

    def count_into(name, chunks, channel=None):
        acc: Dict[int, int] = out.setdefault(name, {})
        for chunk in chunks:
            v = chunk if channel is None else chunk[:, channel]
            codes, counts = np.unique(v.ravel(), return_counts=True)
            for c, n in zip(codes, counts):
                if np.isfinite(float(c)):
                    acc[int(c)] = acc.get(int(c), 0) + int(n)

    if "categorical" in root:
        a = root["categorical"]
        names = root.attrs.get("cat_names",
                               [f"k{i}" for i in range(a.shape[1])])
        for i, name in enumerate(names):
            count_into(name, _iter_sample_chunks(a, sample_chunks), i)
        return out
    for name, kind in list_features(root):
        if kind == "cat":
            count_into(name,
                       _iter_sample_chunks(root[name], sample_chunks))
    return out


# ------------------------------ exports --------------------------------

def export_counts(counts: Dict[str, Dict[int, int]], path: str | Path
                  ) -> None:
    """feature,code,count,prop CSV (reference export_counts)."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["feature", "code", "count", "prop"])
        for feat, cc in counts.items():
            total = sum(cc.values()) or 1
            for code in sorted(cc):
                w.writerow([feat, code, cc[code], cc[code] / total])


def export_manifest(root: zl.ZarrGroup, path: str | Path) -> None:
    """Compact JSON manifest: shapes, names/kinds, NAIP, key attrs
    (reference export_manifest)."""
    feats = list_features(root)
    ni = naip_info(root)
    manifest = {
        "years": list_years(root),
        "feature_names": [n for n, _ in feats],
        "feature_kinds": [k for _, k in feats],
        "arrays": {k: {"shape": list(v.shape), "dtype": str(v.dtype),
                       "chunks": list(v.chunks)}
                   for k, v in _all_arrays(root)},
        "naip_shape": list(ni["shape"]) if ni.get("present") else None,
        "naip_bands": ni.get("bands"),
        "attrs": {k: root.attrs.get(k) for k in
                  ("created", "crs", "transform", "geo_transform",
                   "bounds", "resolution", "patch_size") if
                  k in root.attrs},
    }
    Path(path).write_text(json.dumps(manifest, indent=2))


def _all_arrays(g: zl.ZarrGroup, prefix: str = ""):
    for k in g.keys():
        v = g[k]
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, zl.ZarrGroup):
            yield from _all_arrays(v, path)
        else:
            yield path, v


# ------------------------------ summary --------------------------------

def summarize(path: str | Path, show_meta: bool = False,
              show_naip_stats: bool = False, show_cont_stats: bool = False,
              show_cat_stats: bool = False, top_classes: int = 10,
              top_feats: Optional[int] = None,
              sample_chunks: Optional[int] = 64) -> str:
    node = zl.open_zarr(path)
    lines = [f"cube: {path}"]
    if not isinstance(node, zl.ZarrGroup):
        lines.extend(_fmt_array(Path(path).name, node, ""))
        return "\n".join(lines)

    years = list_years(node)
    if years:
        lines.append(f"years: {years[0]}..{years[-1]} ({len(years)})")
    feats = list_features(node)
    lines.append(f"features ({len(feats)}):")
    lines += [f"  - {n} ({k})" for n, k in feats]
    lines += dataset_attrs_lines(node)

    ni = naip_info(node)
    if not ni["present"]:
        lines.append("NAIP: not present")
    else:
        lines.append(f"NAIP: present -> shape {ni['shape']}  "
                     f"patch={ni['kshape']}  bands={ni['bands']}")
        if show_naip_stats:
            lines.append("NAIP per-band stats (NaNs ignored):")
            for s in naip_band_stats(node, sample_chunks):
                lines.append(
                    f"  band {s['band']}: min={s['min']}, max={s['max']},"
                    f" mean={s['mean']}, std={s['std']}")

    if show_cont_stats:
        lines.append("continuous feature stats:")
        for name, s in continuous_stats(node, sample_chunks).items():
            lines.append(
                f"  - {name}: min={s.get('min')}, max={s.get('max')}, "
                f"mean={s.get('mean')}, std={s.get('std')}, "
                f"q01={s.get('q01')}, q99={s.get('q99')}")

    if show_cat_stats:
        lines.append("categorical class counts:")
        counts = categorical_counts(node, sample_chunks)
        items = list(counts.items())[:top_feats] if top_feats \
            else counts.items()
        for name, cc in items:
            total = sum(cc.values())
            lines.append(f"  - {name}: {len(cc)} classes, "
                         f"total obs={total}")
            for code, n in sorted(cc.items(), key=lambda kv: -kv[1]
                                  )[:top_classes]:
                lines.append(f"      code={code:<8} count={n}")

    lines.append("structure:")
    lines.extend(_walk(node, "  "))
    if show_meta:
        lines.append("attrs: " + json.dumps(node.attrs, indent=1))
    n_files = sum(1 for p in Path(path).rglob("*") if p.is_file())
    size = sum(f.stat().st_size for f in Path(path).rglob("*")
               if f.is_file())
    lines.append(f"files: {n_files}  bytes: {size:,}")
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path")
    ap.add_argument("--meta", action="store_true",
                    help="print the full attrs JSON")
    ap.add_argument("--naip-stats", action="store_true")
    ap.add_argument("--cont-stats", action="store_true")
    ap.add_argument("--cat-stats", action="store_true")
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--top-feats", type=int, default=None)
    ap.add_argument("--sample-chunks", type=int, default=64,
                    help="max chunks read per array for stats (0 = all)")
    ap.add_argument("--dump-meta", default=None)
    ap.add_argument("--export-counts", default=None)
    ap.add_argument("--export-manifest", default=None)
    a = ap.parse_args(argv)

    sc = a.sample_chunks or None
    print(summarize(a.path, a.meta, a.naip_stats, a.cont_stats,
                    a.cat_stats, a.top, a.top_feats, sc))
    root = zl.open_zarr(a.path)
    if a.dump_meta:
        Path(a.dump_meta).write_text(json.dumps(root.attrs, indent=2))
        print(f"wrote raw attrs JSON -> {a.dump_meta}")
    if a.export_counts:
        export_counts(categorical_counts(root, sc), a.export_counts)
        print(f"wrote categorical counts CSV -> {a.export_counts}")
    if a.export_manifest:
        export_manifest(root, a.export_manifest)
        print(f"wrote dataset manifest JSON -> {a.export_manifest}")


if __name__ == "__main__":
    main()


__all__ = ["summarize", "list_features", "list_years", "naip_info",
           "naip_band_stats", "continuous_stats", "categorical_counts",
           "export_counts", "export_manifest", "main"]
