"""Legacy-style VQ-VAE feature cube: layout, open/create, synthetic fixture.

The reference's legacy cube (/root/reference/scripts/build_zarr.py:47-905,
chunk spec /root/reference/scripts/config.yaml:15-17) stores per-kind feature
stacks for a T-year window plus pre-baked 3x3 NAIP patches. This module
defines forest-tpu's equivalent on-disk layout (zarr v2 via
:mod:`forest_tpu.data.zarrlite`):

  cube.zarr/
    continuous   [T, C_cont, Y, X]  float32, NaN = missing
    categorical  [T, C_cat,  Y, X]  int16,   -1  = missing
    naip         [Y, X, KR, KC, NB] float32, NaN = missing
    aoi_mask     [Y, X]             uint8,   1 = inside AOI
    years        [T]                int64
    attrs: cont_names, cat_names, naip_band_names, patch_size (split unit),
           cont_stats {name: {mean, std}}

Chunking follows the reference recipe: full T and C per chunk, (y, x) tiles of
``chunk_yx`` (default 32) so one ChunkBatchSampler batch touches exactly one
chunk per array (SURVEY.md §2.3 ChunkBatchSampler).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from forest_tpu.data import zarrlite as zl


class LegacyCube:
    """Open handle over the legacy-style cube."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.root = zl.open_zarr(self.path)
        self.continuous = self.root["continuous"]
        self.categorical = self.root["categorical"]
        self.naip = self.root["naip"]
        self.aoi_mask = self.root["aoi_mask"]
        self.years = np.asarray(self.root["years"][:])
        a = self.root.attrs
        self.cont_names: List[str] = a["cont_names"]
        self.cat_names: List[str] = a["cat_names"]
        self.naip_band_names: List[str] = a.get("naip_band_names", [])
        self.patch_size: int = int(a.get("patch_size", 32))
        self.cont_stats: Dict[str, Dict[str, float]] = a.get("cont_stats", {})

    @property
    def shape_yx(self) -> Tuple[int, int]:
        return self.continuous.shape[2], self.continuous.shape[3]

    @property
    def chunk_yx(self) -> Tuple[int, int]:
        return self.continuous.chunks[2], self.continuous.chunks[3]


def create_cube(path: str | Path, years: Sequence[int],
                cont_names: Sequence[str], cat_names: Sequence[str],
                naip_band_names: Sequence[str], height: int, width: int,
                naip_k: int = 3, chunk_yx: int = 32,
                patch_size: int = 32, clevel: int = 3) -> zl.ZarrGroup:
    t = len(years)
    root = zl.create_group(path)
    comp = dict(zl.DEFAULT_COMPRESSOR, clevel=clevel)
    root.create_array(
        "continuous", (t, len(cont_names), height, width),
        (t, len(cont_names), chunk_yx, chunk_yx), np.float32,
        fill_value=float("nan"), compressor=comp)
    root.create_array(
        "categorical", (t, len(cat_names), height, width),
        (t, len(cat_names), chunk_yx, chunk_yx), np.int16,
        fill_value=-1, compressor=comp)
    root.create_array(
        "naip", (height, width, naip_k, naip_k, len(naip_band_names)),
        (chunk_yx, chunk_yx, naip_k, naip_k, len(naip_band_names)),
        np.float32, fill_value=float("nan"), compressor=comp)
    root.create_array("aoi_mask", (height, width), (chunk_yx, chunk_yx),
                      np.uint8, fill_value=0, compressor=comp)
    ya = root.create_array("years", (t,), (t,), np.int64, compressor=None)
    ya[:] = np.asarray(years, np.int64)
    root.attrs.update({
        "cont_names": list(cont_names), "cat_names": list(cat_names),
        "naip_band_names": list(naip_band_names),
        "patch_size": int(patch_size), "cont_stats": {},
    })
    root.write_attrs()
    return root


def build_synthetic_cube(path: str | Path, height: int = 128,
                         width: int = 128, years: Sequence[int] = tuple(
                             range(2017, 2022)),
                         n_cont: int = 8, n_cat: int = 2, n_naip: int = 3,
                         n_types: int = 12, chunk_yx: int = 32,
                         patch_size: int = 32, missing_frac: float = 0.02,
                         seed: int = 0) -> LegacyCube:
    """Synthetic forest-like cube for tests/benchmarks.

    Pixels belong to one of ``n_types`` latent forest types arranged in
    spatially-correlated blobs; each type has a characteristic spectral
    trajectory (recovery curves + seasonal offsets), a categorical label
    distribution, and a canopy-height level -- structured enough that the
    VQ-VAE has something real to quantize (the role of the reference's
    va_vae_dataset_test.yaml tiny cube, SURVEY.md §5 fixtures).
    """
    rng = np.random.default_rng(seed)
    t = len(years)
    root = create_cube(path, years,
                       [f"cont_{i}" for i in range(n_cont)],
                       [f"cat_{i}" for i in range(n_cat)],
                       [f"naip_{i}" for i in range(n_naip)],
                       height, width, naip_k=3, chunk_yx=chunk_yx,
                       patch_size=patch_size)

    # Latent type map: smoothed random field -> argmax over type scores.
    fy = rng.normal(size=(n_types, height // 8 + 2, width // 8 + 2))
    # bilinear upsample via np.kron + crop
    up = np.kron(fy, np.ones((1, 8, 8)))[:, :height, :width]
    type_map = up.argmax(axis=0)  # [H, W]

    # Per-type parameters.
    base = rng.normal(scale=2.0, size=(n_types, n_cont))
    trend = rng.normal(scale=0.3, size=(n_types, n_cont))
    canopy_level = rng.uniform(2.0, 30.0, size=n_types)
    cat_prob = rng.dirichlet(np.ones(7) * 0.5, size=(n_types, n_cat))

    tt = np.arange(t, dtype=np.float32)
    cont = (base[type_map][None]  # [1, H, W, C]
            + trend[type_map][None] * tt[:, None, None, None]
            + rng.normal(scale=0.3, size=(t, height, width, n_cont)))
    cont = np.transpose(cont, (0, 3, 1, 2)).astype(np.float32)

    cat = np.empty((t, n_cat, height, width), np.int16)
    for ci in range(n_cat):
        p = cat_prob[type_map, ci]  # [H, W, 7]
        u = rng.random((t, height, width, 1))
        cat[:, ci] = (u < np.cumsum(p, axis=-1)[None]).argmax(-1)
    # Raw categorical codes are sparse/spread out (e.g. EVT codes).
    raw_codes = rng.choice(np.arange(100, 4000), size=7, replace=False)
    cat = raw_codes[cat].astype(np.int16)

    naip = (canopy_level[type_map][..., None, None, None]
            + rng.normal(scale=1.0,
                         size=(height, width, 3, 3, n_naip))).astype(np.float32)

    # Missingness.
    miss = rng.random((t, 1, height, width)) < missing_frac
    cont[np.broadcast_to(miss, cont.shape)] = np.nan
    cat[np.broadcast_to(miss, cat.shape)] = -1
    naip_miss = rng.random((height, width, 1, 1, 1)) < missing_frac
    naip[np.broadcast_to(naip_miss, naip.shape)] = np.nan

    aoi = np.ones((height, width), np.uint8)
    aoi[:, : width // 16] = 0  # carve out a non-AOI strip

    root["continuous"][:] = cont
    root["categorical"][:] = cat
    root["naip"][:] = naip
    root["aoi_mask"][:] = aoi

    stats = {}
    for ci in range(n_cont):
        v = cont[:, ci][np.isfinite(cont[:, ci])]
        stats[f"cont_{ci}"] = {"mean": float(v.mean()),
                               "std": float(v.std() + 1e-6)}
    root.attrs["cont_stats"] = stats
    root.write_attrs()
    return LegacyCube(path)


__all__ = ["LegacyCube", "create_cube", "build_synthetic_cube"]
