"""VQVAEDataset: per-pixel sample extraction from the legacy cube.

Implements the reconstructed ``vqvae.loader`` contract (SURVEY.md §3;
call sites /root/reference/scripts/train_vqvae.py:149-180,275-314 and
export_codebook.py:59-128): per-pixel (y, x) time-series samples with a 3x3
NAIP patch, ``xy_by_chunk`` for the ChunkBatchSampler, schema-driven dense
categorical ids, per-categorical class weights, and batch dicts with keys
``cont [B,T,C] / cat [B,T,Ccat] / cat_target / naip [B,kr,kc,nb] /
naip_nan_mask / years / yx / cont_nan_mask / canopy``. IGNORE_INDEX = -100.

TPU-first division of labor: the host side only decodes chunks and gathers
pixels (this module); z-score normalization values are attached as arrays so
the jitted step can fuse them into the XLA graph -- but for loader parity we
also normalize host-side (cheap vectorized numpy on one chunk at a time),
matching the reference's "continuous channels normalized" encoder contract.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from forest_tpu.data import checkerboard, schema as schema_mod
from forest_tpu.data.cube import LegacyCube
from forest_tpu.data.weights import cat_class_weights

IGNORE_INDEX = -100


class VQVAEDataset:
    def __init__(self, zarr_path: str | Path, schema_path: str | Path,
                 split: Optional[str] = "train", eager: bool = False,
                 ignore_unk_in_loss: bool = True,
                 block_size=(4, 4), canopy_band: int = 0):
        self.cube = LegacyCube(zarr_path)
        self.schema = json.loads(Path(schema_path).read_text())
        self.schema_cat: Dict[str, dict] = self.schema["categorical"]
        self.cont_stats: Dict[str, dict] = self.schema["continuous"]
        self.cat_names: List[str] = list(self.cube.cat_names)
        self.cont_names: List[str] = list(self.cube.cont_names)
        self.cat_maps = {n: schema_mod.dense_to_raw_map(self.schema_cat[n])
                         for n in self.cat_names}
        self.canopy_stats = self.schema.get("canopy",
                                            {"mean": 0.0, "std": 1.0})
        self.ignore_unk_in_loss = ignore_unk_in_loss
        self.canopy_band = canopy_band
        self.split = split
        self.block_size = tuple(block_size)

        h, w = self.cube.shape_yx
        aoi = np.asarray(self.cube.aoi_mask[:, :]) > 0
        yy, xx = np.nonzero(aoi)
        if split is not None:
            codes = checkerboard.pixel_split_code(
                yy, xx, self.cube.patch_size, self.block_size)
            keep = codes == checkerboard.SPLIT_CODES[split]
            yy, xx = yy[keep], xx[keep]
        self.yx = np.stack([yy, xx], axis=1).astype(np.int64)  # [N, 2]

        # Group sample indices by (cy, cx) zarr chunk for locality batching.
        cy_sz, cx_sz = self.cube.chunk_yx
        ncx = -(-w // cx_sz)
        chunk_id = (yy // cy_sz) * ncx + (xx // cx_sz)
        order = np.argsort(chunk_id, kind="stable")
        sorted_ids = chunk_id[order]
        bounds = np.searchsorted(sorted_ids,
                                 np.arange((-(-h // cy_sz)) * ncx + 1))
        self.xy_by_chunk: List[np.ndarray] = [
            order[bounds[i]:bounds[i + 1]]
            for i in range(len(bounds) - 1)]
        self._ncx = ncx

        # Normalization vectors aligned to cont channel order.
        self.cont_mean = np.array(
            [self.cont_stats[n]["mean"] for n in self.cont_names],
            np.float32)
        self.cont_std = np.array(
            [max(self.cont_stats[n]["std"], 1e-6) for n in self.cont_names],
            np.float32)

        self._eager_cache = None
        if eager:
            self._eager_cache = {
                "continuous": np.asarray(self.cube.continuous),
                "categorical": np.asarray(self.cube.categorical),
                "naip": np.asarray(self.cube.naip),
            }

        # years vector (export contract: ds.ds["years"]).
        self.ds = {"years": self.cube.years}

    def __len__(self) -> int:
        return len(self.yx)

    @property
    def naip(self):
        return self.cube.naip

    def class_weights_by_cat_name(self, name: str,
                                  mode: str = "sqrt_inv") -> np.ndarray:
        return cat_class_weights(self.schema_cat[name], mode=mode)

    # ------------------------------------------------------------------

    def _read(self, arr_name: str, ys: slice, xs: slice) -> np.ndarray:
        if self._eager_cache is not None:
            a = self._eager_cache[arr_name]
            return a[..., ys, xs] if arr_name != "naip" else a[ys, xs]
        arr = getattr(self.cube, arr_name if arr_name != "naip" else "naip")
        if arr_name == "naip":
            return arr[ys, xs]
        return arr[:, :, ys, xs]

    def load_batch(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        """Gather one batch. Fast path: all indices within one (y, x) chunk
        (the ChunkBatchSampler guarantee) -> each source array is decoded
        exactly once."""
        yx = self.yx[np.asarray(indices)]
        ys, xs = yx[:, 0], yx[:, 1]
        cy_sz, cx_sz = self.cube.chunk_yx
        y0 = (ys.min() // cy_sz) * cy_sz
        x0 = (xs.min() // cx_sz) * cx_sz
        y1 = min(((ys.max() // cy_sz) + 1) * cy_sz,
                 self.cube.shape_yx[0])
        x1 = min(((xs.max() // cx_sz) + 1) * cx_sz,
                 self.cube.shape_yx[1])
        sy, sx = slice(y0, y1), slice(x0, x1)
        ly, lx = ys - y0, xs - x0

        cont = self._read("continuous", sy, sx)[:, :, ly, lx]  # [T, C, B]
        cont = np.transpose(cont, (2, 0, 1)).astype(np.float32)  # [B, T, C]
        cont_nan_mask = np.isfinite(cont)
        cont_n = (cont - self.cont_mean) / self.cont_std
        cont_n[~cont_nan_mask] = np.nan

        cat_raw = self._read("categorical", sy, sx)[:, :, ly, lx]  # [T,Cc,B]
        cat_raw = np.transpose(cat_raw, (2, 0, 1))  # [B, T, Cc]
        b, t, _ = cat_raw.shape
        cat = np.empty((b, t, len(self.cat_names)), np.int32)
        tgt: Dict[str, np.ndarray] = {}
        for ci, name in enumerate(self.cat_names):
            dense = schema_mod.apply_schema(cat_raw[:, :, ci],
                                            self.schema_cat[name])
            cat[:, :, ci] = dense
            m = dense.copy()
            m[m == schema_mod.MISS_ID] = IGNORE_INDEX
            if self.ignore_unk_in_loss:
                m[m == schema_mod.UNK_ID] = IGNORE_INDEX
            tgt[name] = m

        naip = self._read("naip", sy, sx)[ly, lx].astype(np.float32)
        naip_nan_mask = np.isfinite(naip)
        if naip.shape[-1]:
            band = naip[..., self.canopy_band].reshape(b, -1)
            bm = np.isfinite(band)
            cnt = bm.sum(axis=1)
            canopy = np.where(cnt > 0,
                              np.where(bm, band, 0.0).sum(axis=1)
                              / np.maximum(cnt, 1), np.nan)
            canopy = (canopy - self.canopy_stats["mean"]) \
                / max(self.canopy_stats["std"], 1e-6)
        else:
            canopy = np.full(b, np.nan, np.float32)  # band-less cube

        return {
            "cont": cont_n,
            "cont_nan_mask": cont_nan_mask.astype(np.uint8),
            "cat": cat,
            "cat_target": tgt,
            "naip": naip,
            "naip_nan_mask": naip_nan_mask.astype(np.uint8),
            "canopy": canopy.astype(np.float32),
            "years": self.cube.years.astype(np.int32),
            "yx": yx.astype(np.int32),
        }


def default_collate_fn(batches: Sequence[Dict[str, np.ndarray]]
                       ) -> Dict[str, np.ndarray]:
    """Stack per-sample dicts (parity shim; load_batch already batches)."""
    out: Dict[str, np.ndarray] = {}
    first = batches[0]
    for k in first:
        if isinstance(first[k], dict):
            out[k] = {n: np.stack([b[k][n] for b in batches])
                      for n in first[k]}
        else:
            out[k] = np.stack([b[k] for b in batches])
    return out


__all__ = ["VQVAEDataset", "default_collate_fn", "IGNORE_INDEX"]
