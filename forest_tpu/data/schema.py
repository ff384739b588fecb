"""Exposure-aware categorical schema builder (the ``vqvae.preprocess`` contract).

Reconstructed from call sites (/root/reference/scripts/train_vqvae.py:137-146
and the MISS=0/UNK=1 convention in /root/reference/utils/weights.py:25;
SURVEY.md §3): collapse each categorical feature's raw vocabulary to a dense
id space [0, num_ids) where

  - dense 0 = MISS (missing / nodata raw values),
  - dense 1 = UNK (raw values dropped by the collapse),
  - dense 2.. = kept raw values, ordered by descending count;

keeping a raw value requires (a) expected hits per epoch
(freq * batch_size * steps_per_epoch) >= ``min_hits_per_epoch``, (b) being
within the smallest prefix covering ``mass_coverage`` of total mass, and
(c) rank < ``vocab_cap``. Writes ``schema.json`` + ``feature_meta.json`` into
the run dir.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import numpy as np

MISS_ID, UNK_ID = 0, 1
MISS_RAW = -1  # raw nodata value in the categorical cube


def collapse_vocab(raw_values: np.ndarray, counts: np.ndarray,
                   samples_per_epoch: float, min_hits_per_epoch: float = 100,
                   mass_coverage: float = 0.999,
                   vocab_cap: int = 5000) -> Dict[str, Any]:
    """Collapse one feature's (raw value, count) table to the dense id space.

    ``counts`` are occurrence counts over the sampled population (raw value
    MISS_RAW must already be excluded). Returns the schema entry dict.
    """
    raw_values = np.asarray(raw_values)
    counts = np.asarray(counts, dtype=np.float64)
    order = np.argsort(-counts, kind="stable")
    raw_sorted = raw_values[order]
    cnt_sorted = counts[order]
    total = max(cnt_sorted.sum(), 1.0)

    freq = cnt_sorted / total
    expected_hits = freq * samples_per_epoch
    cum_mass = np.cumsum(freq)
    prev_mass = np.concatenate([[0.0], cum_mass[:-1]])

    keep = (expected_hits >= min_hits_per_epoch) \
        & (prev_mass < mass_coverage) \
        & (np.arange(len(cnt_sorted)) < max(vocab_cap - 2, 0))

    kept_raw = raw_sorted[keep]
    kept_cnt = cnt_sorted[keep]
    num_ids = 2 + len(kept_raw)
    id_map = {int(r): i + 2 for i, r in enumerate(kept_raw)}
    counts_per_id = [0.0, float(cnt_sorted[~keep].sum())] + \
        [float(c) for c in kept_cnt]
    return {
        "num_ids": int(num_ids),
        "counts_per_id": counts_per_id,
        "id_map": {str(k): v for k, v in id_map.items()},
        "raw_values": [int(r) for r in kept_raw],
        "total_count": float(total),
    }


def apply_schema(raw: np.ndarray, entry: Dict[str, Any]) -> np.ndarray:
    """Map raw categorical codes to dense ids (vectorized lookup table)."""
    raw = np.asarray(raw)
    kept = np.asarray(entry["raw_values"], dtype=np.int64)
    if kept.size:
        lo, hi = int(kept.min()), int(kept.max())
        lut = np.full(hi - lo + 2, UNK_ID, dtype=np.int32)
        lut[kept - lo] = np.arange(2, 2 + kept.size, dtype=np.int32)
        clipped = np.clip(raw.astype(np.int64) - lo, 0, hi - lo + 1)
        dense = lut[clipped]
        in_range = (raw >= lo) & (raw <= hi)
        dense = np.where(in_range, dense, UNK_ID).astype(np.int32)
    else:
        dense = np.full(raw.shape, UNK_ID, dtype=np.int32)
    return np.where(raw == MISS_RAW, MISS_ID, dense).astype(np.int32)


def dense_to_raw_map(entry: Dict[str, Any]) -> np.ndarray:
    """Inverse map dense id -> raw code (MISS/UNK -> MISS_RAW); the
    ``cat_maps`` contract used by codebook export (SURVEY.md §3)."""
    out = np.full(entry["num_ids"], MISS_RAW, dtype=np.int64)
    for i, r in enumerate(entry["raw_values"]):
        out[i + 2] = r
    return out


def build_and_save_schema(cube, run_dir: str | Path, batch_size: int,
                          steps_per_epoch: int,
                          min_hits_per_epoch: float = 100,
                          mass_coverage: float = 0.999,
                          vocab_cap: int = 5000,
                          max_sample_pixels: int = 2_000_000,
                          seed: int = 0) -> Path:
    """Count categorical values over (a sample of) the cube and write
    ``schema.json`` + ``feature_meta.json``. ``cube`` is a
    :class:`forest_tpu.data.cube.LegacyCube`.
    """
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    samples_per_epoch = float(batch_size) * float(steps_per_epoch)

    t, c_cat, h, w = cube.categorical.shape
    # Sample in ROW BANDS, decoding each band once for ALL channels --
    # never materializing the full cube per channel (bounded memory/IO on
    # production-scale cubes).
    band_h = max(cube.chunk_yx[0], 1)
    n_bands_total = -(-h // band_h)
    budget_bands = max(max_sample_pixels // max(t * w * band_h, 1), 1)
    if budget_bands >= n_bands_total:
        band_starts = np.arange(0, h, band_h)
    else:
        band_starts = rng.choice(np.arange(0, h, band_h),
                                 size=budget_bands, replace=False)

    cat_counts: Dict[str, Dict[int, int]] = {n: {}
                                             for n in cube.cat_names}
    cont_vals: Dict[str, list] = {n: [] for n in cube.cont_names}
    for r0 in sorted(int(r) for r in band_starts):
        r1 = min(r0 + band_h, h)
        if cube.cat_names:
            cat_block = np.asarray(cube.categorical[:, :, r0:r1, :])
            for ci, name in enumerate(cube.cat_names):
                v = cat_block[:, ci].ravel()
                v = v[v != MISS_RAW]
                u, c = np.unique(v, return_counts=True)
                d = cat_counts[name]
                for uu, cc in zip(u, c):
                    d[int(uu)] = d.get(int(uu), 0) + int(cc)
        if cube.cont_names:
            cont_block = np.asarray(cube.continuous[:, :, r0:r1, :],
                                    np.float32)
            for ci, name in enumerate(cube.cont_names):
                v = cont_block[:, ci].ravel()
                cont_vals[name].append(v[np.isfinite(v)])

    cat_schema: Dict[str, Any] = {}
    for name in cube.cat_names:
        items = sorted(cat_counts[name].items())
        raw = np.asarray([k for k, _ in items])
        counts = np.asarray([c for _, c in items])
        cat_schema[name] = collapse_vocab(
            raw, counts, samples_per_epoch, min_hits_per_epoch,
            mass_coverage, vocab_cap)

    cont_schema: Dict[str, Any] = {}
    for name in cube.cont_names:
        vals = np.concatenate(cont_vals[name]) if cont_vals[name] else \
            np.zeros(0, np.float32)
        if vals.size == 0:
            vals = np.zeros(1, np.float32)
        cont_schema[name] = {
            "mean": float(vals.mean()), "std": float(vals.std() + 1e-6),
            "min": float(vals.min()), "max": float(vals.max()),
        }

    # Canopy target stats (mean NAIP CHM band) so the scalar head trains on a
    # standardized target instead of raw meters.
    if cube.naip.shape[-1]:
        sample_rows = np.unique(np.linspace(0, h - 1,
                                            min(h, 64)).astype(int))
        band0 = np.concatenate([
            np.asarray(cube.naip[int(r):int(r) + 1])[..., 0].ravel()
            for r in sample_rows])
        band0 = band0[np.isfinite(band0)]
    else:
        band0 = np.zeros(0, np.float32)
    if band0.size == 0:
        band0 = np.zeros(1, np.float32)
    canopy_stats = {"mean": float(band0.mean()),
                    "std": float(band0.std() + 1e-6)}

    schema = {"categorical": cat_schema, "continuous": cont_schema,
              "canopy": canopy_stats,
              "meta": {"batch_size": batch_size,
                       "steps_per_epoch": steps_per_epoch,
                       "min_hits_per_epoch": min_hits_per_epoch,
                       "mass_coverage": mass_coverage,
                       "vocab_cap": vocab_cap}}
    schema_path = run_dir / "schema.json"
    schema_path.write_text(json.dumps(schema, indent=1))
    feature_meta = {
        "cont_names": list(cube.cont_names),
        "cat_names": list(cube.cat_names),
        "naip_bands": int(cube.naip.shape[-1]),
        "years": [int(y) for y in cube.years],
    }
    (run_dir / "feature_meta.json").write_text(json.dumps(feature_meta,
                                                          indent=1))
    return schema_path


__all__ = ["collapse_vocab", "apply_schema", "dense_to_raw_map",
           "build_and_save_schema", "MISS_ID", "UNK_ID", "MISS_RAW"]
