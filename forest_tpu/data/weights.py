"""Class-weight construction for imbalanced categorical heads.

Behavioral contract from /root/reference/utils/weights.py:28-76 (SURVEY.md §3):
weights aligned to dense IDs (MISS=0, UNK=1), modes uniform / inv / sqrt_inv
over raw per-id counts, MISS and UNK zeroed, normalized so the mean nonzero
weight is 1.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

MISS_ID, UNK_ID = 0, 1


def cat_class_weights(schema_feature_entry: Dict[str, Any],
                      mode: str = "sqrt_inv", eps: float = 1e-6) -> np.ndarray:
    """Per-class CE weights [num_ids] (float32) for one categorical feature."""
    num_ids = int(schema_feature_entry["num_ids"])
    counts = np.asarray(
        schema_feature_entry.get("counts_per_id", [0.0] * num_ids),
        dtype=np.float64)
    if counts.size >= num_ids:
        counts = counts[:num_ids]
    else:
        counts = np.pad(counts, (0, num_ids - counts.size))

    if mode == "uniform":
        w = np.ones(num_ids, dtype=np.float64)
    elif mode == "inv":
        w = 1.0 / (counts + eps)
    elif mode == "sqrt_inv":
        w = 1.0 / np.sqrt(counts + eps)
    else:
        raise ValueError(f"unknown class-weight mode {mode!r}")

    w[MISS_ID] = 0.0
    w[UNK_ID] = 0.0
    nz = w[w > 0]
    if nz.size:
        w = w / (nz.mean() + eps)
    return w.astype(np.float32)


__all__ = ["cat_class_weights", "MISS_ID", "UNK_ID"]
