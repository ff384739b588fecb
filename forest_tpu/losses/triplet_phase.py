"""Phase triplet ordering + recovery discrimination losses.

Behavioral contracts from /root/reference/frl/losses/triplet_phase.py
(SURVEY.md §2.5):

- three sampled years t0 < t1 < t2 per pixel; the ysfc series classifies each
  pixel into one of four cases (triplet_phase.py:20-83):
    * disturbance only in (t0, t1):  d(1,2) < d(0,1) - L ; d(1,2) < d(0,2) - L ;
      d(0,2) < d(0,1) - S
    * disturbance only in (t1, t2):  mirrored
    * no disturbance: d(0,1) < d(0,2) - S ; d(1,2) < d(0,2) - S
    * disturbance at a sampled year or in both intervals: skip;
  squared-L2 distances, soft-margin ``softplus(d_close - d_far + margin)``,
  mean over constraints (:239-351);
- ``phase_recovery_discrimination_loss``: per-pixel
  ``softplus(margin - ||z(ysfc<=low) - z(ysfc>=high)||)`` over all
  (disturbed, recovered) timestep pairs (:352-426).

TPU-native: the per-case constraint tables become a static [4, 3, ...]
lookup indexed by a per-pixel case id; every pixel carries exactly 3
constraint slots with a validity mask (case NONE uses 2, case SKIP uses 0).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Constraint tables: [case, slot, (closer_a, closer_b, farther_a, farther_b)]
# case 0 = d01, 1 = d12, 2 = none, 3 = skip.
_SLOTS = np.zeros((4, 3, 4), np.int32)
_LARGE = np.zeros((4, 3), bool)
_VALID = np.zeros((4, 3), bool)
_SLOTS[0] = [(1, 2, 0, 1), (1, 2, 0, 2), (0, 2, 0, 1)]
_LARGE[0] = [True, True, False]
_VALID[0] = [True, True, True]
_SLOTS[1] = [(0, 1, 1, 2), (0, 1, 0, 2), (0, 2, 1, 2)]
_LARGE[1] = [True, True, False]
_VALID[1] = [True, True, True]
_SLOTS[2] = [(0, 1, 0, 2), (1, 2, 0, 2), (0, 0, 0, 0)]
_LARGE[2] = [False, False, False]
_VALID[2] = [True, True, False]


def classify_triplet_batch(ysfc: Array, t0: int, t1: int, t2: int) -> Array:
    """Per-pixel case id [N]: 0=d01, 1=d12, 2=none, 3=skip."""
    at_sample = (ysfc[:, t0] == 0) | (ysfc[:, t1] == 0) | (ysfc[:, t2] == 0)
    d01 = jnp.any(ysfc[:, t0 + 1:t1] == 0, axis=1) if t1 > t0 + 1 else \
        jnp.zeros(ysfc.shape[0], bool)
    d12 = jnp.any(ysfc[:, t1 + 1:t2] == 0, axis=1) if t2 > t1 + 1 else \
        jnp.zeros(ysfc.shape[0], bool)
    skip = at_sample | (d01 & d12)
    case = jnp.where(d01 & ~d12, 0, jnp.where(d12 & ~d01, 1, 2))
    return jnp.where(skip, 3, case).astype(jnp.int32)


def phase_triplet_loss(embeddings_t0: Array, embeddings_t1: Array,
                       embeddings_t2: Array, ysfc: Array,
                       t0_idx: int, t1_idx: int, t2_idx: int,
                       large_margin: float = 1.0,
                       small_margin: float = 0.3
                       ) -> Tuple[Array, Dict[str, Array]]:
    n = embeddings_t0.shape[0]
    case = classify_triplet_batch(ysfc, t0_idx, t1_idx, t2_idx)  # [N]

    slots = jnp.asarray(_SLOTS)[case]        # [N, 3, 4]
    is_large = jnp.asarray(_LARGE)[case]     # [N, 3]
    valid = jnp.asarray(_VALID)[case] & (case[:, None] != 3)

    emb = jnp.stack([embeddings_t0, embeddings_t1, embeddings_t2],
                    axis=1)                   # [N, 3, D]
    nn_idx = jnp.arange(n)[:, None]

    def gather(sl):
        return emb[nn_idx, sl]                # [N, 3, D]

    d_close = jnp.sum((gather(slots[..., 0]) - gather(slots[..., 1])) ** 2,
                      axis=-1)                # [N, 3] squared L2
    d_far = jnp.sum((gather(slots[..., 2]) - gather(slots[..., 3])) ** 2,
                    axis=-1)
    margin = jnp.where(is_large, large_margin, small_margin)
    violation = d_close - d_far + margin
    per = jax.nn.softplus(violation) * valid.astype(d_close.dtype)
    k = jnp.sum(valid)
    loss = jnp.sum(per) / jnp.maximum(k, 1)

    stats = {
        "n_constraints": k.astype(jnp.int32),
        "n_large": jnp.sum(is_large & valid).astype(jnp.int32),
        "n_small": jnp.sum(~is_large & valid).astype(jnp.int32),
        "n_pixels_valid": jnp.sum((case != 3).astype(jnp.int32)),
        "n_pixels_skipped": jnp.sum((case == 3).astype(jnp.int32)),
        # zero valid constraints -> vacuously ALL satisfied (reference
        # triplet_phase.py:295 K==0 early-return reports 1.0)
        "frac_satisfied": jnp.where(
            k > 0, jnp.sum((violation < 0) & valid) / jnp.maximum(k, 1),
            1.0),
    }
    return loss, stats


def phase_recovery_discrimination_loss(
        z_phase: Array, ysfc: Array, margin: float = 0.5,
        low_ysfc_max: float = 1.0, high_ysfc_min: float = 5.0
        ) -> Tuple[Array, Dict[str, Array]]:
    """z_phase [N, T, D]; ysfc [N, T] (NaN = invalid)."""
    valid = jnp.isfinite(ysfc) & (ysfc >= 0)
    is_low = valid & (ysfc <= low_ysfc_max)
    is_high = valid & (ysfc >= high_ysfc_min)
    active = jnp.any(is_low, axis=1) & jnp.any(is_high, axis=1)  # [N]

    pair_mask = (is_low[:, :, None] & is_high[:, None, :]
                 & active[:, None, None])                         # [N, T, T]
    d2 = jnp.sum((z_phase[:, :, None, :] - z_phase[:, None, :, :]) ** 2,
                 axis=-1)
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))
    per = jax.nn.softplus(margin - d) * pair_mask.astype(d.dtype)
    n_pairs = jnp.sum(pair_mask)
    loss = jnp.sum(per) / jnp.maximum(n_pairs, 1)
    return loss, {"n_pairs": n_pairs.astype(jnp.int32),
                  "n_active_pixels": jnp.sum(active.astype(jnp.int32))}


__all__ = ["phase_triplet_loss", "phase_recovery_discrimination_loss",
           "classify_triplet_batch"]
