"""Phase pair construction: spectral kNN -> ysfc-overlap filter -> weights.

Behavioral contract from /root/reference/frl/losses/phase_pairs.py:31-250
(SURVEY.md §2.5):

  stage 1: k nearest spectral (whitened) neighbors per anchor, self excluded;
  stage 2: keep pairs sharing >= ``min_overlap`` unique ysfc values (counted
           via a binary presence matrix matmul);
  stage 3: drop anchors with < ``min_pairs`` surviving cross pairs;
  weights: Gaussian ``exp(-||spec_i - spec_j|| / sigma)``; optional
           self-pairs (i, i) at ``self_pair_weight`` for surviving anchors.

TPU-native: fixed output shapes -- pairs [N*k + N, 2] with a validity mask
(cross candidates followed by self-pair slots); ysfc presence uses a static
``num_classes`` bound instead of a data-dependent max.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def ysfc_overlap_matrix(ysfc: Array, num_classes: int) -> Array:
    """[N, T] integer series -> [N, N] counts of shared unique values.

    Negative / out-of-range values are ignored.
    """
    n, t = ysfc.shape
    # Validity in the FLOAT domain: NaN (missing) must fail here -- an int
    # cast of NaN is implementation-defined and can alias ysfc==0, which
    # means "disturbance year".
    ok = jnp.isfinite(ysfc) & (ysfc >= 0) & (ysfc < num_classes)
    y = jnp.where(ok, ysfc, 0).astype(jnp.int32)
    yc = jnp.clip(y, 0, num_classes - 1)
    presence = jnp.zeros((n, num_classes), jnp.float32)
    presence = presence.at[jnp.arange(n)[:, None], yc].max(
        ok.astype(jnp.float32))
    return jnp.dot(presence, presence.T,
                   preferred_element_type=jnp.float32)


def build_phase_pairs(spec_features: Array, ysfc: Array, k: int = 16,
                      min_overlap: int = 3, min_pairs: int = 5,
                      include_self: bool = True, sigma: float = 5.0,
                      self_pair_weight: float = 1.0,
                      num_ysfc_classes: int = 64,
                      valid_anchors: Optional[Array] = None
                      ) -> Tuple[Array, Array, Array, Dict[str, Array]]:
    """Returns (pairs [N*k+N, 2], weights [N*k+N], valid [N*k+N], stats).

    ``valid_anchors`` [N] bool: invalid anchors are excluded from the kNN
    CANDIDATE lists (not just masked afterwards), so they neither occupy
    neighbor slots that displace valid anchors nor count toward the
    ``min_pairs`` stage-3 filter -- matching the reference, whose sampler
    only ever yields valid phase anchors (reference step.py:417-424).
    """
    n = spec_features.shape[0]
    k = min(k, max(n - 1, 1))

    # Stage 1: spectral kNN (L2, self excluded).
    x = spec_features.astype(jnp.float32)
    x2 = jnp.sum(x * x, axis=1)
    d2 = jnp.maximum(x2[:, None] - 2.0 * x @ x.T + x2[None, :], 0.0)
    d = jnp.sqrt(d2)
    d_noself = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d)
    if valid_anchors is not None:
        va = valid_anchors.astype(bool)
        d_noself = jnp.where(va[None, :], d_noself, jnp.inf)
    _, knn_idx = jax.lax.top_k(-d_noself, k)        # [N, k]

    anchor = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k)).reshape(-1)
    target = knn_idx.reshape(-1)
    cand_valid = jnp.ones((n * k,), bool) if n > 1 else \
        jnp.zeros((n * k,), bool)
    if valid_anchors is not None:
        cand_valid = cand_valid & va[anchor] & va[target]

    # Stage 2: ysfc overlap filter.
    overlap = ysfc_overlap_matrix(ysfc, num_ysfc_classes)
    pair_overlap = overlap[anchor, target]
    ok = cand_valid & (pair_overlap >= min_overlap)

    # Stage 3: anchors need >= min_pairs surviving cross pairs.
    per_anchor = jax.ops.segment_sum(ok.astype(jnp.int32), anchor, n)
    anchors_ok = per_anchor >= min_pairs
    cross_valid = ok & anchors_ok[anchor]

    cross_d = d[anchor, target]
    cross_w = jnp.exp(-cross_d / sigma)

    # Self-pair slots.
    self_pairs = jnp.stack([jnp.arange(n), jnp.arange(n)], axis=1)
    self_valid = anchors_ok & bool(include_self)
    if valid_anchors is not None:
        self_valid = self_valid & va
    self_w = jnp.full((n,), self_pair_weight, jnp.float32)

    pairs = jnp.concatenate(
        [jnp.stack([anchor, target], axis=1), self_pairs]).astype(jnp.int32)
    weights = jnp.concatenate([cross_w, self_w])
    valid = jnp.concatenate([cross_valid, self_valid])

    cv = cross_valid.astype(jnp.float32)
    ncross = jnp.maximum(jnp.sum(cv), 1.0)
    stats = {
        "n_anchors": jnp.int32(n),
        "n_anchors_surviving": jnp.sum(anchors_ok.astype(jnp.int32)),
        "n_candidates": jnp.sum(cand_valid.astype(jnp.int32)),
        "n_after_overlap": jnp.sum(ok.astype(jnp.int32)),
        "n_self_pairs": jnp.sum(self_valid.astype(jnp.int32)),
        "n_total_pairs": jnp.sum(valid.astype(jnp.int32)),
        "overlap_mean": jnp.sum(pair_overlap * cv) / ncross,
        "weight_mean": jnp.sum(cross_w * cv) / ncross,
        "dist_mean": jnp.sum(cross_d * cv) / ncross,
    }
    return pairs, weights, valid, stats


__all__ = ["build_phase_pairs", "ysfc_overlap_matrix"]
