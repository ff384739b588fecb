"""Soft neighborhood matching: row-softmax KL over aligned distance matrices.

Behavioral contract from /root/reference/frl/losses/soft_neighborhood.py:46-200
(SURVEY.md §2.5): given reference and learned pairwise-distance matrices
[B, M, M] with a validity mask, form row distributions p = softmax(-d_ref/tau),
q = softmax(-d_learned/tau) with a finite -1e9 sentinel on masked entries
(NaN-safe for fully-masked padding rows), take KL(p || q) per row, skip rows
with fewer than ``min_valid_per_row`` valid entries, average per pair over
valid rows, then weight across pairs. All aggregation is mask-based so the
function is jit-safe with static shapes.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

LARGE_NEG = -1e9


def soft_neighborhood_matching_loss(
        d_reference: Array, d_learned: Array, mask: Array,
        tau_ref: float = 1.0, tau_learned: float = 1.0,
        pair_weights: Optional[Array] = None,
        min_valid_per_row: int = 2) -> Tuple[Array, Dict[str, Array]]:
    """d_*: [B, M, M] nonnegative distances; mask: [B, M, M] bool.

    Returns (scalar loss, stats dict of jit-safe scalars).
    """
    if min_valid_per_row < 2:
        raise ValueError(
            f"min_valid_per_row must be >= 2, got {min_valid_per_row}")
    b, m, _ = d_reference.shape
    mask = mask.astype(bool)

    logits_ref = jnp.where(mask, -d_reference / tau_ref, LARGE_NEG)
    logits_lrn = jnp.where(mask, -d_learned / tau_learned, LARGE_NEG)

    valid_per_row = jnp.sum(mask, axis=2)              # [B, M]
    row_valid = valid_per_row >= min_valid_per_row     # [B, M]

    log_p = jax.nn.log_softmax(logits_ref, axis=2)
    log_q = jax.nn.log_softmax(logits_lrn, axis=2)
    p = jnp.exp(log_p)
    # Masked entries have p ~ 0; zero them exactly so 0 * (-inf-ish) is safe.
    contrib = jnp.where(mask, p * (log_p - log_q), 0.0)
    kl_per_row = jnp.sum(contrib, axis=2)              # [B, M]
    kl_per_row = jnp.where(row_valid, kl_per_row, 0.0)

    rows_per_pair = jnp.sum(row_valid.astype(kl_per_row.dtype), axis=1)
    kl_per_pair = jnp.sum(kl_per_row, axis=1)
    pair_active = rows_per_pair > 0
    kl_normed = jnp.where(pair_active,
                          kl_per_pair / jnp.maximum(rows_per_pair, 1.0), 0.0)

    if pair_weights is None:
        pair_weights = jnp.ones((b,), kl_normed.dtype)
    weights = pair_weights * pair_active.astype(kl_normed.dtype)
    total_w = jnp.sum(weights)
    loss = jnp.where(total_w > 0, jnp.sum(weights * kl_normed)
                     / jnp.maximum(total_w, 1e-12), 0.0)

    n_rows_valid = jnp.sum(row_valid)
    q = jnp.exp(log_q)
    entropy_p = -jnp.sum(jnp.where(mask, p * log_p, 0.0), axis=2)
    entropy_q = -jnp.sum(jnp.where(mask, q * log_q, 0.0), axis=2)
    rv = row_valid.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(rv), 1.0)
    stats = {
        "n_pairs": jnp.int32(b),
        "n_pairs_active": jnp.sum(pair_active.astype(jnp.int32)),
        "n_rows_total": jnp.int32(b * m),
        "n_rows_valid": n_rows_valid.astype(jnp.int32),
        "mean_kl": loss,
        "mean_overlap": jnp.sum(valid_per_row * rv) / denom,
        "mean_entropy_p": jnp.sum(entropy_p * rv) / denom,
        "mean_entropy_q": jnp.sum(entropy_q * rv) / denom,
    }
    return loss, stats


def pairwise_sq_distances(x: Array) -> Array:
    """[.., M, D] -> [.., M, M] squared L2 distances (MXU-friendly)."""
    x2 = jnp.sum(x * x, axis=-1)
    xy = jnp.einsum("...md,...nd->...mn", x, x)
    d = x2[..., :, None] - 2.0 * xy + x2[..., None, :]
    return jnp.maximum(d, 0.0)


__all__ = ["soft_neighborhood_matching_loss", "pairwise_sq_distances",
           "LARGE_NEG"]
