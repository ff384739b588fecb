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
        min_valid_per_row: int = 2,
        layout: str = "bmn") -> Tuple[Array, Dict[str, Array]]:
    """d_*: nonnegative distances; mask: same-shape bool.

    ``layout="bmn"``: [B, M, M] (pairs leading -- the reference's shape).
    ``layout="mnb"``: [M, M, B] (pairs MINOR): identical math, but the big
    pair axis sits in the TPU lane dimension, so the tensors stay packed
    instead of padding the 15-wide row axis to 128 lanes (8.5x physical
    blowup measured in the FRL step profile).
    ``layout="mnsp"``: [S, M, M, P] (sample leading, pairs minor):
    the sample-grouped builder's native form -- pair weights are [S, P].

    Returns (scalar loss, stats dict of jit-safe scalars).
    """
    if min_valid_per_row < 2:
        raise ValueError(
            f"min_valid_per_row must be >= 2, got {min_valid_per_row}")
    if layout == "bmn":
        b, m = d_reference.shape[0], d_reference.shape[1]
        ax_col, ax_row2 = 2, 1      # col-reduced arrays are [B, M]
    elif layout == "mnb":
        b, m = d_reference.shape[2], d_reference.shape[0]
        ax_col, ax_row2 = 1, 0      # col-reduced arrays are [M, B]
    elif layout == "mnsp":
        b = d_reference.shape[0] * d_reference.shape[3]
        m = d_reference.shape[1]
        ax_col, ax_row2 = 2, 1      # col-reduced arrays are [S, M, P]
    else:
        raise ValueError(f"unknown layout {layout!r}")
    mask = mask.astype(bool)

    logits_ref = jnp.where(mask, -d_reference / tau_ref, LARGE_NEG)
    logits_lrn = jnp.where(mask, -d_learned / tau_learned, LARGE_NEG)

    valid_per_row = jnp.sum(mask, axis=ax_col)
    row_valid = valid_per_row >= min_valid_per_row

    log_p = jax.nn.log_softmax(logits_ref, axis=ax_col)
    log_q = jax.nn.log_softmax(logits_lrn, axis=ax_col)
    p = jnp.exp(log_p)
    # Masked entries have p ~ 0; zero them exactly so 0 * (-inf-ish) is safe.
    contrib = jnp.where(mask, p * (log_p - log_q), 0.0)
    kl_per_row = jnp.sum(contrib, axis=ax_col)
    kl_per_row = jnp.where(row_valid, kl_per_row, 0.0)

    rows_per_pair = jnp.sum(row_valid.astype(kl_per_row.dtype),
                            axis=ax_row2)
    kl_per_pair = jnp.sum(kl_per_row, axis=ax_row2)
    pair_active = rows_per_pair > 0
    kl_normed = jnp.where(pair_active,
                          kl_per_pair / jnp.maximum(rows_per_pair, 1.0), 0.0)

    if pair_weights is None:
        pair_weights = jnp.ones_like(kl_normed)
    # flat [S*P] weights are accepted for the mnsp layout
    weights = (pair_weights.reshape(kl_normed.shape)
               * pair_active.astype(kl_normed.dtype))
    total_w = jnp.sum(weights)
    loss = jnp.where(total_w > 0, jnp.sum(weights * kl_normed)
                     / jnp.maximum(total_w, 1e-12), 0.0)

    n_rows_valid = jnp.sum(row_valid)
    q = jnp.exp(log_q)
    entropy_p = -jnp.sum(jnp.where(mask, p * log_p, 0.0), axis=ax_col)
    entropy_q = -jnp.sum(jnp.where(mask, q * log_q, 0.0), axis=ax_col)
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
