"""Masked reconstruction losses (L1 / L2 / Huber / SmoothL1).

Contract from /root/reference/frl/losses/reconstruction.py:28 (SURVEY.md §2.5)
and the nan-safe MSE used by the legacy VQ-VAE loop
(/root/reference/scripts/train_vqvae.py:296-329): invalid targets (NaN or
mask==0) contribute zero and the mean is over valid elements only.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _elementwise(pred: Array, target: Array, kind: str, delta: float) -> Array:
    err = pred - target
    if kind in ("l2", "mse"):
        return err * err
    if kind in ("l1", "mae"):
        return jnp.abs(err)
    if kind in ("huber", "smooth_l1"):
        a = jnp.abs(err)
        quad = 0.5 * err * err / delta
        lin = a - 0.5 * delta
        out = jnp.where(a <= delta, quad, lin)
        return out * delta if kind == "huber" else out
    raise ValueError(f"unknown reconstruction loss kind {kind!r}")


def reconstruction_loss(pred: Array, target: Array,
                        mask: Optional[Array] = None, kind: str = "l2",
                        delta: float = 1.0) -> Array:
    """NaN-safe masked reconstruction loss; mean over valid elements.

    ``mask`` (same/broadcastable shape, 1=valid) is ANDed with finiteness of
    the target. Returns 0.0 when nothing is valid.
    """
    finite = jnp.isfinite(target)
    valid = finite if mask is None else (finite & (mask > 0))
    tgt = jnp.where(valid, target, 0.0)
    prd = jnp.where(valid, pred, 0.0)
    per = _elementwise(prd, tgt, kind, delta)
    per = jnp.where(valid, per, 0.0)
    denom = jnp.maximum(jnp.sum(valid.astype(per.dtype)), 1.0)
    return jnp.sum(per) / denom


__all__ = ["reconstruction_loss"]
