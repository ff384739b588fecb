"""Masked cross-entropy with class weights, label smoothing and ignore_index.

Two reference normalizations exist and differ whenever class weights are
non-uniform, so both are carried via ``normalization``:

- ``"count"`` (default) — /root/reference/frl/losses/categorical.py:100-124:
  per-element weighted NLL (``reduction="none"``) followed by a PLAIN mean
  over valid elements.
- ``"weight_sum"`` — the per-head CE in the legacy loop
  (/root/reference/scripts/train_vqvae.py:296-329): torch's
  ``F.cross_entropy(weight=..., reduction="mean")`` semantics, i.e.
  weighted sum / sum of the weights of contributing targets (so
  zero-weight classes neither count nor dilute). The VQ-VAE step uses
  this mode.

Targets equal to ``ignore_index`` (-100, the vqvae.loader IGNORE_INDEX
convention, SURVEY.md §3) are excluded from both numerator and denominator.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

IGNORE_INDEX = -100


def categorical_loss(logits: Array, target: Array,
                     class_weights: Optional[Array] = None,
                     ignore_index: int = IGNORE_INDEX,
                     label_smoothing: float = 0.0,
                     normalization: str = "count") -> Array:
    """CE over the last axis of ``logits``; ``target`` is integer labels.

    logits: [..., C]; target: [...] int. Returns a scalar. See the module
    docstring for the two ``normalization`` modes.
    """
    if normalization not in ("count", "weight_sum"):
        raise ValueError(f"normalization must be 'count' or 'weight_sum', "
                         f"got {normalization!r}")
    c = logits.shape[-1]
    valid = target != ignore_index
    tgt = jnp.where(valid, target, 0).astype(jnp.int32)

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth

    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)[tgt]
    else:
        w = jnp.ones_like(nll)
    w = jnp.where(valid, w, 0.0)
    if normalization == "count":
        denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    else:  # torch F.cross_entropy(weight=..., reduction="mean")
        denom = jnp.maximum(jnp.sum(w), 1e-8)
    return jnp.sum(nll * w) / denom


__all__ = ["categorical_loss", "IGNORE_INDEX"]
