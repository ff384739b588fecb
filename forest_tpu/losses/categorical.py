"""Masked cross-entropy with class weights, label smoothing and ignore_index.

Contract from /root/reference/frl/losses/categorical.py:29 and the per-head CE
in the legacy loop (/root/reference/scripts/train_vqvae.py:296-329): targets
equal to ``ignore_index`` (-100, the vqvae.loader IGNORE_INDEX convention,
SURVEY.md §3) are excluded; per-class weights reweight the mean exactly as
torch's ``F.cross_entropy(weight=...)`` does (weighted sum / sum of weights of
contributing targets).
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
                     label_smoothing: float = 0.0) -> Array:
    """CE over the last axis of ``logits``; ``target`` is integer labels.

    logits: [..., C]; target: [...] int. Returns a scalar.
    """
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
    # Reference normalization (categorical.py:100-124): per-element
    # weighted NLL (reduction="none"), then a PLAIN mean over valid
    # elements -- NOT torch's default divide-by-weight-sum.
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(nll * w) / denom


__all__ = ["categorical_loss", "IGNORE_INDEX"]
