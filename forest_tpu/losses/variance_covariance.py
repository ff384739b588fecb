"""VICReg-style variance + covariance regularizer.

Contract from /root/reference/frl/losses/variance_covariance.py:14-156
(SURVEY.md §2.5): a hinge on per-dimension std against a target, plus the mean
squared off-diagonal covariance. Mask-based so anchor counts can vary without
dynamic shapes.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def variance_covariance_loss(z: Array, mask: Optional[Array] = None,
                             std_target: float = 1.0,
                             variance_weight: float = 1.0,
                             covariance_weight: float = 1.0,
                             eps: float = 1e-4
                             ) -> Tuple[Array, Array, Array]:
    """Returns (total, variance_term, covariance_term) for z [N, D].

    variance_term = mean_d relu(std_target - std_d)
    covariance_term = (1/D) * sum_{i != j} cov_ij^2
    """
    z = z.astype(jnp.float32)
    n, d = z.shape
    if mask is None:
        w = jnp.ones((n,), jnp.float32)
    else:
        w = mask.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w), 2.0)
    mu = jnp.sum(z * w[:, None], axis=0) / cnt
    zc = (z - mu) * w[:, None]
    var = jnp.sum(zc * zc, axis=0) / (cnt - 1.0)
    std = jnp.sqrt(var + eps)
    variance_term = jnp.mean(jax.nn.relu(std_target - std))

    cov = jnp.dot(zc.T, zc, preferred_element_type=jnp.float32) / (cnt - 1.0)
    off = cov * (1.0 - jnp.eye(d, dtype=cov.dtype))
    covariance_term = jnp.sum(off * off) / d

    total = variance_weight * variance_term + covariance_weight * covariance_term
    return total, variance_term, covariance_term


__all__ = ["variance_covariance_loss"]
