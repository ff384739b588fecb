"""Masked count losses: Poisson and Negative Binomial NLL.

Contract from /root/reference/frl/losses/count.py:27 (SURVEY.md §2.5).
``log_rate`` parameterization keeps the loss safe for any real input.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _masked_mean(x: Array, valid: Array) -> Array:
    x = jnp.where(valid, x, 0.0)
    return jnp.sum(x) / jnp.maximum(jnp.sum(valid.astype(x.dtype)), 1.0)


def count_loss(log_rate: Array, target: Array, mask: Optional[Array] = None,
               kind: str = "poisson", dispersion: float = 1.0) -> Array:
    """NLL of counts under Poisson(rate=exp(log_rate)) or NegBinomial.

    NegBinomial uses the (mu, alpha) mean/dispersion parameterization with
    alpha = ``dispersion``; alpha -> 0 recovers Poisson.
    """
    finite = jnp.isfinite(target)
    valid = finite if mask is None else (finite & (mask > 0))
    y = jnp.where(valid, target, 0.0).astype(jnp.float32)
    lr = log_rate.astype(jnp.float32)

    if kind == "poisson":
        nll = jnp.exp(lr) - y * lr + jax.lax.lgamma(y + 1.0)
    elif kind in ("negbinomial", "nb"):
        a = jnp.float32(dispersion)
        mu = jnp.exp(lr)
        ia = 1.0 / a
        nll = -(jax.lax.lgamma(y + ia) - jax.lax.lgamma(ia)
                - jax.lax.lgamma(y + 1.0)
                + ia * jnp.log(ia / (ia + mu))
                + y * jnp.log(mu / (ia + mu) + 1e-12))
    else:
        raise ValueError(f"unknown count loss kind {kind!r}")
    return _masked_mean(nll, valid)


__all__ = ["count_loss"]
