"""Derived feature channels: temporal deltas and Sobel gradients.

Behavioral contract from /root/reference/frl/data/loaders/builders/
derived_features_builder.py (SURVEY.md §2.3 "legacy bundle builders" --
temporal-difference and Sobel edge channels appended to model inputs).
The reference version is superseded by FeatureBuilder; these are kept as
jit-safe standalone ops so bindings can request derived channels without a
separate builder class.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def temporal_deltas(x: Array, order: int = 1,
                    prepend_zero: bool = True) -> Array:
    """[.., T, H, W, C] (or [N, T, C]) -> same-shape first differences
    along the T axis (axis -4 for grids, -2 for series). NaN-propagating."""
    t_axis = x.ndim - 4 if x.ndim >= 4 else x.ndim - 2
    out = x
    for _ in range(order):
        d = jnp.diff(out, axis=t_axis)
        if prepend_zero:
            pad = [(0, 0)] * x.ndim
            pad[t_axis] = (1, 0)
            d = jnp.pad(d, pad)
        out = d
    return out


def sobel_channels(x: Array, eps: float = 1e-12) -> Array:
    """[.., H, W, C] -> gradient magnitude per channel (Sobel /4)."""
    from forest_tpu.models.spatial import _sobel, depthwise_bank_conv

    sx, sy = _sobel()
    lead = x.shape[:-3]
    flat = x.reshape((-1,) + x.shape[-3:])
    g = depthwise_bank_conv(jnp.nan_to_num(flat),
                            np.stack([sx, sy]))        # [N, H, W, C, 2]
    mag = jnp.sqrt(jnp.sum(g * g, axis=-1) + eps)
    return mag.reshape(lead + x.shape[-3:])


def rolling_mean(x: Array, window: int = 3) -> Array:
    """Centered rolling mean along the T axis (NaN-safe)."""
    t_axis = x.ndim - 4 if x.ndim >= 4 else x.ndim - 2
    finite = jnp.isfinite(x)
    xz = jnp.where(finite, x, 0.0)
    k = window // 2
    num = jnp.zeros_like(xz)
    den = jnp.zeros_like(xz)
    t = x.shape[t_axis]
    for off in range(-k, k + 1):
        idx = jnp.clip(jnp.arange(t) + off, 0, t - 1)
        num = num + jnp.take(xz, idx, axis=t_axis)
        den = den + jnp.take(finite.astype(x.dtype), idx, axis=t_axis)
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), jnp.nan)


__all__ = ["temporal_deltas", "sobel_channels", "rolling_mean"]
