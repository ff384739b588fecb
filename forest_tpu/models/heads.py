"""Output heads: MLP / Linear / Conv2D / SimCLR projection.

Behavioral contract from /root/reference/frl/models/heads.py:16-242
(SURVEY.md §2.4). Channel-last; 1x1 convs are Dense layers. The projection
head's torch BatchNorm is replaced by LayerNorm (stateless under jit; the
reference runs with the projection head disabled --
frl_repr_model_v1.yaml:76-79 -- so only the shape contract matters).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class MLPHead(nn.Module):
    hidden_dims: Sequence[int]
    output_dim: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        for i, h in enumerate(self.hidden_dims):
            x = nn.relu(nn.Dense(h, name=f"hidden_{i}")(x))
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate,
                               deterministic=deterministic)(x)
        return nn.Dense(self.output_dim, name="out")(x)


class LinearHead(nn.Module):
    output_dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Dense(self.output_dim)(x)


class Conv2DHead(nn.Module):
    output_dim: int
    hidden_dim: Optional[int] = None
    kernel_size: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.hidden_dim:
            x = nn.relu(nn.Conv(self.hidden_dim,
                                (self.kernel_size,) * 2,
                                padding="SAME")(x))
        return nn.Conv(self.output_dim, (self.kernel_size,) * 2,
                       padding="SAME")(x)


class MLPProjectionHead(nn.Module):
    """SimCLR-style: Dense -> norm -> ReLU -> Dense [-> L2 normalize]."""
    hidden_dim: int
    output_dim: int
    l2_normalize: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Dense(self.hidden_dim, name="fc1")(x)
        h = nn.LayerNorm(name="norm")(h)
        h = nn.relu(h)
        z = nn.Dense(self.output_dim, name="fc2")(h)
        if self.l2_normalize:
            z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
        return z


__all__ = ["MLPHead", "LinearHead", "Conv2DHead", "MLPProjectionHead"]
