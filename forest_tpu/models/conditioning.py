"""FiLM conditioning: gamma/beta generation from z_type.

Behavioral contract from /root/reference/frl/models/conditioning.py:16-102
(SURVEY.md §2.4): two small MLPs (1x1 convs == Dense on channel-last)
generate gamma (last layer init: weights ~ N(0, 0.01), bias = 1) and beta
(bias = 0) so FiLM starts near identity but responds to z_type immediately;
``modulate`` applies gamma * h + beta; ``broadcast_to_time`` expands
per-pixel parameters over the T axis.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class FiLMLayer(nn.Module):
    target_dim: int
    hidden_dim: Optional[int] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, conditioning: Array) -> Tuple[Array, Optional[Array]]:
        """conditioning: [..., cond_dim] -> (gamma, beta) each [..., target]."""
        cond_dim = conditioning.shape[-1]
        hidden = self.hidden_dim or max(cond_dim, self.target_dim) // 2

        def head(name, bias_init):
            h = nn.relu(nn.Dense(hidden, name=f"{name}_0")(conditioning))
            return nn.Dense(
                self.target_dim, name=f"{name}_1",
                kernel_init=nn.initializers.normal(0.01),
                bias_init=bias_init)(h)

        gamma = head("gamma", nn.initializers.ones)
        beta = head("beta", nn.initializers.zeros) if self.use_bias else None
        return gamma, beta

    @staticmethod
    def modulate(features: Array, gamma: Array,
                 beta: Optional[Array] = None) -> Array:
        out = gamma * features
        return out + beta if beta is not None else out


def broadcast_to_time(params: Array, t: int, time_axis: int = 1) -> Array:
    """[N, D] -> [N, T, D] (or general axis insertion + broadcast)."""
    expanded = jnp.expand_dims(params, time_axis)
    shape = list(expanded.shape)
    shape[time_axis] = t
    return jnp.broadcast_to(expanded, shape)


class FiLMConditionedBlock(nn.Module):
    """Dense block whose activations are FiLM-modulated by a conditioner."""
    features: int

    @nn.compact
    def __call__(self, x: Array, conditioning: Array) -> Array:
        h = nn.Dense(self.features)(x)
        gamma, beta = FiLMLayer(target_dim=self.features)(conditioning)
        return nn.relu(FiLMLayer.modulate(h, gamma, beta))


__all__ = ["FiLMLayer", "FiLMConditionedBlock", "broadcast_to_time"]
