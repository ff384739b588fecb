"""Conv2DEncoder: stack of 1x1 convs with GroupNorm/ReLU/channel dropout.

Behavioral contract from /root/reference/frl/models/conv2d_encoder.py:19-159
(SURVEY.md §2.4): (conv -> GroupNorm -> ReLU -> Dropout2d) x N, bias-free
convs, no activation on the last layer, plus an input Dropout2d (zeroing
entire channel maps) whose rate is a *runtime* curriculum value -- here an
explicit call argument instead of mutable module state, keeping the module
pure under jit (SURVEY.md §8.3 "curricula as scalars").

Layout: channel-last ``[B, H, W, C]`` (TPU-native; the reference's
``[B, C, H, W]`` maps by transpose).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _as_list(v, n):
    if isinstance(v, (list, tuple)):
        assert len(v) == n
        return list(v)
    return [v] * n


def fit_groups(requested: int, channels: int) -> int:
    """Largest divisor of ``channels`` that is <= ``requested`` (GroupNorm
    requires divisibility)."""
    g = max(1, min(requested, channels))
    while channels % g:
        g -= 1
    return g


class Conv2DEncoder(nn.Module):
    channels: Sequence[int]
    kernel_size: Union[int, Sequence[int]] = 1
    dropout_rate: Union[float, Sequence[float]] = 0.0
    num_groups: Union[int, Sequence[int]] = 8
    activation: str = "relu"
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x: Array, *, input_dropout_rate: float = 0.0,
                 deterministic: bool = True) -> Array:
        n = len(self.channels)
        ks = _as_list(self.kernel_size, n)
        dr = _as_list(self.dropout_rate, n)
        ng = _as_list(self.num_groups, n)

        if not deterministic:
            # Channel-zeroing dropout on the raw input (Dropout2d semantics:
            # the whole [H, W] map of a channel is dropped together). The
            # rate is a TRACED curriculum scalar, so the branch is on the
            # static `deterministic` flag only; rate 0 is an exact no-op.
            rate = jnp.asarray(input_dropout_rate, x.dtype)
            key = self.make_rng("dropout")
            keep = jax.random.bernoulli(
                key, 1.0 - rate, (x.shape[0], 1, 1, x.shape[-1]))
            x = jnp.where(keep, x / jnp.maximum(1.0 - rate, 1e-6), 0.0)

        for i, (c, k, d, g) in enumerate(zip(self.channels, ks, dr, ng)):
            # Reference contract (conv2d_encoder.py:104-125): the FINAL
            # stage gets no activation and no dropout even when a trailing
            # projection follows, so its output is unconstrained.
            is_last = i == n - 1
            x = nn.Conv(c, (k, k), padding="SAME", use_bias=False,
                        name=f"conv_{i}")(x)
            # epsilon matches torch GroupNorm (1e-5; flax defaults 1e-6) so
            # activations track the reference bit-closely and imported
            # checkpoints (utils/torch_import.py) reproduce reference outputs.
            x = nn.GroupNorm(num_groups=fit_groups(g, c), epsilon=1e-5,
                             name=f"norm_{i}")(x)
            if not is_last and self.activation == "relu":
                x = nn.relu(x)
            if d > 0.0 and not is_last:
                x = nn.Dropout(d, broadcast_dims=(1, 2),
                               deterministic=deterministic,
                               name=f"drop_{i}")(x)
        # Trailing 1x1 projection only when it changes width, with a bias
        # (reference conv2d_encoder.py:130-138: Conv2d default bias).
        if self.out_channels is not None \
                and self.out_channels != self.channels[-1]:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_out")(x)
        return x


__all__ = ["Conv2DEncoder"]
