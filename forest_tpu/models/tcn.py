"""Temporal Convolutional Network encoder (dilated, non-causal, gated).

Behavioral contract from /root/reference/frl/models/tcn.py:24-111,240-301
(SURVEY.md §2.4):

- GatedResidualBlock: dropout -> dilated centered Conv1D -> GroupNorm ->
  gate = sigmoid(1x1 conv of the pre-activation) -> relu -> output =
  gate * new + (1 - gate) * residual (1x1-projected / zero-padded when
  channel counts differ);
- TCNEncoder: a stack of blocks with per-layer dilations; accepts pixel
  time-series ``[N, T, C]`` or spatial blocks ``[B, T, H, W, C]`` (spatial
  dims folded into the batch axis); pooling 'stats' (masked mean + std over
  valid timesteps, eps 1e-8) or 'none'.

Layout: channel-last; conv1d runs as ``nn.Conv`` over the T axis.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class GatedResidualBlock(nn.Module):
    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    dropout_rate: float = 0.0
    num_groups: int = 8

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        # x: [N, T, C_in]
        c_in = x.shape[-1]
        residual = x
        if c_in != self.out_channels:
            residual = nn.Conv(self.out_channels, (1,),
                               name="projection")(x)

        h = x
        if self.dropout_rate > 0.0:
            # Dropout1d semantics: zero whole channels across time.
            h = nn.Dropout(self.dropout_rate, broadcast_dims=(1,),
                           deterministic=deterministic)(h)
        pad = (self.kernel_size - 1) * self.dilation // 2
        h = nn.Conv(self.out_channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,),
                    padding=[(pad, pad)], name="conv")(h)
        from forest_tpu.models.conv2d_encoder import fit_groups
        # epsilon=1e-5 matches torch GroupNorm (reference parity; see
        # utils/torch_import.py).
        h = nn.GroupNorm(num_groups=fit_groups(self.num_groups,
                                               self.out_channels),
                         epsilon=1e-5, name="norm")(h)
        gate = jax.nn.sigmoid(nn.Conv(self.out_channels, (1,),
                                      name="gate")(h))
        h = nn.relu(h)
        return gate * h + (1.0 - gate) * residual


class TCNEncoder(nn.Module):
    channels: Sequence[int]
    kernel_size: int = 3
    dilations: Optional[Sequence[int]] = None
    dropout_rate: float = 0.0
    num_groups: int = 8
    pooling: str = "none"           # 'stats' | 'none'
    post_pool_norm: bool = False

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None, *,
                 deterministic: bool = True) -> Array:
        """x: [N, T, C] or [B, T, H, W, C]; mask: [N, T] / [B, T, H, W]."""
        spatial = x.ndim == 5
        if spatial:
            b, t, h, w, c = x.shape
            x = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b * h * w, t, c)
            if mask is not None:
                mask = jnp.transpose(mask, (0, 2, 3, 1)).reshape(b * h * w, t)

        dil = list(self.dilations or [2 ** i
                                      for i in range(len(self.channels))])
        for i, (ch, d) in enumerate(zip(self.channels, dil)):
            x = GatedResidualBlock(
                out_channels=ch, kernel_size=self.kernel_size, dilation=d,
                dropout_rate=self.dropout_rate, num_groups=self.num_groups,
                name=f"block_{i}")(x, deterministic=deterministic)

        c_out = x.shape[-1]
        if self.pooling == "stats":
            if mask is not None:
                m = mask.astype(x.dtype)[..., None]  # [N, T, 1]
                cnt = jnp.maximum(jnp.sum(m, axis=1), 1.0)
                mean = jnp.sum(x * m, axis=1) / cnt
                var = jnp.sum(((x - mean[:, None]) ** 2) * m, axis=1) / cnt
                std = jnp.sqrt(var + 1e-8)
            else:
                mean = jnp.mean(x, axis=1)
                std = jnp.std(x, axis=1, ddof=1)
            x = jnp.concatenate([mean, std], axis=-1)  # [N, 2C]
            if self.post_pool_norm:
                x = nn.LayerNorm(name="post_norm")(x)
            if spatial:
                x = x.reshape(b, h, w, 2 * c_out)
        elif self.pooling == "none":
            if self.post_pool_norm:
                x = nn.LayerNorm(name="post_norm")(x)
            if spatial:
                x = x.reshape(b, h, w, t, c_out)
                x = jnp.transpose(x, (0, 3, 1, 2, 4))  # [B, T, H, W, C]
        else:
            raise ValueError(f"unknown pooling {self.pooling!r}")
        return x


__all__ = ["TCNEncoder", "GatedResidualBlock"]
