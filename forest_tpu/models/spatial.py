"""Edge-aware spatial smoothing modules.

EdgeAwareSmoothingConv2D -- behavioral contract from
/root/reference/frl/models/spatial.py:165-343 (SURVEY.md §2.4):

- fixed 4-orientation directional filter bank (horizontal / vertical /
  main-diagonal / anti-diagonal 3-tap means) at two scales (dilation 1 and
  ``coarse_dilation``), K = 4 * 2 filters, applied depthwise;
- fixed Sobel gradients feed a shared conv backbone predicting rank-R
  factored mixing weights: W[k, c] = sum_r A[k, r] * B[c, r] with a K-way
  softmax over A's direction axis and an R-way softmax over B's slot axis;
- residual edge gate: gate = sigmoid(conv(relu(conv(x - smoothed)))),
  clamped from below by a curriculum ``min_gate`` (1 = identity), and
  ``output = smoothed + gate * (x - smoothed)``.

TPU-native formulation: the filter bank + rank-R mixing runs as ONE fused
Pallas pass per row tile (``forest_tpu/ops/smoothing.bank_mix``) -- the
directional 3-tap means are in-VMEM shift-adds contracted against the
mixing weights on the fly, so the [B, H, W, C, K] filtered tensor never
touches HBM. On non-TPU backends the same op falls back to a grouped
``lax.conv_general_dilated`` pair + einsum (the parity oracle).

GatedResidualConv2D is the retained predecessor
(/root/reference/frl/models/spatial.py:15-162): per-pixel learned gate
blending a smoothing conv with the identity.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# _direction_bank/_sobel/depthwise_bank_conv are re-exported here for
# existing importers (tests, derived_features).
from forest_tpu.ops.smoothing import (_direction_bank, _sobel,  # noqa: F401
                                      bank_mix, depthwise_bank_conv,
                                      sobel_grads)

Array = jax.Array


class EdgeAwareSmoothingConv2D(nn.Module):
    channels: int
    kernel_size: int = 3
    gate_hidden: int = 64
    gate_kernel_size: int = 3
    num_directions: int = 4
    coarse_dilation: int = 3
    rank: int = 4
    # Optional reduced-precision compute (params stay fp32): "bfloat16"
    # measured ~22% faster at [12,256,256,48] on v5e (CLAUDE.md perf notes).
    compute_dtype: Optional[str] = None
    # None = fused Pallas bank+mixing kernel on TPU, XLA path elsewhere.
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: Array, *, min_gate: float = 0.0,
                 return_gate: bool = False):
        in_dtype = x.dtype
        cdt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        if cdt is not None:
            x = x.astype(cdt)
        b, h, w, c = x.shape
        nd, r = self.num_directions, self.rank
        k = nd * 2

        # Per-channel Sobel gradients -> shared mixing backbone.
        feat = sobel_grads(x)  # [B,H,W,2C], gx/gy interleaved per channel
        feat = nn.relu(nn.Conv(self.gate_hidden, (3, 3), padding="SAME",
                               dtype=cdt, name="mix_backbone")(feat))

        a_logits = nn.Conv(k * r, (1, 1), dtype=cdt,
                           name="mix_head_A")(feat)
        a_w = jax.nn.softmax(a_logits.reshape(b, h, w, k, r), axis=3)
        b_logits = nn.Conv(c * r, (1, 1), dtype=cdt,
                           name="mix_head_B")(feat)
        b_w = jax.nn.softmax(b_logits.reshape(b, h, w, c, r), axis=4)

        # Fused fine/coarse filter bank + rank-R mixing (filters interleaved
        # 2i = fine, 2i+1 = coarse to match the reference's A indexing):
        # smoothed[c] = sum_k filtered[c,k] * sum_r A[k,r] * B[c,r]
        smoothed = bank_mix(x, a_w, b_w, num_directions=nd,
                            coarse_dilation=self.coarse_dilation,
                            use_pallas=self.use_pallas)

        residual = x - smoothed
        g = nn.Conv(self.gate_hidden, (self.gate_kernel_size,) * 2,
                    padding="SAME", dtype=cdt, name="gate_0")(residual)
        g = nn.Conv(self.channels, (self.gate_kernel_size,) * 2,
                    padding="SAME", dtype=cdt, name="gate_1")(nn.relu(g))
        gate = jax.nn.sigmoid(g)
        gate = jnp.maximum(gate, jnp.asarray(min_gate, gate.dtype))
        out = (smoothed + gate * residual).astype(in_dtype)
        if return_gate:
            return out, gate.astype(in_dtype)
        return out


class GatedResidualConv2D(nn.Module):
    """Predecessor smoothing block (pre-exp018), retained for checkpoint
    compatibility: out = gate * x + (1 - gate) * conv_smooth(x)."""
    channels: int
    num_layers: int = 2
    kernel_size: int = 3
    gate_hidden: int = 64
    gate_kernel_size: int = 3

    @nn.compact
    def __call__(self, x: Array, *, min_gate: float = 0.0,
                 return_gate: bool = False):
        s = x
        for i in range(self.num_layers):
            s = nn.Conv(self.channels, (self.kernel_size,) * 2,
                        padding="SAME", name=f"smooth_{i}")(s)
            if i < self.num_layers - 1:
                s = nn.relu(s)
        g = nn.Conv(self.gate_hidden, (self.gate_kernel_size,) * 2,
                    padding="SAME", name="gate_0")(x)
        g = nn.Conv(self.channels, (self.gate_kernel_size,) * 2,
                    padding="SAME", name="gate_1")(nn.relu(g))
        gate = jnp.maximum(jax.nn.sigmoid(g), min_gate)
        out = gate * x + (1.0 - gate) * s
        if return_gate:
            return out, gate
        return out


__all__ = ["EdgeAwareSmoothingConv2D", "GatedResidualConv2D",
           "depthwise_bank_conv"]
