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

TPU-native formulation: all K depthwise convs run as ONE
``lax.conv_general_dilated`` pair with ``feature_group_count=C`` (channels
expanded into the filter count), and the slot accumulation / channel mixing
collapses to a single einsum that XLA fuses -- no Python loop over
directions, no [B, C, R, H, W] materialization.

GatedResidualConv2D is the retained predecessor
(/root/reference/frl/models/spatial.py:15-162): per-pixel learned gate
blending a smoothing conv with the identity.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _direction_bank() -> np.ndarray:
    """[4, 3, 3] fixed orientation templates (3-tap means)."""
    t = np.zeros((4, 3, 3), np.float32)
    t[0, 1, :] = 1 / 3          # horizontal
    t[1, :, 1] = 1 / 3          # vertical
    t[2, [0, 1, 2], [0, 1, 2]] = 1 / 3   # main diagonal
    t[3, [0, 1, 2], [2, 1, 0]] = 1 / 3   # anti-diagonal
    return t


def _sobel() -> Tuple[np.ndarray, np.ndarray]:
    sx = np.array([[-1., 0., 1.], [-2., 0., 2.], [-1., 0., 1.]],
                  np.float32) / 4.0
    sy = np.array([[-1., -2., -1.], [0., 0., 0.], [1., 2., 1.]],
                  np.float32) / 4.0
    return sx, sy


def depthwise_bank_conv(x: Array, bank: Array, dilation: int = 1) -> Array:
    """Apply F fixed [3,3] filters depthwise to every channel.

    x: [B, H, W, C]; bank: [F, 3, 3] -> returns [B, H, W, C, F].
    Implemented as one grouped conv with C*F output features (a shift-add
    formulation was tried and measured no faster while compiling ~50x
    slower -- the op is HBM-bound either way).
    """
    b, h, w, c = x.shape
    bank = jnp.asarray(bank)
    f = bank.shape[0]
    # HWIO kernel for feature_group_count=C: [3, 3, 1, C*F]; output feature
    # j = ci * F + fi must convolve input channel ci with filter fi.
    k = jnp.transpose(bank, (1, 2, 0))  # [3, 3, F]
    k = jnp.tile(k[:, :, None, :], (1, 1, 1, c)).reshape(3, 3, 1, c * f)
    out = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=(1, 1),
        padding=[(dilation, dilation)] * 2,
        rhs_dilation=(dilation, dilation),
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.reshape(b, h, w, c, f)


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
        bank = _direction_bank()[:nd]  # numpy: taps stay compile-time consts
        sx, sy = _sobel()

        # Per-channel Sobel gradients -> shared mixing backbone.
        grads = depthwise_bank_conv(x, np.stack([sx, sy]))  # [B,H,W,C,2]
        feat = grads.reshape(b, h, w, 2 * c)
        feat = nn.relu(nn.Conv(self.gate_hidden, (3, 3), padding="SAME",
                               dtype=cdt, name="mix_backbone")(feat))

        a_logits = nn.Conv(k * r, (1, 1), dtype=cdt,
                           name="mix_head_A")(feat)
        a_w = jax.nn.softmax(a_logits.reshape(b, h, w, k, r), axis=3)
        b_logits = nn.Conv(c * r, (1, 1), dtype=cdt,
                           name="mix_head_B")(feat)
        b_w = jax.nn.softmax(b_logits.reshape(b, h, w, c, r), axis=4)

        # Filter bank at both scales: [B,H,W,C,K] with filters interleaved
        # (2i = fine, 2i+1 = coarse) to match the reference's A indexing.
        fine = depthwise_bank_conv(x, bank, dilation=1)        # [B,H,W,C,nd]
        coarse = depthwise_bank_conv(x, bank,
                                     dilation=self.coarse_dilation)
        filtered = jnp.stack([fine, coarse], axis=-1)  # [B,H,W,C,nd,2]
        filtered = filtered.reshape(b, h, w, c, k)

        # smoothed[c] = sum_r B[c,r] * sum_k A[k,r] * filtered[c,k]
        smoothed = jnp.einsum("bhwck,bhwkr,bhwcr->bhwc", filtered, a_w, b_w)

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
