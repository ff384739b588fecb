"""RepresentationModel: dual-pathway contrastive encoder (z_type / z_phase).

Behavioral contract from /root/reference/frl/models/representation.py
(SURVEY.md §2.4), checkpoint schema VERSION "4":

- type pathway: Conv2DEncoder (1x1 convs) -> EdgeAwareSmoothingConv2D;
  ``forward`` maps [B, H, W, C_type] -> z_type [B, H, W, z_type_dim]
  (channel-last; the reference's [B, C, H, W] maps by transpose);
- phase pathway: TCNEncoder (pooling='none') -> 1x1 bottleneck ->
  FiLM(gamma, beta from z_type); ``forward_phase_at_locations`` runs the
  pipeline on sampled pixel time-series only ([N, T, C_phase] + stop-graded
  z_type [N, z_type_dim] -> z_phase [N, T, z_phase_dim]) and is
  pointwise-identical to the dense ``forward_phase``
  (representation.py:376-436 contract);
- optional SimCLR projection head on z_type (identity when disabled);
- curriculum scalars (input dropout rate, smoothing min_gate) are call
  arguments, not mutable state (jit-pure; SURVEY.md §8.3).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from forest_tpu.models.conditioning import FiLMLayer
from forest_tpu.models.conv2d_encoder import Conv2DEncoder
from forest_tpu.models.heads import MLPProjectionHead
from forest_tpu.models.spatial import EdgeAwareSmoothingConv2D
from forest_tpu.models.tcn import TCNEncoder

Array = jax.Array

VERSION = "4"


class RepresentationModel(nn.Module):
    type_in_channels: int
    phase_in_channels: int
    z_type_dim: int = 48
    z_phase_dim: int = 8
    type_encoder_channels: Sequence[int] = (128, 48)
    type_encoder_kernel_size: int = 1
    type_encoder_dropout: float = 0.0
    type_encoder_num_groups: int = 8
    spatial_conv_gate_hidden: int = 64
    spatial_conv_gate_kernel_size: int = 3
    spatial_conv_num_directions: int = 4
    spatial_conv_coarse_dilation: int = 3
    spatial_conv_rank: int = 4
    spatial_conv_compute_dtype: Optional[str] = None
    # None = fused Pallas bank+mixing kernel on TPU (escape hatch: False).
    spatial_conv_use_pallas: Optional[bool] = None
    phase_tcn_channels: Sequence[int] = (64, 64, 64)
    phase_tcn_kernel_size: int = 3
    phase_tcn_dilations: Sequence[int] = (1, 2, 4)
    phase_tcn_dropout: float = 0.0
    phase_tcn_num_groups: int = 8
    type_proj_hidden_dim: Optional[int] = None
    type_proj_output_dim: Optional[int] = None
    type_proj_l2_normalize: bool = True

    def setup(self):
        assert self.type_encoder_channels[-1] == self.z_type_dim, (
            "last type-encoder channel must equal z_type_dim")
        self.encoder = Conv2DEncoder(
            channels=tuple(self.type_encoder_channels),
            kernel_size=self.type_encoder_kernel_size,
            dropout_rate=self.type_encoder_dropout,
            num_groups=self.type_encoder_num_groups)
        self.spatial_conv = EdgeAwareSmoothingConv2D(
            channels=self.z_type_dim,
            gate_hidden=self.spatial_conv_gate_hidden,
            gate_kernel_size=self.spatial_conv_gate_kernel_size,
            num_directions=self.spatial_conv_num_directions,
            coarse_dilation=self.spatial_conv_coarse_dilation,
            rank=self.spatial_conv_rank,
            compute_dtype=self.spatial_conv_compute_dtype,
            use_pallas=self.spatial_conv_use_pallas)
        self.phase_tcn = TCNEncoder(
            channels=tuple(self.phase_tcn_channels),
            kernel_size=self.phase_tcn_kernel_size,
            dilations=tuple(self.phase_tcn_dilations),
            dropout_rate=self.phase_tcn_dropout,
            num_groups=self.phase_tcn_num_groups,
            pooling="none")
        self.phase_head = nn.Dense(self.z_phase_dim, name="phase_head")
        self.phase_film = FiLMLayer(target_dim=self.z_phase_dim,
                                    name="phase_film")
        if (self.type_proj_hidden_dim is not None
                and self.type_proj_output_dim is not None):
            self.type_projection = MLPProjectionHead(
                hidden_dim=self.type_proj_hidden_dim,
                output_dim=self.type_proj_output_dim,
                l2_normalize=self.type_proj_l2_normalize)
        else:
            self.type_projection = None

    # --- type pathway ------------------------------------------------------

    def __call__(self, x: Array, *, return_gate: bool = False,
                 input_dropout_rate: float = 0.0,
                 min_gate: float = 0.0, deterministic: bool = True):
        """[B, H, W, C_type] -> z_type [B, H, W, z_type_dim] (+ gate)."""
        h = self.encoder(x, input_dropout_rate=input_dropout_rate,
                         deterministic=deterministic)
        return self.spatial_conv(h, min_gate=min_gate,
                                 return_gate=return_gate)

    forward = __call__

    def project_type(self, z_type: Array) -> Array:
        """SimCLR projection for InfoNCE; identity when disabled."""
        if self.type_projection is None:
            return z_type
        return self.type_projection(z_type)

    # --- phase pathway -----------------------------------------------------

    def _phase_core(self, x_phase: Array, deterministic: bool) -> Array:
        """[N, T, C] -> pre-FiLM bottleneck h [N, T, z_phase_dim]."""
        h = self.phase_tcn(x_phase, deterministic=deterministic)
        return self.phase_head(h)

    def forward_phase_at_locations(self, x_phase_pixels: Array,
                                   z_type_pixels: Array, *,
                                   return_film: bool = False,
                                   return_pre_film: bool = False,
                                   deterministic: bool = True):
        """[N, T, C_phase] + [N, z_type_dim] -> z_phase [N, T, z_phase_dim].

        Caller must stop-gradient z_type_pixels (the reference contract:
        phase losses must not sculpt the type embedding through FiLM).
        """
        h = self._phase_core(x_phase_pixels, deterministic)  # [N, T, zp]
        gamma, beta = self.phase_film(z_type_pixels)          # [N, zp]
        z = gamma[:, None, :] * h + beta[:, None, :]
        out = (z,)
        if return_film:
            out = out + (gamma, beta)
        if return_pre_film:
            out = out + (h,)
        return out if len(out) > 1 else z

    def forward_phase(self, x_phase: Array, z_type: Array, *,
                      deterministic: bool = True) -> Array:
        """Dense phase forward: [B, T, H, W, C] + [B, H, W, zt] ->
        [B, T, H, W, zp] (deprecated in training; kept for inference)."""
        b, t, h, w, c = x_phase.shape
        flat = jnp.transpose(x_phase, (0, 2, 3, 1, 4)).reshape(
            b * h * w, t, c)
        zt = z_type.reshape(b * h * w, -1)
        z = self.forward_phase_at_locations(flat, zt,
                                            deterministic=deterministic)
        return jnp.transpose(z.reshape(b, h, w, t, -1), (0, 3, 1, 2, 4))


def init_variables(model: RepresentationModel, rng: Array,
                   spatial_hw: Tuple[int, int] = (8, 8),
                   num_timesteps: int = 5):
    """Initialize ALL parameter subtrees (type + phase + projection) in one
    pass -- flax only creates params for traced paths."""
    h, w = spatial_hw

    def init_fn(m):
        z = m(jnp.zeros((1, h, w, m.type_in_channels)))
        zp = m.forward_phase_at_locations(
            jnp.zeros((2, num_timesteps, m.phase_in_channels)),
            jnp.zeros((2, m.z_type_dim)))
        g = m.project_type(jnp.zeros((2, m.z_type_dim)))
        return z, zp, g

    return model.init(rng, method=init_fn)


# ---------------------------------------------------------------------------
# Config / checkpoint helpers (version-checked schema, SURVEY.md §6.4)
# ---------------------------------------------------------------------------


def from_config(cfg: Dict[str, Any], type_in_channels: int,
                phase_in_channels: int) -> RepresentationModel:
    version = str(cfg.get("version", VERSION))
    if version != VERSION:
        raise ValueError(
            f"model config version {version!r} != supported {VERSION!r}")
    m = cfg.get("model", cfg)
    t = m.get("type_encoder", {})
    s = m.get("spatial_conv", {})
    p = m.get("phase_tcn", {})
    proj = m.get("type_projection", {}) or {}
    return RepresentationModel(
        type_in_channels=type_in_channels,
        phase_in_channels=phase_in_channels,
        z_type_dim=m.get("z_type_dim", 48),
        z_phase_dim=m.get("z_phase_dim", 8),
        type_encoder_channels=tuple(t.get("channels", (128, 48))),
        type_encoder_kernel_size=t.get("kernel_size", 1),
        type_encoder_dropout=t.get("dropout_rate", 0.0),
        type_encoder_num_groups=t.get("num_groups", 8),
        spatial_conv_gate_hidden=s.get("gate_hidden", 64),
        spatial_conv_gate_kernel_size=s.get("gate_kernel_size", 3),
        spatial_conv_num_directions=s.get("num_directions", 4),
        spatial_conv_coarse_dilation=s.get("coarse_dilation", 3),
        spatial_conv_rank=s.get("rank", 4),
        spatial_conv_compute_dtype=s.get("compute_dtype"),
        # Execution detail, not architecture: settable from configs as an
        # escape hatch but never serialized into checkpoints.
        spatial_conv_use_pallas=s.get("use_pallas"),
        phase_tcn_channels=tuple(p.get("channels", (64, 64, 64))),
        phase_tcn_kernel_size=p.get("kernel_size", 3),
        phase_tcn_dilations=tuple(p.get("dilations", (1, 2, 4))),
        phase_tcn_dropout=p.get("dropout_rate", 0.0),
        phase_tcn_num_groups=p.get("num_groups", 8),
        type_proj_hidden_dim=proj.get("hidden_dim")
        if proj.get("enabled", False) else None,
        type_proj_output_dim=proj.get("output_dim")
        if proj.get("enabled", False) else None,
        type_proj_l2_normalize=proj.get("l2_normalize", True),
    )


def model_config_dict(model: RepresentationModel) -> Dict[str, Any]:
    return {
        "version": VERSION,
        "model": {
            "z_type_dim": model.z_type_dim,
            "z_phase_dim": model.z_phase_dim,
            "type_encoder": {
                "channels": list(model.type_encoder_channels),
                "kernel_size": model.type_encoder_kernel_size,
                "dropout_rate": model.type_encoder_dropout,
                "num_groups": model.type_encoder_num_groups,
            },
            "spatial_conv": {
                "gate_hidden": model.spatial_conv_gate_hidden,
                "gate_kernel_size": model.spatial_conv_gate_kernel_size,
                "num_directions": model.spatial_conv_num_directions,
                "coarse_dilation": model.spatial_conv_coarse_dilation,
                "rank": model.spatial_conv_rank,
                "compute_dtype": model.spatial_conv_compute_dtype,
            },
            "phase_tcn": {
                "channels": list(model.phase_tcn_channels),
                "kernel_size": model.phase_tcn_kernel_size,
                "dilations": list(model.phase_tcn_dilations),
                "dropout_rate": model.phase_tcn_dropout,
                "num_groups": model.phase_tcn_num_groups,
            },
            "type_projection": {
                "enabled": model.type_proj_hidden_dim is not None,
                "hidden_dim": model.type_proj_hidden_dim,
                "output_dim": model.type_proj_output_dim,
                "l2_normalize": model.type_proj_l2_normalize,
            },
        },
    }


__all__ = ["RepresentationModel", "from_config", "model_config_dict",
           "init_variables", "VERSION"]
