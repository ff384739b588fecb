"""Frozen-encoder loading + closures for eval tools.

The RepresentationModel.from_checkpoint contract (SURVEY.md §2.4,
representation.py:442-490): restore a versioned checkpoint dict into a
frozen model and expose jitted encode closures used by probes /
embed_locations / diagnostics.
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, Optional, Tuple

import jax

from forest_tpu.data.feature_builder import FeatureBuilder
from forest_tpu.models import representation as rep
from forest_tpu.training.checkpointing import load_state_raw
from forest_tpu.utils import spatial as sp


def load_frozen_model(ckpt_path: str | Path
                      ) -> Tuple[rep.RepresentationModel, Dict]:
    raw, meta = load_state_raw(Path(ckpt_path))
    model = rep.from_config(meta["model_config"],
                            int(meta["type_in_channels"]),
                            int(meta["phase_in_channels"]))
    return model, raw["params"]


def make_encode_fns(model: rep.RepresentationModel, params, fb: FeatureBuilder,
                    type_feature: str = "type_encoder_input",
                    phase_feature: str = "phase_ccdc"):
    """Returns (encode_type, encode_phase, project) jitted closures.

    encode_type(batch) -> z_type [B, H, W, zt]
    encode_phase(batch, coords [A, 2]) -> z_phase [B, A, T, zp]
    project(z [N, zt]) -> g [N, gt]
    """
    variables = {"params": params}

    @jax.jit
    def encode_type(batch):
        x, _ = fb.build_feature(type_feature, batch)
        return model.apply(variables, x)

    @jax.jit
    def encode_phase(batch, coords):
        z_type = encode_type(batch)

        def one(groups, zt):
            px, _ = fb.build_feature_at_locations(phase_feature, groups,
                                                  coords)
            zt_a = sp.extract_at_locations(zt, coords)
            return model.apply(variables, px, zt_a,
                               method=model.forward_phase_at_locations)

        return jax.vmap(one, in_axes=({k: 0 for k in batch}, 0))(
            {k: v for k, v in batch.items()}, z_type)

    @jax.jit
    def project(z):
        return model.apply(variables, z, method=model.project_type)

    return encode_type, encode_phase, project


def make_encode_phase_film(model, params, fb: FeatureBuilder,
                           type_feature: str = "type_encoder_input",
                           phase_feature: str = "phase_ccdc"):
    """encode(batch, coords) -> (z_phase [B,A,T,zp], gamma [B,A,zp]) --
    the FiLM-diagnostics variant (phase_evt_diagnostics consumer)."""
    variables = {"params": params}

    @jax.jit
    def encode(batch, coords):
        x, _ = fb.build_feature(type_feature, batch)
        z_type = model.apply(variables, x)

        def one(groups, zt):
            px, _ = fb.build_feature_at_locations(phase_feature, groups,
                                                  coords)
            zt_a = sp.extract_at_locations(zt, coords)
            z, gamma, beta = model.apply(
                variables, px, zt_a, return_film=True,
                method=model.forward_phase_at_locations)
            return z, gamma

        return jax.vmap(one, in_axes=({k: 0 for k in batch}, 0))(
            {k: v for k, v in batch.items()}, z_type)

    return encode


def make_phase_target_fn(fb: FeatureBuilder, target_feature: str):
    """encode_phase companion: temporal targets at the same coords."""
    @jax.jit
    def targets(batch, coords):
        def one(groups):
            return fb.build_feature_at_locations(target_feature, groups,
                                                 coords)

        return jax.vmap(one, in_axes=({k: 0 for k in batch},))(
            {k: v for k, v in batch.items()})

    return targets


def require_patches(ds, split, patch_size, split_block_size):
    """Exit with a actionable message when a split enumerates zero patches.

    On small cubes a coarse checkerboard block size can place every block in
    one split (data/checkerboard.py), which otherwise surfaces as an opaque
    IndexError deep in the streaming loop.
    """
    if len(ds) == 0:
        raise SystemExit(
            f"no patches in split {split!r} (patch_size={patch_size}, "
            f"split_block_size={tuple(split_block_size)}): on small cubes "
            "every checkerboard block may land in one split -- try a smaller "
            "--split-block-size (e.g. 1 1) or --patch-size, or another split")


__all__ = ["load_frozen_model", "make_encode_fns", "make_phase_target_fn",
           "require_patches"]
