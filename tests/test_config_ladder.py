"""BASELINE.json config ladder: EVT-only, static-only, and full
multi-source cubes each train end-to-end through train_vqvae
(SURVEY.md §7 rebuild targets)."""
import numpy as np
import pytest

from forest_tpu.data.cube import build_synthetic_cube
from forest_tpu.training import train_vqvae


from pathlib import Path

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"


def _run(tmp_path, cube_kwargs, cfg_overrides, config_name=None):
    build_synthetic_cube(tmp_path / "cube.zarr", height=64, width=64,
                         chunk_yx=32, patch_size=32, seed=0, **cube_kwargs)
    cfg = train_vqvae.load_config(
        str(CONFIG_DIR / config_name) if config_name else None, {})
    cfg.update(zarr=str(tmp_path / "cube.zarr"),
               run_dir=str(tmp_path / "run"), epochs=1, steps_per_epoch=4,
               batch_size=32, num_workers=2, block_size=(1, 1),
               min_hits_per_epoch=1, val_steps=1, emb_dim=16, hidden=16,
               codebook_size=8, eager=True, **cfg_overrides)
    result = train_vqvae.train(cfg)
    h = result["history"][-1]
    assert np.isfinite(h["train/loss_total"]), h
    return result


class TestConfigLadder:
    def test_evt_only(self, tmp_path):
        """Categorical-only cube: no continuous channels, no NAIP bands."""
        r = _run(tmp_path, dict(n_cont=0, n_cat=2, n_naip=0),
                 dict(lambda_cont=0.0, lambda_canopy=0.0),
                 "vae_evt_only.yaml")
        h = r["history"][-1]
        assert h["train/loss_cat"] > 0

    def test_static_only(self, tmp_path):
        """T=1 cube: atemporal features + NAIP branch."""
        r = _run(tmp_path, dict(years=(2021,), n_cont=6, n_cat=0, n_naip=3),
                 dict(lambda_cat=0.0), "vae_static_only.yaml")
        h = r["history"][-1]
        assert h["train/loss_cont"] > 0
        assert np.isfinite(h["train/loss_canopy"])

    def test_full_multisource(self, tmp_path):
        """64-feature cube: many continuous + several categorical stacks."""
        r = _run(tmp_path, dict(n_cont=56, n_cat=4, n_naip=4), {},
                 "vae_full.yaml")
        ds = r["dataset"]
        assert len(ds.cont_names) == 56
        assert len(ds.cat_names) == 4


def test_diagnostics_flag_parses():
    from forest_tpu.training.representation.training_config import (
        parse_training_config)
    assert parse_training_config({}).diagnostics is True
    assert parse_training_config(
        {"training": {"diagnostics": False}}).diagnostics is False
