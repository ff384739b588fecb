"""End-to-end FRL training: synthetic v2 cube -> stats -> 2 epochs -> resume.

The CPU debug-window full-stack smoke (SURVEY.md §5)."""
import json

import numpy as np
import pytest

from forest_tpu.data.cube_v2 import build_synthetic_v2_cube, synthetic_bindings
from forest_tpu.training import train_representation as tr
from forest_tpu.training.representation.training_config import (
    parse_training_config)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("frl_e2e")
    build_synthetic_v2_cube(root / "cube.zarr", height=96, width=96,
                            chunk_yx=32)
    import yaml
    bpath = root / "bindings.yaml"
    bpath.write_text(yaml.safe_dump(synthetic_bindings(
        root / "cube.zarr", root / "stats.json")))

    cfg = parse_training_config({
        "name": "synthetic_e2e",
        "run": {"experiment_name": "exp0", "run_root": str(root / "runs"),
                "checkpoint": {"save_top_k": 1, "save_every_n_epochs": 1}},
        "training": {"epoch": {"num_epochs": 2, "mode": "full",
                               "batch_size": 4}},
        "optimizer": {"lr": 1e-3},
        "scheduler": {"warmup_epochs": 0, "phase_rewarmup": False},
        "spatial_domain": {"patch_size": 32, "split_block_size": [1, 1]},
        "curriculum": {"input_dropout": 0.05, "smoothing_freeze_until": 1,
                       "smoothing_ramp_epochs": 1, "phase_start_epoch": 0,
                       "phase_ramp_epochs": 1},
        "hardware": {"num_workers": 2},
    })
    model_cfg = {
        "version": "4",
        "model": {
            "z_type_dim": 12, "z_phase_dim": 4,
            "type_encoder": {"channels": [24, 12]},
            "phase_tcn": {"channels": [16, 16], "dilations": [1, 2]},
        },
    }
    result = tr.train(cfg, str(bpath), model_cfg, max_batches=3)
    return root, cfg, str(bpath), model_cfg, result


class TestTrainRepresentation:
    def test_history_finite(self, trained):
        root, cfg, _, _, result = trained
        hist = result["history"]
        assert len(hist) == 2
        for h in hist:
            assert np.isfinite(h["train/loss_total"])
            assert np.isfinite(h["val/loss_total"])
            assert h["train/skipped"] == 0

    def test_all_loss_components_present(self, trained):
        _, _, _, _, result = trained
        h = result["history"][-1]
        for k in ["train/loss_spatial_infonce", "train/loss_spectral_infonce",
                  "train/loss_vicreg_type", "train/loss_phase_neighborhood",
                  "train/loss_phase_spread", "train/loss_recovery_disc",
                  "train/loss_type_leakage", "train/loss_vicreg_phase"]:
            assert k in h, k
            assert np.isfinite(h[k])

    def test_checkpoints_written(self, trained):
        root, cfg, *_ = trained
        ck = cfg.run.experiment_dir / cfg.run.ckpt_dir
        assert (ck / "encoder_last.msgpack").exists()
        meta = json.loads((ck / "encoder_last.msgpack.json").read_text())
        assert meta["model_version"] == "4"
        assert meta["model_config"]["model"]["z_type_dim"] == 12

    def test_auto_resume(self, trained):
        import copy
        root, cfg, bpath, model_cfg, _ = trained
        cfg = copy.deepcopy(cfg)  # never mutate the shared fixture config
        cfg.epoch.num_epochs = 3
        result = tr.train(cfg, bpath, model_cfg, max_batches=3)
        assert [h["epoch"] for h in result["history"]] == [2]

    def test_smoothing_curriculum_gate(self, trained):
        """Epoch 0 has min_gate=1.0 (smoothing frozen) -> gate_mean == 1."""
        _, _, _, _, result = trained
        h0 = result["history"][0]
        assert h0["train/gate_mean"] == pytest.approx(1.0, abs=1e-5)


class TestTrainRepresentationDataParallel:
    def test_dp_train_runs_and_is_finite(self, trained):
        """hardware.data_parallel=True drives the shard_map DP step over
        the 8-device CPU mesh through the full train() CLI path (loops
        shard batches; SURVEY §6.8)."""
        import copy
        root, cfg, bpath, model_cfg, _ = trained
        cfg = copy.deepcopy(cfg)
        cfg.run.experiment_name = "exp_dp"
        cfg.epoch.num_epochs = 1
        cfg.epoch.batch_size = 8  # divides the 8-device mesh
        cfg.hardware.data_parallel = True
        result = tr.train(cfg, bpath, model_cfg, max_batches=2)
        h = result["history"][0]
        assert np.isfinite(h["train/loss_total"])
        assert np.isfinite(h["val/loss_total"])
        assert h["train/skipped"] == 0

    def test_dp_batch_size_divisibility_guard(self, trained):
        import copy
        root, cfg, bpath, model_cfg, _ = trained
        cfg = copy.deepcopy(cfg)
        cfg.run.experiment_name = "exp_dp_bad"
        cfg.epoch.batch_size = 6  # 8 devices -> indivisible
        cfg.hardware.data_parallel = True
        with pytest.raises(ValueError, match="must divide"):
            tr.train(cfg, bpath, model_cfg, max_batches=1)
