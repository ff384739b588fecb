"""EVT soft-neighborhood loss wired through the full training CLI:
confusion CSV + categorical stats counts -> diffusion metric -> in-graph
LUT loss (SURVEY.md §4.1 step.py:529-547 path)."""
import numpy as np
import pytest
import yaml

from forest_tpu.data.cube_v2 import build_synthetic_v2_cube, synthetic_bindings
from forest_tpu.training import train_representation as tr
from forest_tpu.training.representation.training_config import (
    parse_training_config)


@pytest.fixture(scope="module")
def evt_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("evt_e2e")
    cube = build_synthetic_v2_cube(root / "cube.zarr", height=96, width=96,
                                   chunk_yx=32, n_types=4, seed=3)
    b = synthetic_bindings(root / "cube.zarr", root / "stats.json")

    # evt_class feature so StatsCalculator records per-code counts.
    b["features"]["evt_class"] = {
        "dim": ["C", "H", "W"],
        "channels": {"static_categorical.evt": {"norm": "identity"}},
    }
    # Confusion CSV over the cube's actual EVT codes.
    from forest_tpu.data import zarrlite as zl
    evt = np.asarray(zl.open_zarr(root / "cube.zarr")
                     ["static/evt/data/evt"][:])
    codes = sorted(int(c) for c in np.unique(evt) if c >= 0)
    k = len(codes)
    rng = np.random.default_rng(0)
    conf = rng.integers(5, 40, size=(k, k)).astype(float)
    conf += np.diag(rng.integers(100, 200, size=k).astype(float))
    lines = ["," + ",".join(map(str, codes))]
    for c, row in zip(codes, conf):
        lines.append(f"{c}," + ",".join(map(str, row)))
    csv_path = root / "evt_confusion.csv"
    csv_path.write_text("\n".join(lines))

    b["losses"]["evt_soft_neighborhood"] = {
        "type": "evt_soft_neighborhood",
        "feature": "static_categorical.evt",
        "counts_feature": "evt_class",
        "confusion_csv": str(csv_path),
        "min_count": 10,
        "diffusion_steps": 2,
        "tau_ref": 0.5, "tau_learned": 0.5,
    }
    bpath = root / "bindings.yaml"
    bpath.write_text(yaml.safe_dump(b))

    cfg = parse_training_config({
        "run": {"experiment_name": "evt", "run_root": str(root / "runs")},
        "training": {"epoch": {"num_epochs": 1, "mode": "full",
                               "batch_size": 4}},
        "optimizer": {"lr": 1e-3},
        "scheduler": {"warmup_epochs": 0, "phase_rewarmup": False},
        "spatial_domain": {"patch_size": 32, "split_block_size": [1, 1]},
        "hardware": {"num_workers": 2},
        "loss_weights": {"evt": 0.5},
    })
    model_cfg = {"version": "4", "model": {
        "z_type_dim": 8, "z_phase_dim": 3,
        "type_encoder": {"channels": [16, 8]},
        "phase_tcn": {"channels": [12, 12], "dilations": [1, 2]}}}
    result = tr.train(cfg, str(bpath), model_cfg, max_batches=2)
    return root, result


class TestEvtTraining:
    def test_evt_loss_active(self, evt_run):
        _, result = evt_run
        h = result["history"][-1]
        assert result["step_cfg"].evt_enabled
        assert np.isfinite(h["train/loss_evt"])
        assert h["train/loss_evt"] > 0
        assert h["train/evt_anchors_valid"] > 0

    def test_counts_in_stats(self, evt_run):
        import json
        root, result = evt_run
        stats = json.loads((root / "stats.json").read_text())
        counts = stats["evt_class"]["static_categorical.evt"]["counts"]
        assert len(counts) >= 2
        assert all(int(k) >= 7000 for k in counts)
