"""End-to-end: synthetic cube -> schema -> train CLI -> resume -> export.

The CPU debug-window equivalent of the reference's full-stack smoke
(SURVEY.md §5 fixtures)."""
import json

import numpy as np
import pytest

from forest_tpu.data.cube import build_synthetic_cube
from forest_tpu.eval import export_codebook
from forest_tpu.training import train_vqvae
from forest_tpu.training.checkpointing import CheckpointManager


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    build_synthetic_cube(root / "cube.zarr", height=96, width=96,
                         chunk_yx=32, patch_size=32, seed=0)
    cfg = train_vqvae.load_config(None, {})
    cfg.update(zarr=str(root / "cube.zarr"), run_dir=str(root / "run"),
               epochs=2, steps_per_epoch=8, batch_size=64, num_workers=2,
               block_size=(1, 1), min_hits_per_epoch=1, val_steps=2,
               emb_dim=16, hidden=32, codebook_size=16, eager=True)
    result = train_vqvae.train(cfg)
    return root, cfg, result


class TestTrainCLI:
    def test_history_and_checkpoints(self, trained_run):
        root, cfg, result = trained_run
        hist = json.loads((root / "run" / "history.json").read_text())
        assert len(hist) == 2
        assert np.isfinite(hist[-1]["train/loss_total"])
        assert np.isfinite(hist[-1]["val/loss_total"])
        assert (root / "run" / "ckpt" / "ckpt_last.msgpack").exists()
        assert (root / "run" / "ckpt" / "ckpt_best_0.msgpack").exists()

    def test_auto_resume_continues(self, trained_run, tmp_path):
        import shutil
        root, cfg, _ = trained_run
        # Resume in a COPY of the run dir so the module-scoped fixture's
        # artifacts stay untouched for other tests (order independence).
        run2 = tmp_path / "run_copy"
        shutil.copytree(root / "run", run2)
        cfg2 = dict(cfg, epochs=3, run_dir=str(run2))
        result = train_vqvae.train(cfg2)
        hist = json.loads((run2 / "history.json").read_text())
        # resumed run trains only epoch 2
        assert [h["epoch"] for h in hist] == [2]

    def test_export_codebook(self, trained_run):
        root, cfg, result = trained_run
        out = export_codebook.export(cfg["zarr"], cfg["run_dir"],
                                     write_csv=True)
        z = np.load(out, allow_pickle=False)
        K, T = 16, 5
        assert z["cont"].shape == (K * T, 8)
        assert z["cats"].shape == (K * T, 2)
        assert z["summary"].shape == (K, 3)
        assert z["usage"].sum() > 0
        # de-normalized continuous should be in raw data range, not z-scores
        assert np.abs(z["cont"]).max() > 3.0
        assert out.with_suffix(".csv").exists()


class TestCheckpointManagerPolicy:
    def test_topk_nan_safe_and_ranked(self, tmp_path):
        cm = CheckpointManager(tmp_path, prefix="m", top_k=2,
                               periodic_every=0, monitor="val/loss")
        state = {"w": np.zeros(3)}
        cm.save(0, state, {"val/loss": 5.0})
        cm.save(1, state, {"val/loss": float("nan")})  # must not enter
        cm.save(2, state, {"val/loss": 3.0})
        cm.save(3, state, {"val/loss": 4.0})
        assert [e for _, e in cm.best] == [2, 3]
        meta0 = json.loads((tmp_path / "m_best_0.msgpack.json").read_text())
        assert meta0["monitor_value"] == 3.0

    def test_restore_topk_from_disk(self, tmp_path):
        cm = CheckpointManager(tmp_path, prefix="m", top_k=2,
                               periodic_every=0, monitor="val/loss")
        state = {"w": np.zeros(3)}
        cm.save(0, state, {"val/loss": 5.0})
        cm.save(1, state, {"val/loss": 3.0})
        cm2 = CheckpointManager(tmp_path, prefix="m", top_k=2,
                                periodic_every=0, monitor="val/loss")
        assert cm2.best == cm.best

    def test_monitor_start_epoch(self, tmp_path):
        cm = CheckpointManager(tmp_path, prefix="m", top_k=1,
                               periodic_every=0, monitor="val/loss",
                               monitor_start_epoch=5)
        state = {"w": np.zeros(2)}
        cm.save(0, state, {"val/loss": 0.1})  # pre-curriculum: ignored
        assert not cm.best
        cm.save(5, state, {"val/loss": 9.0})
        assert [e for _, e in cm.best] == [5]
