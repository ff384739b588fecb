"""Scheduler (two-phase cosine), curriculum, epoch logging, log shim,
device summary, and multi-device train_vqvae CLI."""
import numpy as np
import pytest

from forest_tpu.training.representation import curriculum as cur
from forest_tpu.training.representation import epoch_logging
from forest_tpu.training.scheduler import (cosine_lr, resume_cosine_lr,
                                           two_phase_cosine_lr)


class TestScheduler:
    def test_cosine_endpoints(self):
        s = cosine_lr(1e-3, 100, min_lr=1e-4)
        assert float(s(0)) == pytest.approx(1e-3)
        assert float(s(100)) == pytest.approx(1e-4, rel=1e-3)

    def test_warmup(self):
        s = cosine_lr(1e-3, 100, min_lr=0.0, warmup_steps=10)
        assert float(s(0)) == pytest.approx(0.0, abs=1e-9)
        assert float(s(10)) == pytest.approx(1e-3, rel=1e-3)

    def test_two_phase_drop_and_rewarm(self):
        """At the phase entry the LR drops to start_factor * cosine, then
        ramps to peak_factor (scheduler.py:78-141 contract)."""
        s = two_phase_cosine_lr(1e-3, 1000, phase_start_step=500,
                                rewarmup_steps=100, min_lr=0.0,
                                start_factor=0.1, peak_factor=1.0)
        base = cosine_lr(1e-3, 1000, 0.0)
        assert float(s(499)) == pytest.approx(float(base(499)), rel=1e-5)
        assert float(s(500)) == pytest.approx(0.1 * float(base(500)),
                                              rel=1e-4)
        assert float(s(550)) == pytest.approx(0.55 * float(base(550)),
                                              rel=1e-3)
        assert float(s(700)) == pytest.approx(float(base(700)), rel=1e-5)

    def test_resume_fresh_cosine(self):
        s = resume_cosine_lr(1e-3, 50, 1e-5)
        assert float(s(0)) == pytest.approx(1e-3)


class TestCurriculum:
    def test_input_dropout_schedules(self):
        assert cur.compute_input_dropout_rate(0.2, 5, 10) == 0.2
        lin = {"schedule": "linear", "start": 0.0, "end": 0.1,
               "epochs": 10}
        assert cur.compute_input_dropout_rate(lin, 5, 100) == \
            pytest.approx(0.05)
        cos = {"schedule": "cosine", "start": 0.0, "end": 0.1,
               "epochs": 10}
        assert cur.compute_input_dropout_rate(cos, 10, 100) == \
            pytest.approx(0.1)

    def test_ramp_zero_at_start_epoch(self):
        """Exactly 0.0 AT start_epoch (the scheduler re-warmup relies on
        this, curriculum.py:54-67 contract)."""
        assert cur.ramp_weight(9, 10, 5) == 0.0
        assert cur.ramp_weight(10, 10, 5) == 0.0
        assert cur.ramp_weight(12, 10, 5) == pytest.approx(0.4)
        assert cur.ramp_weight(15, 10, 5) == 1.0

    def test_min_gate_complement(self):
        assert cur.compute_smoothing_min_gate(0, 10, 5) == 1.0
        assert cur.compute_smoothing_min_gate(15, 10, 5) == 0.0


class TestEpochLogging:
    def test_format_and_checkpoint_keys(self):
        train = {"loss_total": 1.234, "gate_mean": 0.5, "n_steps": 3,
                 "custom_metric": 9.0}
        val = {"loss_total": 2.0}
        block = epoch_logging.format_epoch_block(7, train, val, lr=1e-4)
        assert "epoch 7" in block and "loss_total" in block
        assert "custom_metric" in block  # unknown keys surface in [other]
        m = epoch_logging.checkpoint_metrics(train, val)
        assert m["train/loss_total"] == 1.234
        assert m["val/loss_total"] == 2.0


class TestLogShim:
    def test_log_warn_ensure(self, capsys):
        from forest_tpu.utils import log as ulog
        ulog.log("hello")
        ulog.warn("careful")
        out = capsys.readouterr()
        assert "hello" in out.out and "WARNING" in out.err
        with pytest.raises(SystemExit):
            ulog.ensure(False, "boom")
        with ulog.timeit("t"):
            pass

    def test_device_summary(self, capsys):
        from forest_tpu.training.representation.profiling import (
            print_device_summary)
        s = print_device_summary()
        assert "devices: 8" in s


class TestDataParallelVQVAE:
    def test_cli_trains_over_mesh(self, tmp_path):
        """train_vqvae auto-shards over all 8 virtual devices."""
        from forest_tpu.data.cube import build_synthetic_cube
        from forest_tpu.training import train_vqvae

        build_synthetic_cube(tmp_path / "cube.zarr", height=64, width=64,
                             chunk_yx=32, patch_size=32, seed=0)
        cfg = train_vqvae.load_config(None, {})
        cfg.update(zarr=str(tmp_path / "cube.zarr"),
                   run_dir=str(tmp_path / "run"), epochs=1,
                   steps_per_epoch=3, batch_size=64, num_workers=2,
                   block_size=(1, 1), min_hits_per_epoch=1, val_steps=1,
                   emb_dim=16, hidden=16, codebook_size=8, eager=True)
        result = train_vqvae.train(cfg)
        h = result["history"][-1]
        assert np.isfinite(h["train/loss_total"])


class TestTauCalibration:
    def test_infonce_sweep_prefers_matched_tau(self, rng):
        from forest_tpu.eval import tau_calibration as tc
        pos = rng.normal(loc=-0.2, scale=0.05, size=200)
        neg = rng.normal(loc=-2.0, scale=0.3, size=2000)
        sweep = tc.infonce_tau_sweep(pos, neg)
        # with a clear gap, small tau separates -> lower loss than huge tau
        assert sweep[0.1] < sweep[2.0]
        assert all(np.isfinite(v) for v in sweep.values())

    def test_entropy_sweep_monotone(self, rng):
        from forest_tpu.eval import tau_calibration as tc
        d = np.abs(rng.normal(size=(50, 10)))
        sweep = tc.entropy_tau_sweep(d)
        assert sweep[0.05] < sweep[2.0]  # sharper at small tau

    def test_gap_report(self):
        from forest_tpu.eval import tau_calibration as tc
        r = tc.similarity_gap_report(np.asarray([-0.1]),
                                     np.asarray([-1.1]), 0.2)
        assert r["gap"] == pytest.approx(1.0)
        assert r["gap_over_T"] == pytest.approx(5.0)


class TestRunEpochRaggedTail:
    """loops.run_epoch must consume every dataset index exactly once per
    epoch (the ragged tail is repeat-filled + masked, never dropped)."""

    class _FakeDS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def on_epoch_start(self):
            pass

        def load_batch(self, idxs):
            return {"idx": np.asarray(idxs, np.int32)}

    @pytest.mark.parametrize("n,bs", [(10, 4), (3, 8), (8, 4)])
    def test_every_index_once(self, n, bs):
        import jax.numpy as jnp

        from forest_tpu.training.representation import loops

        seen = []

        def step_fn(state, db, rng, weights, curriculum):
            seen.append((np.asarray(db["idx"]),
                         np.asarray(db["__sample_valid__"])))
            return state, {"loss_total": jnp.float32(0.0)}

        _, m = loops.run_epoch(
            self._FakeDS(n), step_fn, None, batch_size=bs, weights={},
            curriculum={}, rng_seed=0, train=True, num_workers=1)
        assert all(i.shape == (bs,) for i, _ in seen)
        valid_idx = np.concatenate([i[v] for i, v in seen])
        assert sorted(valid_idx.tolist()) == list(range(n))
        assert m["n_steps"] == -(-n // bs)


class TestStepDiagnostics:
    def test_diag_metrics_present_and_finite(self):
        import jax
        import jax.numpy as jnp

        from forest_tpu.data.bindings import parse_bindings
        from forest_tpu.data.cube_v2 import (synthetic_bindings,
                                             synthetic_feature_stats,
                                             synthetic_frl_batch)
        from forest_tpu.data.feature_builder import FeatureBuilder
        from forest_tpu.models import representation as rep
        from forest_tpu.training.representation import (
            config_builders as cb, epoch_logging, step as step_mod)

        bindings = parse_bindings(synthetic_bindings("/dev/null",
                                                     "/dev/null"))
        fb = FeatureBuilder(bindings, synthetic_feature_stats(bindings))
        model = rep.RepresentationModel(
            type_in_channels=4, phase_in_channels=3, z_type_dim=8,
            type_encoder_channels=(16, 8), z_phase_dim=3,
            phase_tcn_channels=(12, 12), phase_tcn_dilations=(1, 2))
        t, hw = 15, 32
        params = rep.init_variables(model, jax.random.key(0),
                                    num_timesteps=t)["params"]
        process = step_mod.make_process_batch(
            model, fb, cb.build_sampler(bindings, {}),
            cb.build_step_config(bindings, {}), hw, diag=True)
        weights = {k: jnp.float32(v)
                   for k, v in step_mod.DEFAULT_WEIGHTS.items()}
        cur = {"input_dropout_rate": jnp.float32(0.0),
               "min_gate": jnp.float32(0.0)}
        batch = {k: jnp.asarray(v) for k, v in synthetic_frl_batch(
            np.random.default_rng(3), 3, hw, t).items()}
        _, m = jax.jit(lambda p, b, r: process(p, b, r, weights, cur, True)
                       )(params, batch, jax.random.key(1))
        m = {k: float(v) for k, v in m.items()}
        for p in ("diag_gate", "diag_pos_weight", "diag_neg_weight",
                  "diag_pos_sim", "diag_neg_sim"):
            for s in ("mean", "std", "p05", "p50", "p95"):
                assert np.isfinite(m[f"{p}_{s}"]), f"{p}_{s}"
            assert m[f"{p}_p05"] <= m[f"{p}_p50"] <= m[f"{p}_p95"]
        for s in ("mean", "q25", "q50"):
            assert np.isfinite(m[f"diag_tau_pos_0.5_{s}"])
            assert np.isfinite(m[f"diag_tau_spectral_neg_50_{s}"])
        assert -1.5 <= m["leak_r2_mean"] <= 1.0 + 1e-6
        assert np.isfinite(m["leak_cross_cov_frob"])
        # weights are clipped to [min_w, 1]
        assert 0.05 - 1e-6 <= m["diag_pos_weight_p05"] <= 1.0 + 1e-6

        block = epoch_logging.format_epoch_block(0, m)
        assert "[distributions]" in block
        assert "tau sweep" in block
        assert "[type leakage]" in block
        block1 = epoch_logging.format_epoch_block(1, m)
        assert "tau sweep" not in block1
