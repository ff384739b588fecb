"""VQ-VAE model + train step tests: shapes, loss contract, EMA training,
data-parallel equivalence over the virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from forest_tpu.models.vqvae import VQVAE
from forest_tpu.training import vqvae_step
from forest_tpu.training.annealers import load_scheduler

B, T, C_CONT, KR, KC, NB = 16, 5, 6, 3, 3, 4
CAT_SIZES = {"evt": 12, "lcms": 7}


def make_batch(rng, b=B):
    cont = rng.normal(size=(b, T, C_CONT)).astype(np.float32)
    cont[0, 0, 0] = np.nan  # nan-safety path
    batch = {
        "cont": jnp.asarray(cont),
        "cat": jnp.asarray(rng.integers(0, 7, size=(b, T, 2)), jnp.int32),
        "cat_target": {
            "evt": jnp.asarray(rng.integers(-1, 12, size=(b, T)), jnp.int32),
            "lcms": jnp.asarray(rng.integers(0, 7, size=(b, T)), jnp.int32),
        },
        "naip": jnp.asarray(rng.normal(size=(b, KR, KC, NB)), jnp.float32),
        "canopy": jnp.asarray(rng.normal(size=(b,)), jnp.float32),
    }
    # sprinkle ignore_index
    tgt = np.asarray(batch["cat_target"]["evt"]).copy()
    tgt[tgt < 0] = -100
    batch["cat_target"]["evt"] = jnp.asarray(tgt)
    return batch


def make_model(quantizer="ema", k=32):
    return VQVAE(cont_dim=C_CONT, cat_vocab_sizes=CAT_SIZES, naip_bands=NB,
                 num_timesteps=T, emb_dim=16, codebook_size=k, hidden=32,
                 quantizer=quantizer)


WEIGHTS = {k: jnp.float32(v) for k, v in
           dict(cont=1.0, cat=1.0, canopy=1.0, vq=1.0).items()}


class TestForward:
    def test_shapes(self, rng):
        model = make_model()
        batch = make_batch(rng)
        params = model.init(jax.random.key(0), batch, use_pallas=False)["params"]
        out = model.apply({"params": params}, batch, use_pallas=False)
        assert out.cont_pred.shape == (B, T, C_CONT)
        assert out.cat_logits["evt"].shape == (B, T, 12)
        assert out.cat_logits["lcms"].shape == (B, T, 7)
        assert out.canopy_pred.shape == (B,)
        assert out.indices.shape == (B,)
        assert out.counts.shape == (32,)
        assert out.sums.shape == (32, 16)
        assert np.isfinite(float(out.vq_loss))

    def test_decode_codebook(self, rng):
        model = make_model(k=8)
        batch = make_batch(rng)
        params = model.init(jax.random.key(0), batch, use_pallas=False)["params"]
        cont, cats, canopy = model.apply({"params": params},
                                         method=model.decode_codebook)
        assert cont.shape == (8, T, C_CONT)
        assert canopy.shape == (8,)


class TestTrainStep:
    def _setup(self, rng, quantizer="ema"):
        model = make_model(quantizer)
        batch = make_batch(rng)
        opt = vqvae_step.make_optimizer(1e-3)
        state = vqvae_step.init_train_state(model, opt, batch,
                                            jax.random.key(0))
        step = jax.jit(vqvae_step.make_train_step(model, opt,
                                                  use_pallas=False))
        return model, batch, opt, state, step

    def test_loss_decreases_ema(self, rng):
        model, batch, opt, state, step = self._setup(rng, "ema")
        first = None
        for i in range(30):
            state, m = step(state, batch, WEIGHTS, jax.random.key(i))
            if first is None:
                first = float(m["loss/total"])
        assert float(m["loss/total"]) < first
        assert float(state.vq_stats.code_usage.sum()) == 30 * B

    def test_loss_decreases_st(self, rng):
        model, batch, opt, state, step = self._setup(rng, "st")
        first = None
        for i in range(30):
            state, m = step(state, batch, WEIGHTS, jax.random.key(i))
            if first is None:
                first = float(m["loss/total"])
        assert float(m["loss/total"]) < first

    def test_ema_moves_codebook_without_grad(self, rng):
        model, batch, opt, state, step = self._setup(rng, "ema")
        cb0 = np.asarray(state.params["codebook"])
        state, _ = step(state, batch, WEIGHTS, jax.random.key(0))
        cb1 = np.asarray(state.params["codebook"])
        assert np.abs(cb1 - cb0).max() > 0

    def test_metrics_keys(self, rng):
        _, batch, _, state, step = self._setup(rng)
        _, m = step(state, batch, WEIGHTS, jax.random.key(0))
        for k in ["loss/total", "loss/cont", "loss/cat", "loss/canopy",
                  "loss/vq", "perplexity", "grad_norm", "cat/evt"]:
            assert k in m, k
            assert np.isfinite(float(m[k])), k


class TestDataParallel:
    def test_dp_matches_single_device(self, rng):
        """Sharding the batch across the 8-device CPU mesh must produce the
        same update as single-device (global batch semantics: gradient
        all-reduce + codebook EMA stats psum fall out of jit sharding)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        model = make_model("ema")
        batch = make_batch(rng, b=32)
        opt = vqvae_step.make_optimizer(1e-3)
        state = vqvae_step.init_train_state(model, opt, batch,
                                            jax.random.key(0))
        raw_step = vqvae_step.make_train_step(model, opt, use_pallas=False)

        single = jax.jit(raw_step)
        s1, m1 = single(state, batch, WEIGHTS, jax.random.key(0))

        mesh = Mesh(np.array(jax.devices()), ("data",))
        shard = NamedSharding(mesh, P("data"))
        batch_sharded = jax.tree.map(
            lambda x: jax.device_put(x, shard) if hasattr(x, "ndim") and x.ndim
            else x, batch)
        s2, m2 = jax.jit(raw_step)(state, batch_sharded, WEIGHTS,
                                   jax.random.key(0))
        np.testing.assert_allclose(float(m1["loss/total"]),
                                   float(m2["loss/total"]), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s1.params["codebook"]),
                                   np.asarray(s2.params["codebook"]),
                                   rtol=1e-4, atol=1e-5)

    def test_dp_eval_matches_single_device(self, rng):
        """make_dp_eval_step (shard_map, Manual axes -- the Pallas-safe
        eval path train_vqvae uses for DP validation) must reproduce the
        single-device eval metrics on the same batch."""
        from forest_tpu.parallel import make_mesh
        from forest_tpu.parallel.dp import make_dp_eval_step
        from forest_tpu.parallel.mesh import shard_batch_pytree

        model = make_model("ema")
        batch = make_batch(rng, b=32)
        opt = vqvae_step.make_optimizer(1e-3)
        state = vqvae_step.init_train_state(model, opt, batch,
                                            jax.random.key(0))
        single = jax.jit(vqvae_step.make_eval_step(model, use_pallas=False))
        m1 = single(state.params, batch, WEIGHTS)

        mesh = make_mesh(8)
        dp_eval = make_dp_eval_step(model, mesh, use_pallas=False)
        m2 = dp_eval(state.params, shard_batch_pytree(batch, mesh), WEIGHTS)
        # per-sample-mean metrics are exactly pmean-able; nonlinear global
        # diagnostics (perplexity = exp of the code-usage entropy) are
        # replica-mean approximations under DP (same convention as the DP
        # train step's metric pmean) -- compare those loosely.
        for k in m1:
            tight = k.startswith("loss/") or k.startswith("acc")
            # tight metrics: f32 mean over a different partition order
            # (replica-local means then pmean) -- reduction-order noise
            # only
            np.testing.assert_allclose(
                float(m1[k]), float(m2[k]),
                rtol=5e-4 if tight else 0.5, err_msg=k)


class TestAnnealers:
    def test_constant_and_linear(self):
        sched = load_scheduler({"vq": 2.0, "cont": 1.0},
                               {"vq": {"kind": "linear", "start_value": 0.0,
                                       "end_value": 1.0, "start_step": 10,
                                       "end_step": 20}})
        assert sched(0)["vq"] == 0.0
        assert sched(15)["vq"] == pytest.approx(1.0)  # 2.0 * 0.5
        assert sched(100)["vq"] == pytest.approx(2.0)
        assert sched(0)["cont"] == 1.0

    def test_warmup_hold_decay(self):
        sched = load_scheduler({"vq": 1.0}, {"vq": {
            "kind": "warmup_hold_decay", "start_step": 0, "warmup": 10,
            "hold": 10, "decay": 10, "floor": 0.0, "ceil": 1.0,
            "final": 0.5}})
        assert sched(0)["vq"] == 0.0
        assert sched(10)["vq"] == 1.0
        assert sched(15)["vq"] == 1.0
        assert sched(25)["vq"] == pytest.approx(0.75, abs=1e-6)
        assert sched(100)["vq"] == 0.5

    def test_stepwise_string_milestones(self):
        sched = load_scheduler({"vq": 1.0}, {"vq": {
            "kind": "stepwise", "start_value": 0.1,
            "milestones": ["100:0.5", "200:1.0"]}})
        assert sched(50)["vq"] == pytest.approx(0.1)
        assert sched(150)["vq"] == pytest.approx(0.5)
        assert sched(250)["vq"] == pytest.approx(1.0)


class TestShardMapDP:
    """shard_map DP (Manual mesh axes -- the Pallas-compatible path) must
    match both the single-device step and the GSPMD implementation. Balanced
    batch (no NaNs / ignore_index): per-shard loss means then equal the
    global mean, so the comparison is exact up to float reassociation."""

    def _balanced_batch(self, rng, b=32):
        batch = make_batch(rng, b=b)
        batch["cont"] = jnp.asarray(
            rng.normal(size=(b, T, C_CONT)).astype(np.float32))
        batch["cat_target"] = {
            "evt": jnp.asarray(rng.integers(0, 12, size=(b, T)), jnp.int32),
            "lcms": jnp.asarray(rng.integers(0, 7, size=(b, T)), jnp.int32),
        }
        return batch

    def test_shard_map_matches_single_and_gspmd(self, rng):
        from forest_tpu.parallel import make_dp_train_step
        from forest_tpu.parallel.mesh import make_mesh, shard_batch_pytree

        model = make_model("ema")
        batch = self._balanced_batch(rng)
        opt = vqvae_step.make_optimizer(1e-3)
        state = vqvae_step.init_train_state(model, opt, batch,
                                            jax.random.key(0))

        single = jax.jit(vqvae_step.make_train_step(model, opt,
                                                    use_pallas=False))
        s0, m0 = single(state, batch, WEIGHTS, jax.random.key(0))

        mesh = make_mesh(8)
        bs = shard_batch_pytree(batch, mesh)
        results = {}
        for impl in ("shard_map", "gspmd"):
            step = make_dp_train_step(model, opt, mesh, use_pallas=False,
                                      impl=impl, donate_state=False)
            s, m = step(state, bs, WEIGHTS, jax.random.key(0))
            results[impl] = (s, m)
            np.testing.assert_allclose(float(m["loss/total"]),
                                       float(m0["loss/total"]), rtol=2e-5)
            np.testing.assert_allclose(np.asarray(s.params["codebook"]),
                                       np.asarray(s0.params["codebook"]),
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(s.vq_stats.cluster_size),
                np.asarray(s0.vq_stats.cluster_size), rtol=1e-5, atol=1e-6)

    def test_frl_per_sample_nan_containment(self):
        """One NaN-poisoned sample must not kill the step: params still
        update, loss stays finite, samples_skipped==1, and the update
        equals the one from the clean-subset-only gradient semantics
        (reference step.py:661-678 per-sample skip)."""
        import jax.numpy as jnp
        from forest_tpu.data.bindings import parse_bindings
        from forest_tpu.data.cube_v2 import (synthetic_bindings,
                                             synthetic_feature_stats,
                                             synthetic_frl_batch)
        from forest_tpu.data.feature_builder import FeatureBuilder
        from forest_tpu.models import representation as rep
        from forest_tpu.training.representation import (
            config_builders as cb, step as step_mod, train_step as ts)

        bindings = parse_bindings(synthetic_bindings("/dev/null", "/dev/null"))
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
            cb.build_step_config(bindings, {}), hw)
        opt = ts.make_optimizer(1e-3)
        weights = {k: jnp.float32(v)
                   for k, v in step_mod.DEFAULT_WEIGHTS.items()}
        cur = {"input_dropout_rate": jnp.float32(0.0),
               "min_gate": jnp.float32(0.0)}
        nprng = np.random.default_rng(1)
        batch = {k: jnp.asarray(v)
                 for k, v in synthetic_frl_batch(nprng, 4, hw, t).items()}
        # FeatureBuilder sanitizes non-finite raw data to 0, so per-sample
        # non-finite features only arise from numerical escapes (degenerate
        # stats, overflow). Inject at that level: poison sample 2 of the
        # built type feature.
        orig_build = fb.build_feature

        def poisoned_build(name, b):
            x, msk = orig_build(name, b)
            if name == "type_encoder_input" and x.ndim == 4:
                # the batched top-level type build only
                x = x.at[2].set(jnp.inf)
            return x, msk

        fb.build_feature = poisoned_build
        try:
            process_poisoned = step_mod.make_process_batch(
                model, fb, cb.build_sampler(bindings, {}),
                cb.build_step_config(bindings, {}), hw)
            step_p = jax.jit(ts.make_train_step(process_poisoned, opt))
            state = ts.init_train_state(params, opt)
            new_state, m = step_p(state, batch, jax.random.key(5), weights,
                                  cur)
        finally:
            fb.build_feature = orig_build
        assert int(m["samples_skipped"]) == 1
        assert int(m["skipped"]) == 0, "batch-level skip must NOT fire"
        assert np.isfinite(float(m["loss_total"]))
        # params actually updated
        moved = jax.tree_util.tree_reduce(
            lambda acc, pq: acc + float(jnp.sum(jnp.abs(pq))), jax.tree.map(
                lambda a, b: a - b, new_state.params, state.params), 0.0)
        assert moved > 0.0

        # clean batch reports zero skips
        step = jax.jit(ts.make_train_step(process, opt))
        _, m_clean = step(ts.init_train_state(params, opt), batch,
                          jax.random.key(5), weights, cur)
        assert int(m_clean["samples_skipped"]) == 0

    def test_frl_per_sample_nan_containment_under_dp(self):
        """Poisoned samples under the 8-device mesh: the patched builder
        runs per REPLICA (shard_map traces it once per shard), so local
        sample 1 of every replica goes non-finite -- samples_skipped must
        psum to 8, the batch-level skip must stay quiet, and parameters
        must still update (the round-1 batch-global design would have
        discarded the whole multi-chip step)."""
        import jax.numpy as jnp
        from forest_tpu.data.bindings import parse_bindings
        from forest_tpu.data.cube_v2 import (synthetic_bindings,
                                             synthetic_feature_stats,
                                             synthetic_frl_batch)
        from forest_tpu.data.feature_builder import FeatureBuilder
        from forest_tpu.models import representation as rep
        from forest_tpu.parallel import make_dp_frl_step
        from forest_tpu.parallel.mesh import make_mesh, shard_batch_pytree
        from forest_tpu.training.representation import (
            config_builders as cb, step as step_mod, train_step as ts)

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
        orig_build = fb.build_feature

        def poisoned_build(name, b):
            x, msk = orig_build(name, b)
            if name == "type_encoder_input" and x.ndim == 4 \
                    and x.shape[0] == 2:  # one per-replica shard of 16/8
                x = x.at[1].set(jnp.inf)  # poisons sample 1 of EVERY shard
            return x, msk

        # NOTE: under shard_map each replica sees a [2, ...] shard, so the
        # poison hits one sample PER replica -> expect psum == 8.
        fb.build_feature = poisoned_build
        try:
            process = step_mod.make_process_batch(
                model, fb, cb.build_sampler(bindings, {}),
                cb.build_step_config(bindings, {}), hw)
            opt = ts.make_optimizer(1e-3)
            weights = {k: jnp.float32(v)
                       for k, v in step_mod.DEFAULT_WEIGHTS.items()}
            cur = {"input_dropout_rate": jnp.float32(0.0),
                   "min_gate": jnp.float32(0.0)}
            batch16 = {k: jnp.asarray(v) for k, v in synthetic_frl_batch(
                np.random.default_rng(7), 16, hw, t).items()}
            mesh8 = make_mesh(8)
            step8 = make_dp_frl_step(process, opt, mesh8,
                                     donate_state=False)
            state = ts.init_train_state(params, opt)
            new_state, m = step8(state, shard_batch_pytree(batch16, mesh8),
                                 jax.random.key(3), weights, cur)
        finally:
            fb.build_feature = orig_build
        assert int(m["samples_skipped"]) == 8  # one per replica, psum'd
        assert int(m["skipped"]) == 0
        assert np.isfinite(float(m["loss_total"]))
        moved = jax.tree_util.tree_reduce(
            lambda acc, pq: acc + float(jnp.sum(jnp.abs(pq))), jax.tree.map(
                lambda a, b: a - b, new_state.params, state.params), 0.0)
        assert moved > 0.0

    def test_frl_shard_map_dp_runs_and_matches_on_one_device(self):
        """On a 1-device mesh the shard_map FRL step must equal the plain
        jitted step bit-for-bit; on 8 devices it must stay finite."""
        import jax.numpy as jnp
        from forest_tpu.data.bindings import parse_bindings
        from forest_tpu.data.cube_v2 import (synthetic_bindings,
                                             synthetic_feature_stats,
                                             synthetic_frl_batch)
        from forest_tpu.data.feature_builder import FeatureBuilder
        from forest_tpu.models import representation as rep
        from forest_tpu.parallel import make_dp_frl_step
        from forest_tpu.parallel.mesh import make_mesh, shard_batch_pytree
        from forest_tpu.training.representation import (
            config_builders as cb, step as step_mod, train_step as ts)

        bindings = parse_bindings(synthetic_bindings("/dev/null", "/dev/null"))
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
            cb.build_step_config(bindings, {}), hw)
        opt = ts.make_optimizer(1e-3)
        weights = {k: jnp.float32(v)
                   for k, v in step_mod.DEFAULT_WEIGHTS.items()}
        cur = {"input_dropout_rate": jnp.float32(0.0),
               "min_gate": jnp.float32(0.0)}
        nprng = np.random.default_rng(0)
        batch16 = {k: jnp.asarray(v)
                   for k, v in synthetic_frl_batch(nprng, 16, hw, t).items()}

        # 1-device mesh == plain step
        state = ts.init_train_state(params, opt)
        plain = jax.jit(ts.make_train_step(process, opt))
        b2 = {k: v[:2] for k, v in batch16.items()}
        _, m_plain = plain(state, b2, jax.random.key(3), weights, cur)
        mesh1 = make_mesh(1)
        step1 = make_dp_frl_step(process, opt, mesh1, donate_state=False)
        state = ts.init_train_state(params, opt)
        _, m_1 = step1(state, shard_batch_pytree(b2, mesh1),
                       jax.random.key(3), weights, cur)
        np.testing.assert_allclose(float(m_1["loss_total"]),
                                   float(m_plain["loss_total"]), rtol=1e-6)

        # 8-device mesh: finite, no skip; COUNT metrics are global sums
        # (psum), matching single-device semantics on the same batch.
        mesh8 = make_mesh(8)
        step8 = make_dp_frl_step(process, opt, mesh8, donate_state=False)
        state = ts.init_train_state(params, opt)
        _, m_8 = step8(state, shard_batch_pytree(batch16, mesh8),
                       jax.random.key(3), weights, cur)
        assert np.isfinite(float(m_8["loss_total"]))
        assert int(m_8["skipped"]) == 0
        assert int(m_8["samples_skipped"]) == 0
        assert float(m_8["n_anchors_valid"]) == round(
            float(m_8["n_anchors_valid"]))  # integral after psum
