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
