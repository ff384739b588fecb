"""Orbax sharded checkpointing: sharding-aware save/restore on the
8-device CPU mesh, NaN-safe best-k, auto-resume (the scale-out complement
of the msgpack CheckpointManager; SURVEY.md §6.4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from forest_tpu.training.orbax_checkpointing import OrbaxCheckpointManager


@pytest.fixture
def mesh():
    return Mesh(np.array(jax.devices()), ("data",))


class TestOrbaxManager:
    def test_sharded_roundtrip_best_and_resume(self, mesh, tmp_path):
        shard = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        state = {
            "params": jax.device_put(jnp.arange(32.0).reshape(8, 4), repl),
            "ema": jax.device_put(jnp.arange(16.0).reshape(8, 2), shard),
            "step": jax.device_put(jnp.int32(7), repl),
        }
        m = OrbaxCheckpointManager(tmp_path / "ck", top_k=2,
                                   periodic_every=2, monitor="val/loss")
        m.save(0, state, {"val/loss": 5.0})
        s1 = jax.tree.map(
            lambda x: x + 1 if x.dtype != jnp.int32 else x, state)
        m.save(1, s1, {"val/loss": float("nan")})  # NaN never ranks
        s2 = jax.tree.map(
            lambda x: x + 2 if x.dtype != jnp.int32 else x, state)
        m.save(2, s2, {"val/loss": 3.0})

        assert m.latest_epoch() == 2
        assert m.best_epoch() == 2

        restored, e = m.maybe_resume(state)
        assert e == 2
        np.testing.assert_allclose(np.asarray(restored["ema"]),
                                   np.asarray(s2["ema"]))
        # shardings preserved: each restored array placed as the target
        assert restored["ema"].sharding == shard
        assert restored["params"].sharding == repl
        assert int(restored["step"]) == 7
        m.close()

    def test_empty_dir_resume_is_none(self, tmp_path):
        m = OrbaxCheckpointManager(tmp_path / "ck2", top_k=1)
        assert m.maybe_resume({"x": jnp.zeros((2,))}) is None
        m.close()

    def test_frl_train_state_roundtrip(self, mesh, tmp_path):
        """Real optimizer state (FRLTrainState pytree) roundtrips with
        replicated shardings intact."""
        from forest_tpu.models import representation as rep
        from forest_tpu.training.representation import train_step as ts

        model = rep.RepresentationModel(
            type_in_channels=4, phase_in_channels=3, z_type_dim=8,
            type_encoder_channels=(16, 8), z_phase_dim=3,
            phase_tcn_channels=(12, 12), phase_tcn_dilations=(1, 2))
        params = rep.init_variables(model, jax.random.key(0),
                                    num_timesteps=15)["params"]
        opt = ts.make_optimizer(1e-3)
        repl = NamedSharding(mesh, P())
        state = jax.device_put(ts.init_train_state(params, opt), repl)

        m = OrbaxCheckpointManager(tmp_path / "ck3", top_k=1,
                                   monitor="val/loss_total")
        m.save(4, state, {"val/loss_total": 1.25, "train/extra": 0.5})
        restored, e = m.maybe_resume(state)
        assert e == 4
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                    np.asarray(b)),
            restored.params, state.params)
        leaves = jax.tree_util.tree_leaves(restored)
        assert all(le.sharding == repl for le in leaves
                   if isinstance(le, jax.Array))
        m.close()
