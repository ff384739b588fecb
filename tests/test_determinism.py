"""Reproducibility: same seeds -> identical codebook assignments, anchors,
and training trajectories (the parity-gate discipline of SURVEY.md §8.1
applied to our own pipeline)."""
import jax
import jax.numpy as jnp
import numpy as np

from forest_tpu.data.anchor_sampling import sample_anchors_grid_plus_supplement
from forest_tpu.ops import vq


class TestDeterminism:
    def test_vq_assignments_stable_across_calls(self, rng):
        x = jnp.asarray(rng.normal(size=(500, 32)), jnp.float32)
        cb = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
        a = np.asarray(vq.vq_assign(x, cb, use_pallas=False))
        b = np.asarray(vq.vq_assign(x, cb, use_pallas=False))
        np.testing.assert_array_equal(a, b)

    def test_anchor_sampling_keyed(self):
        w = jnp.ones((64, 64))
        c1, v1 = sample_anchors_grid_plus_supplement(
            jax.random.key(7), 64, 64, w)
        c2, v2 = sample_anchors_grid_plus_supplement(
            jax.random.key(7), 64, 64, w)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        c3, _ = sample_anchors_grid_plus_supplement(
            jax.random.key(8), 64, 64, w)
        assert not np.array_equal(np.asarray(c1), np.asarray(c3))

    def test_train_trajectory_reproducible(self, tmp_path, rng):
        """Two fresh runs with the same seed produce identical codebooks."""
        from forest_tpu.data.cube import build_synthetic_cube
        from forest_tpu.training import train_vqvae

        build_synthetic_cube(tmp_path / "cube.zarr", height=64, width=64,
                             chunk_yx=32, patch_size=32, seed=0)

        def run(run_dir):
            cfg = train_vqvae.load_config(None, {})
            cfg.update(zarr=str(tmp_path / "cube.zarr"),
                       run_dir=str(tmp_path / run_dir), epochs=1,
                       steps_per_epoch=4, batch_size=32, num_workers=1,
                       block_size=(1, 1), min_hits_per_epoch=1,
                       val_steps=1, emb_dim=16, hidden=16,
                       codebook_size=8, eager=True, seed=123)
            return train_vqvae.train(cfg)

        r1 = run("runA")
        r2 = run("runB")
        np.testing.assert_array_equal(
            np.asarray(r1["state"].params["codebook"]),
            np.asarray(r2["state"].params["codebook"]))
        np.testing.assert_array_equal(
            np.asarray(r1["state"].vq_stats.code_usage),
            np.asarray(r2["state"].vq_stats.code_usage))
