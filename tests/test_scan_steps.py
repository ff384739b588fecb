"""Multi-step-per-dispatch training (VERDICT r4 task #3).

``vqvae_step.make_scan_train_step`` runs K train steps in ONE device
dispatch via ``lax.scan`` over host-stacked batches + annealer weights
(``wire.stack_batches``), so the relay's per-dispatch/per-fetch drain
cost amortizes over K steps. These tests pin on CPU that the scanned
path is semantically EXACTLY K sequential steps: same rng folding
(``jax.random.split(rng, K)``), same per-step annealer weights, same
final state and metrics; plus the host stacker's pytree/owning-array
contract and the wire-encoded path end-to-end.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forest_tpu.data import wire


class TestStackBatches:
    def test_nested_owning_stack(self, rng):
        batches = [{"a": rng.normal(size=(4, 3)).astype(np.float32),
                    "sub": {"b": rng.integers(0, 9, (4,)).astype(np.int32)}}
                   for _ in range(3)]
        s = wire.stack_batches(batches)
        assert s["a"].shape == (3, 4, 3)
        assert s["sub"]["b"].shape == (3, 4)
        # owning contiguous arrays (views serialize ~4x slower via relay)
        assert s["a"].flags["OWNDATA"] and s["a"].flags["C_CONTIGUOUS"]
        for i, b in enumerate(batches):
            np.testing.assert_array_equal(s["a"][i], b["a"])
            np.testing.assert_array_equal(s["sub"]["b"][i], b["sub"]["b"])


@pytest.fixture(scope="module")
def vq_pipeline(tmp_path_factory):
    from forest_tpu.data.cube import build_synthetic_cube
    from forest_tpu.data.samplers import ChunkBatchSampler
    from forest_tpu.data.schema import build_and_save_schema
    from forest_tpu.data.vqvae_dataset import VQVAEDataset
    from forest_tpu.models.vqvae import VQVAE
    from forest_tpu.training import vqvae_step

    root = tmp_path_factory.mktemp("scan")
    cube = build_synthetic_cube(root / "cube.zarr", height=64, width=64,
                                chunk_yx=32, patch_size=32, seed=0)
    sp = build_and_save_schema(cube, root / "run", 32, 10,
                               min_hits_per_epoch=1)
    ds = VQVAEDataset(root / "cube.zarr", sp, split="train",
                      block_size=(1, 1))
    model = VQVAE(cont_dim=len(ds.cont_names),
                  cat_vocab_sizes={n: ds.schema_cat[n]["num_ids"]
                                   for n in ds.cat_names},
                  naip_bands=ds.naip.shape[-1],
                  num_timesteps=len(ds.ds["years"]),
                  emb_dim=16, codebook_size=16, hidden=32, quantizer="ema")
    opt = vqvae_step.make_optimizer(1e-3)
    sampler = ChunkBatchSampler(ds.xy_by_chunk, 32, seed=0,
                                replacement_within_chunk=True)
    it = iter(sampler)
    batches = [ds.load_batch(next(it)) for _ in range(4)]
    return model, opt, batches, ds


def _weights(scale):
    return {k: jnp.float32(scale)
            for k in ("cont", "cat", "canopy", "vq")}


class TestScanParity:
    def test_scan_equals_sequential(self, vq_pipeline):
        """K=4 scanned steps == 4 sequential train_step calls with
        rngs = split(rng, 4) and per-step weights: same final params,
        same per-step metrics."""
        from forest_tpu.training import vqvae_step
        from forest_tpu.training.train_vqvae import host_to_device_batch

        model, opt, batches, _ds = vq_pipeline
        dev = [host_to_device_batch(dict(b)) for b in batches]
        # distinct per-step annealer weights so weight scanning is pinned
        ws = [_weights(1.0 + 0.1 * i) for i in range(4)]
        rng = jax.random.key(7)
        rngs = jax.random.split(rng, 4)

        ts = vqvae_step.make_train_step(model, opt)
        step = jax.jit(ts)
        state = vqvae_step.init_train_state(model, opt, dev[0],
                                            jax.random.key(0))
        seq_metrics = []
        for i in range(4):
            state, m = step(state, dev[i], ws[i], rngs[i])
            seq_metrics.append(jax.device_get(m))
        seq_state = state

        multi = jax.jit(vqvae_step.make_scan_train_step(ts))
        state2 = vqvae_step.init_train_state(model, opt, dev[0],
                                             jax.random.key(0))
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *dev)
        stacked_w = jax.tree.map(lambda *xs: jnp.stack(xs), *ws)
        state2, m2 = multi(state2, stacked, stacked_w, rng)

        for i in range(4):
            for k, v in seq_metrics[i].items():
                np.testing.assert_allclose(
                    np.asarray(m2[k])[i], v, rtol=1e-5, atol=1e-6,
                    err_msg=f"step {i} metric {k}")
        for a, b in zip(jax.tree_util.tree_leaves(seq_state.params),
                        jax.tree_util.tree_leaves(state2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)
        assert int(state2.step) == 4

    def test_scan_on_wire_encoded_stack(self, vq_pipeline):
        """The production path: wire-encode each batch on host, stack the
        ENCODED numpy batches, one dispatch. Decode-in-scan must see the
        original per-step shapes (packed masks unpack per slice)."""
        from forest_tpu.training import vqvae_step
        from forest_tpu.training.train_vqvae import (host_to_device_batch,
                                                     wire_int_bounds)

        model, opt, batches, ds = vq_pipeline
        bounds = wire_int_bounds(ds)
        enc = [wire.encode_wire_batch(
            {k: v for k, v in b.items() if k not in ("years", "yx")},
            int_bounds=bounds) for b in batches]
        stacked = wire.stack_batches(enc)
        ws = [_weights(1.0) for _ in range(4)]
        stacked_w = jax.tree.map(lambda *xs: jnp.stack(xs), *ws)

        first = host_to_device_batch(dict(batches[0]), wire=True,
                                     int_bounds=bounds)
        state = vqvae_step.init_train_state(model, opt, first,
                                            jax.random.key(0))
        ts = vqvae_step.make_train_step(model, opt)
        multi = jax.jit(vqvae_step.make_scan_train_step(ts))
        state, m = multi(state, jax.tree.map(jnp.asarray, stacked),
                         stacked_w, jax.random.key(7))
        losses = np.asarray(m["loss/total"])
        assert losses.shape == (4,)
        assert np.all(np.isfinite(losses))
        # parity vs the same 4 wire steps run sequentially
        step = jax.jit(ts)
        state2 = vqvae_step.init_train_state(model, opt, first,
                                             jax.random.key(0))
        rngs = jax.random.split(jax.random.key(7), 4)
        for i in range(4):
            b = host_to_device_batch(dict(batches[i]), wire=True,
                                     int_bounds=bounds)
            state2, m2 = step(state2, b, ws[i], rngs[i])
            np.testing.assert_allclose(losses[i], float(m2["loss/total"]),
                                       rtol=1e-5)


class TestTrainLoopScan:
    def test_train_vqvae_steps_per_dispatch(self, tmp_path):
        """The CLI loop with steps_per_dispatch=2 trains end-to-end and
        matches the per-step loop's step count + finite metrics."""
        from forest_tpu.data.cube import build_synthetic_cube
        from forest_tpu.training.train_vqvae import load_config, train

        build_synthetic_cube(tmp_path / "cube.zarr", height=64, width=64,
                             chunk_yx=32, patch_size=32, seed=0)
        cfg = load_config(None, dict(
            zarr=str(tmp_path / "cube.zarr"),
            run_dir=str(tmp_path / "run"),
            batch_size=32, steps_per_epoch=4, epochs=1, num_workers=1,
            emb_dim=16, codebook_size=16, hidden=32,
            min_hits_per_epoch=1, block_size=(1, 1),
            steps_per_dispatch=2, data_parallel=False,
            wire_compact=True, val_steps=1))
        out = train(cfg)
        h = out["history"][0]
        assert np.isfinite(h["train/loss_total"])
        assert int(out["state"].step) == 4
