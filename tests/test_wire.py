"""Compact H2D wire format (data/wire.py): bf16 floats + bit-packed
masks. The relay H2D link is the measured e2e training wall (~50 MB/s
effective, no compute overlap -- CLAUDE.md TIMING PROTOCOL), so the
scored pipeline runs on the compact wire; these tests pin that the wire
is lossless where it must be (masks, ints) and bf16-tolerant where it
may be (z-scored float features), and that every step path decodes it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forest_tpu.data import wire


def _batch(rng, b=32, t=5, c=8):
    cont = rng.normal(size=(b, t, c)).astype(np.float32)
    return {
        "cont": cont,
        "cont_nan_mask": (rng.random((b, t, c)) > 0.1).astype(np.uint8),
        "cat": rng.integers(0, 9, (b, t, 2)).astype(np.int32),
        "cat_target": {
            "cat_0": rng.integers(0, 9, (b, t)).astype(np.int32)},
        "naip": rng.normal(size=(b, 3, 3, 3)).astype(np.float32),
        "naip_nan_mask": (rng.random((b, 3, 3, 3)) > 0.2).astype(np.uint8),
        "canopy": rng.normal(size=(b,)).astype(np.float32),
    }


class TestRoundTrip:
    def test_masks_and_ints_exact(self, rng):
        b = _batch(rng)
        enc = wire.encode_wire_batch(b)
        # masks travel bit-packed: 8x fewer bytes
        assert enc["cont_nan_mask"].ndim == 2
        assert enc["cont_nan_mask"].nbytes * 8 >= b["cont_nan_mask"].size
        assert enc["cont_nan_mask"].nbytes <= b["cont_nan_mask"].nbytes // 6
        dec = wire.decode_wire_batch(
            {k: ({n: jnp.asarray(a) for n, a in v.items()}
                 if isinstance(v, dict) else jnp.asarray(v))
             for k, v in enc.items()})
        np.testing.assert_array_equal(np.asarray(dec["cont_nan_mask"]),
                                      b["cont_nan_mask"])
        np.testing.assert_array_equal(np.asarray(dec["naip_nan_mask"]),
                                      b["naip_nan_mask"])
        np.testing.assert_array_equal(np.asarray(dec["cat"]), b["cat"])
        np.testing.assert_array_equal(
            np.asarray(dec["cat_target"]["cat_0"]),
            b["cat_target"]["cat_0"])

    def test_floats_bf16_tolerant(self, rng):
        b = _batch(rng)
        enc = wire.encode_wire_batch(b)
        dec = wire.decode_wire_batch(
            {k: jnp.asarray(v) for k, v in enc.items()
             if not isinstance(v, dict)})
        assert dec["cont"].dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(dec["cont"]), b["cont"],
                                   rtol=8e-3, atol=8e-3)

    def test_decode_is_identity_on_plain_batches(self, rng):
        b = {k: ({n: jnp.asarray(a) for n, a in v.items()}
                 if isinstance(v, dict) else jnp.asarray(v))
             for k, v in _batch(rng).items()}
        dec = wire.decode_wire_batch(b)
        for k in ("cont", "cont_nan_mask", "cat", "naip", "canopy"):
            np.testing.assert_array_equal(np.asarray(dec[k]),
                                          np.asarray(b[k]))

    def test_int_bounds_narrow_ids(self, rng):
        """Schema-asserted id bounds: unsigned tiers for non-negative ids,
        signed tiers when an IGNORE_INDEX sentinel rides along; ints stay
        LOSSLESS (decode leaves them be; consumers index with any dtype)."""
        b = _batch(rng, b=256)
        b["cat_target"]["cat_0"][0, 0] = -100  # IGNORE_INDEX sentinel
        enc = wire.encode_wire_batch(
            b, int_bounds={"cat": 9, "cat_0": (-100, 9)})
        assert enc["cat"].dtype == np.uint8
        assert enc["cat_target"]["cat_0"].dtype == np.int8
        dec = wire.decode_wire_batch(
            {k: ({n: jnp.asarray(a) for n, a in v.items()}
                 if isinstance(v, dict) else jnp.asarray(v))
             for k, v in enc.items()})
        np.testing.assert_array_equal(
            np.asarray(dec["cat"]).astype(np.int32), b["cat"])
        np.testing.assert_array_equal(
            np.asarray(dec["cat_target"]["cat_0"]).astype(np.int32),
            b["cat_target"]["cat_0"])
        # 16-bit tiers
        enc = wire.encode_wire_batch(
            b, int_bounds={"cat": 300, "cat_0": (-100, 300)})
        assert enc["cat"].dtype == np.uint16
        assert enc["cat_target"]["cat_0"].dtype == np.int16
        # bounds that don't fit any narrow tier leave the array alone
        enc = wire.encode_wire_batch(
            b, int_bounds={"cat": 2 ** 17, "cat_0": (-100, 2 ** 16)})
        assert enc["cat"].dtype == np.int32
        assert enc["cat_target"]["cat_0"].dtype == np.int32

    def test_wire_int_bounds_cat_name_collision(self):
        """A categorical feature literally named "cat" shares its key with
        the merged id block; the bound must then hold BOTH arrays (union:
        sentinel + max vocab), never an unsigned bound that would wrap the
        target's -100."""
        from types import SimpleNamespace

        from forest_tpu.training.train_vqvae import wire_int_bounds

        ds = SimpleNamespace(cat_names=["cat", "evt"],
                             schema_cat={"cat": {"num_ids": 9},
                                         "evt": {"num_ids": 300}})
        b = wire_int_bounds(ds)
        assert b["cat"] == (-100, 300)
        assert b["evt"] == (-100, 300)
        ds2 = SimpleNamespace(cat_names=["evt"],
                              schema_cat={"evt": {"num_ids": 9}})
        b2 = wire_int_bounds(ds2)
        assert b2 == {"evt": (-100, 9), "cat": 9}

    def test_wire_bytes_shrink(self, rng):
        b = _batch(rng, b=512)
        plain = sum(np.asarray(v).nbytes for v in jax.tree.leaves(b))
        enc = wire.encode_wire_batch(b)
        packed = sum(np.asarray(v).nbytes for v in jax.tree.leaves(enc))
        # ~1.9x fewer relay bytes (floats halve, masks shrink 8x; int id
        # arrays are untouched and bound the ratio)
        assert packed < plain * 0.55


class TestStepParity:
    @pytest.fixture(scope="class")
    def pipeline(self, tmp_path_factory):
        from forest_tpu.data.cube import build_synthetic_cube
        from forest_tpu.data.samplers import ChunkBatchSampler
        from forest_tpu.data.schema import build_and_save_schema
        from forest_tpu.data.vqvae_dataset import VQVAEDataset
        from forest_tpu.models.vqvae import VQVAE
        from forest_tpu.training import vqvae_step

        root = tmp_path_factory.mktemp("wire")
        cube = build_synthetic_cube(root / "cube.zarr", height=64,
                                    width=64, chunk_yx=32, patch_size=32,
                                    seed=0)
        sp = build_and_save_schema(cube, root / "run", 64, 10,
                                   min_hits_per_epoch=1)
        ds = VQVAEDataset(root / "cube.zarr", sp, split="train",
                          block_size=(1, 1))
        model = VQVAE(cont_dim=len(ds.cont_names),
                      cat_vocab_sizes={n: ds.schema_cat[n]["num_ids"]
                                       for n in ds.cat_names},
                      naip_bands=ds.naip.shape[-1],
                      num_timesteps=len(ds.ds["years"]),
                      emb_dim=16, codebook_size=16, hidden=32,
                      quantizer="ema")
        opt = vqvae_step.make_optimizer(1e-3)
        s = ChunkBatchSampler(ds.xy_by_chunk, 64, seed=0,
                              replacement_within_chunk=True)
        host = ds.load_batch(next(iter(s)))
        return model, opt, host, ds

    def test_train_step_loss_matches_plain(self, pipeline):
        """One train step on the SAME batch, plain vs compact wire vs
        compact wire + schema-derived narrow ids: the loss differs only
        by the bf16 input rounding (ids are lossless)."""
        from forest_tpu.training import vqvae_step
        from forest_tpu.training.train_vqvae import (host_to_device_batch,
                                                     wire_int_bounds)

        model, opt, host, ds = pipeline
        bounds = wire_int_bounds(ds)
        assert "cat" in bounds and all(
            n in bounds for n in ds.cat_names)
        w = {k: jnp.float32(1.0)
             for k in ("cont", "cat", "canopy", "vq")}
        losses = {}
        for name, use_wire, ib in (("plain", False, None),
                                   ("wire", True, None),
                                   ("narrow", True, bounds)):
            batch = host_to_device_batch(dict(host), wire=use_wire,
                                         int_bounds=ib)
            if name == "narrow" and ds.cat_names:
                assert batch["cat"].dtype in (jnp.uint8, jnp.uint16)
            state = vqvae_step.init_train_state(model, opt, batch,
                                                jax.random.key(0))
            step = jax.jit(vqvae_step.make_train_step(model, opt))
            state, m = step(state, batch, w, jax.random.key(0))
            losses[name] = float(m["loss/total"])
        assert losses["wire"] == pytest.approx(losses["plain"], rel=2e-2)
        # narrow ids are lossless: same inputs as the wire leg bit-for-bit
        assert losses["narrow"] == pytest.approx(losses["wire"], rel=1e-5)

    def test_eval_step_decodes_wire(self, pipeline):
        from forest_tpu.training import vqvae_step
        from forest_tpu.training.train_vqvae import host_to_device_batch

        model, opt, host, _ds = pipeline
        w = {k: jnp.float32(1.0)
             for k in ("cont", "cat", "canopy", "vq")}
        batch = host_to_device_batch(dict(host), wire=True)
        state = vqvae_step.init_train_state(model, opt, batch,
                                            jax.random.key(0))
        ev = jax.jit(vqvae_step.make_eval_step(model))
        m = ev(state.params, batch, w)
        assert np.isfinite(float(m["loss/total"]))


class TestWireMaskSymmetry:
    def test_2d_companion_mask_travels_plain(self, rng):
        """Encode must only pack what decode can unpack: decode recognizes
        a packed mask by (mask.ndim==2, data.ndim>2), so a mask whose
        companion is 2-D (or absent) round-trips PLAIN, not corrupted."""
        b = {"score": rng.normal(size=(8, 5)).astype(np.float32),
             "score_nan_mask": (rng.random((8, 5)) > 0.3).astype(np.uint8),
             "orphan_nan_mask": (rng.random((8, 7)) > 0.3).astype(np.uint8)}
        enc = wire.encode_wire_batch(b)
        assert enc["score_nan_mask"].shape == (8, 5)  # not packed
        assert enc["orphan_nan_mask"].shape == (8, 7)
        dec = wire.decode_wire_batch(
            {k: jnp.asarray(v) for k, v in enc.items()})
        np.testing.assert_array_equal(np.asarray(dec["score_nan_mask"]),
                                      b["score_nan_mask"])
        np.testing.assert_array_equal(np.asarray(dec["orphan_nan_mask"]),
                                      b["orphan_nan_mask"])


class TestWireSkipGroups:
    def test_step_config_derived_skip_protects_renamed_code_group(self):
        """EVT groups are user-nameable (losses.evt.feature): the loop
        threads step.wire_exact_groups into the wire so codes stay exact
        even without 'categorical' in the group name."""
        from forest_tpu.training.representation.step import (StepConfig,
                                                             wire_exact_groups)

        assert wire_exact_groups(
            StepConfig(evt_enabled=True,
                       evt_feature="evt_codes.evt")) == ("evt_codes",)
        assert wire_exact_groups(StepConfig()) == ()

        codes = np.full((2, 4, 4, 1), 7123.0, np.float32)  # not bf16-exact
        enc = wire.encode_wire_batch({"evt_codes": codes},
                                     skip=("evt_codes",))
        assert enc["evt_codes"].dtype == np.float32
        np.testing.assert_array_equal(enc["evt_codes"], codes)


class TestFrlLoopWire:
    """run_epoch's compact-wire path (auto-on for TPU backends): the FRL
    step decodes in-graph and categorical-coded float groups stay exact."""

    def test_categorical_float_group_survives_exact(self):
        from forest_tpu.data.cube_v2 import synthetic_frl_batch

        b = synthetic_frl_batch(np.random.default_rng(0), 2, 16)
        enc = wire.encode_wire_batch(b)
        # EVT codes (7001+) ride float arrays; bf16 would round them
        assert enc["static_categorical"].dtype == np.float32
        np.testing.assert_array_equal(enc["static_categorical"],
                                      b["static_categorical"])
        # plain float groups DO shrink
        assert enc["static"].nbytes == b["static"].nbytes // 2
        dec = wire.decode_wire_batch(
            {k: jnp.asarray(v) for k, v in enc.items()})
        np.testing.assert_array_equal(np.asarray(dec["static_categorical"]),
                                      b["static_categorical"])

    def test_frl_epoch_wire_parity(self):
        """Same tiny FRL epoch with wire_compact on vs off: metrics agree
        to bf16 input rounding (codes/masks exact => same anchor/pair
        structure, only feature values are rounded)."""
        import sys
        sys.path.insert(0, str(__import__("pathlib").Path(
            __file__).parent))
        from frl_tiny import FakeFrlDataset, make_frl_parts

        from forest_tpu.training.representation import loops
        from forest_tpu.training.representation import train_step as ts

        results = {}
        for use_wire in (False, True):
            parts = make_frl_parts(hw=32)
            step = jax.jit(ts.make_train_step(parts.process, parts.opt),
                           donate_argnums=0)
            ds = FakeFrlDataset(n=4, hw=parts.hw, t=parts.t)
            _, m = loops.run_epoch(
                ds, step, parts.state, batch_size=4,
                weights=parts.weights, curriculum=parts.curriculum,
                rng_seed=7, train=True, num_workers=1,
                wire_compact=use_wire)
            results[use_wire] = m
        assert results[True]["loss_total"] == pytest.approx(
            results[False]["loss_total"], rel=2e-2)
