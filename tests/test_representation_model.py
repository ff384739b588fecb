"""FRL model tests: shapes, FiLM init identity, sparse==dense phase path,
smoothing gate curriculum, config roundtrip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forest_tpu.models import representation as rep
from forest_tpu.models.spatial import EdgeAwareSmoothingConv2D, depthwise_bank_conv
from forest_tpu.models.tcn import TCNEncoder

B, H, W = 2, 16, 16
CT, CP, T = 10, 6, 7


def make_model(**kw):
    kw.setdefault("type_in_channels", CT)
    kw.setdefault("phase_in_channels", CP)
    kw.setdefault("z_type_dim", 12)
    kw.setdefault("type_encoder_channels", (24, 12))
    kw.setdefault("z_phase_dim", 4)
    kw.setdefault("phase_tcn_channels", (16, 16))
    kw.setdefault("phase_tcn_dilations", (1, 2))
    return rep.RepresentationModel(**kw)


@pytest.fixture(scope="module")
def model_and_params():
    model = make_model()
    params = rep.init_variables(model, jax.random.key(0),
                                num_timesteps=T)["params"]
    return model, params


class TestTypePath:
    def test_forward_shape_and_gate(self, model_and_params, rng):
        model, params = model_and_params
        x = jnp.asarray(rng.normal(size=(B, H, W, CT)), jnp.float32)
        z, gate = model.apply({"params": params}, x, return_gate=True)
        assert z.shape == (B, H, W, 12)
        assert gate.shape == (B, H, W, 12)
        assert float(gate.min()) >= 0 and float(gate.max()) <= 1

    def test_min_gate_curriculum(self, model_and_params, rng):
        model, params = model_and_params
        x = jnp.asarray(rng.normal(size=(B, H, W, CT)), jnp.float32)
        _, gate = model.apply({"params": params}, x, return_gate=True,
                              min_gate=0.9)
        assert float(gate.min()) >= 0.9 - 1e-6

    def test_min_gate_one_is_identity_of_encoder(self, model_and_params, rng):
        """gate==1 -> output = smoothed + 1*(h - smoothed) = h (encoder out)."""
        model, params = model_and_params
        x = jnp.asarray(rng.normal(size=(B, H, W, CT)), jnp.float32)
        z1 = model.apply({"params": params}, x, min_gate=1.0)
        h = model.apply({"params": params}, x,
                        method=lambda m, x: m.encoder(x))
        np.testing.assert_allclose(np.asarray(z1), np.asarray(h), atol=1e-5)


class TestDepthwiseBank:
    def test_horizontal_filter_smooths_rows(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)), jnp.float32)
        from forest_tpu.models.spatial import _direction_bank
        out = depthwise_bank_conv(x, jnp.asarray(_direction_bank()))
        assert out.shape == (1, 8, 8, 3, 4)
        # horizontal template: mean of 3 horizontal neighbors
        expect = (np.asarray(x)[0, 3, 2:5, 1].sum() / 3)
        np.testing.assert_allclose(float(out[0, 3, 3, 1, 0]), expect,
                                   rtol=1e-5)

    def test_constant_input_is_preserved(self):
        x = jnp.ones((1, 8, 8, 2)) * 5.0
        from forest_tpu.models.spatial import _direction_bank
        out = depthwise_bank_conv(x, jnp.asarray(_direction_bank()))
        # interior pixels: mean of three 5s = 5
        np.testing.assert_allclose(np.asarray(out[0, 2:6, 2:6]), 5.0,
                                   rtol=1e-5)


class TestPhasePath:
    def test_film_near_identity_at_init(self, model_and_params, rng):
        """gamma ~ 1, beta ~ 0 at init: z_phase ~ pre-FiLM h."""
        model, params = model_and_params
        xp = jnp.asarray(rng.normal(size=(5, T, CP)), jnp.float32)
        zt = jnp.asarray(rng.normal(size=(5, 12)), jnp.float32)
        z, gamma, beta, h = model.apply(
            {"params": params}, xp, zt, return_film=True,
            return_pre_film=True,
            method=model.forward_phase_at_locations)
        assert z.shape == (5, T, 4)
        np.testing.assert_allclose(np.asarray(gamma), 1.0, atol=0.2)
        np.testing.assert_allclose(np.asarray(beta), 0.0, atol=0.2)
        np.testing.assert_allclose(np.asarray(z),
                                   np.asarray(gamma[:, None] * h
                                              + beta[:, None]), atol=1e-5)

    def test_sparse_equals_dense(self, model_and_params, rng):
        """forward_phase_at_locations must be pointwise-identical to the
        dense forward_phase (representation.py:376-436 contract)."""
        model, params = model_and_params
        xp = jnp.asarray(rng.normal(size=(B, T, H, W, CP)), jnp.float32)
        zt = jnp.asarray(rng.normal(size=(B, H, W, 12)), jnp.float32)
        dense = model.apply({"params": params}, xp, zt,
                            method=model.forward_phase)
        ys = np.array([1, 5, 9])
        xs = np.array([2, 7, 11])
        # index [B, T, H, W, C] at b=0, all T, (y, x) pairs:
        px = jnp.stack([xp[0, :, y, x] for y, x in zip(ys, xs)])
        pz = jnp.stack([zt[0, y, x] for y, x in zip(ys, xs)])
        sparse = model.apply({"params": params}, px, pz,
                             method=model.forward_phase_at_locations)
        expect = jnp.stack([dense[0, :, y, x] for y, x in zip(ys, xs)])
        np.testing.assert_allclose(np.asarray(sparse), np.asarray(expect),
                                   atol=1e-5)


class TestTCN:
    def test_masked_stats_pooling(self, rng):
        tcn = TCNEncoder(channels=(8,), pooling="stats")
        x = jnp.asarray(rng.normal(size=(4, 6, 3)), jnp.float32)
        params = tcn.init(jax.random.key(0), x)["params"]
        mask = jnp.ones((4, 6)).at[:, 4:].set(0)
        out = tcn.apply({"params": params}, x, mask)
        assert out.shape == (4, 16)
        # fully-masked row: falls back to count-1 clamp without NaN
        mask0 = jnp.zeros((4, 6))
        out0 = tcn.apply({"params": params}, x, mask0)
        assert np.all(np.isfinite(np.asarray(out0)))

    def test_spatial_input_folding(self, rng):
        tcn = TCNEncoder(channels=(8,), pooling="none")
        x = jnp.asarray(rng.normal(size=(2, 6, 4, 4, 3)), jnp.float32)
        params = tcn.init(jax.random.key(0), x)["params"]
        out = tcn.apply({"params": params}, x)
        assert out.shape == (2, 6, 4, 4, 8)
        # pixel independence: same series through 3D path matches
        flat = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(32, 6, 3)
        out3 = tcn.apply({"params": params}, flat)
        np.testing.assert_allclose(
            np.asarray(out3.reshape(2, 4, 4, 6, 8)[0, 1, 2]),
            np.asarray(out[0, :, 1, 2]), atol=1e-5)


class TestConfig:
    def test_roundtrip(self):
        model = make_model()
        cfg = rep.model_config_dict(model)
        m2 = rep.from_config(cfg, CT, CP)
        assert m2.z_type_dim == model.z_type_dim
        assert tuple(m2.phase_tcn_dilations) == (1, 2)

    def test_version_check(self):
        with pytest.raises(ValueError, match="version"):
            rep.from_config({"version": "3"}, CT, CP)

    def test_projection_identity_when_disabled(self, model_and_params, rng):
        model, params = model_and_params
        z = jnp.asarray(rng.normal(size=(4, 12)), jnp.float32)
        out = model.apply({"params": params}, z, method=model.project_type)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(z))
