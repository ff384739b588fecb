"""Reference-checkpoint importer tests (utils/torch_import.py).

Functional parity is checked against small in-test torch mirrors built from
the documented reference contracts (the same technique as the VQ oracle
gates) -- NOT against copied reference code: Conv2DEncoder stages
(conv2d_encoder.py:97-141), the TCN GatedResidualBlock
(tcn.py:53-111), FiLM heads (conditioning.py:55-67), and the Sobel ->
mix_backbone input ordering (spatial.py:290-297, the one real data-layout
permutation in the mapping).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from forest_tpu.utils import torch_import as ti  # noqa: E402


def _np(t):
    return t.detach().numpy()


@pytest.fixture(autouse=True)
def _cpu():
    jax.config.update("jax_platforms", "cpu")


class TestConv2DEncoderParity:
    def _torch_encoder(self, cin, channels, ks, groups, seed=0):
        torch.manual_seed(seed)
        layers = []
        prev = cin
        n = len(channels)
        for i, ch in enumerate(channels):
            layers.append(tnn.Conv2d(prev, ch, ks, padding=(ks - 1) // 2,
                                     bias=False))
            layers.append(tnn.GroupNorm(groups, ch))
            if i < n - 1:
                layers.append(tnn.ReLU())
            prev = ch
        return tnn.Sequential(*layers)

    def test_forward_matches(self):
        from forest_tpu.models.conv2d_encoder import Conv2DEncoder
        cin, channels = 5, [8, 4]
        enc = self._torch_encoder(cin, channels, ks=3, groups=2)
        enc.eval()
        sd = {f"encoder.layers.{k}": _np(v)
              for k, v in enc.state_dict().items()}
        params, rep = ti.convert_state_dict(sd)
        assert len(rep.mapped) == len(sd)

        x = np.random.default_rng(0).normal(
            size=(2, 6, 6, cin)).astype(np.float32)
        model = Conv2DEncoder(channels=tuple(channels), kernel_size=3,
                              num_groups=2)
        got = model.apply({"params": params["encoder"]}, jnp.asarray(x))
        with torch.no_grad():
            want = enc(torch.from_numpy(
                np.transpose(x, (0, 3, 1, 2)))).numpy()
        np.testing.assert_allclose(np.asarray(got),
                                   np.transpose(want, (0, 2, 3, 1)),
                                   rtol=1e-4, atol=1e-5)

    def test_trailing_projection_parity(self):
        """Reference semantics with out_channels: the last STAGE still
        skips ReLU, and the biased 1x1 projection maps to conv_out."""
        from forest_tpu.models.conv2d_encoder import Conv2DEncoder
        cin, channels, cout = 3, [4], 2
        enc = self._torch_encoder(cin, channels, ks=1, groups=2)
        enc.eval()
        torch.manual_seed(9)
        proj = tnn.Conv2d(4, cout, 1)  # reference projection: bias=True
        sd = {f"encoder.layers.{k}": _np(v)
              for k, v in enc.state_dict().items()}
        sd["encoder.layers.2.weight"] = _np(proj.weight)
        sd["encoder.layers.2.bias"] = _np(proj.bias)
        params, _ = ti.convert_state_dict(sd)
        assert set(params["encoder"]["conv_out"]) == {"kernel", "bias"}

        x = np.random.default_rng(9).normal(
            size=(2, 4, 4, cin)).astype(np.float32)
        model = Conv2DEncoder(channels=(4,), kernel_size=1, num_groups=2,
                              out_channels=cout)
        got = model.apply({"params": params["encoder"]}, jnp.asarray(x))
        with torch.no_grad():
            want = proj(enc(torch.from_numpy(
                np.transpose(x, (0, 3, 1, 2))))).numpy()
        np.testing.assert_allclose(np.asarray(got),
                                   np.transpose(want, (0, 2, 3, 1)),
                                   rtol=1e-4, atol=1e-5)

    def test_missing_sibling_bias_is_descriptive(self):
        enc = self._torch_encoder(3, [4], ks=1, groups=2)
        sd = {f"encoder.layers.{k}": _np(v)
              for k, v in enc.state_dict().items()}
        del sd["encoder.layers.1.bias"]
        with pytest.raises(ValueError, match="missing"):
            ti.convert_state_dict(sd)


class TestTcnBlockParity:
    def test_gated_residual_block(self):
        from forest_tpu.models.tcn import GatedResidualBlock
        cin, cout, k, dil = 6, 4, 3, 2
        torch.manual_seed(1)
        conv = tnn.Conv1d(cin, cout, k, padding=(k - 1) * dil // 2,
                          dilation=dil)
        norm = tnn.GroupNorm(2, cout)
        gate = tnn.Conv1d(cout, cout, 1)
        proj = tnn.Conv1d(cin, cout, 1)
        sd = {}
        for name, mod in (("conv", conv), ("norm", norm), ("gate", gate),
                          ("projection", proj)):
            for leaf, v in mod.state_dict().items():
                sd[f"phase_tcn.layers.0.{name}.{leaf}"] = _np(v)
        params, _ = ti.convert_state_dict(sd)

        x = np.random.default_rng(1).normal(
            size=(3, 7, cin)).astype(np.float32)
        blk = GatedResidualBlock(out_channels=cout, kernel_size=k,
                                 dilation=dil, num_groups=2)
        got = blk.apply({"params": params["phase_tcn"]["block_0"]},
                        jnp.asarray(x))
        with torch.no_grad():
            xt = torch.from_numpy(np.transpose(x, (0, 2, 1)))  # [N, C, T]
            residual = proj(xt)
            out = norm(conv(xt))
            g = torch.sigmoid(gate(out))
            want = (g * F.relu(out) + (1 - g) * residual).numpy()
        np.testing.assert_allclose(np.asarray(got),
                                   np.transpose(want, (0, 2, 1)),
                                   rtol=1e-4, atol=1e-5)


class TestFilmParity:
    def test_gamma_beta(self):
        from forest_tpu.models.conditioning import FiLMLayer
        zt, zp = 8, 3
        hidden = max(zt, zp) // 2
        torch.manual_seed(2)
        nets = {}
        sd = {}
        for net in ("gamma_network", "beta_network"):
            c0 = tnn.Conv2d(zt, hidden, 1)
            c1 = tnn.Conv2d(hidden, zp, 1)
            nets[net] = (c0, c1)
            for slot, mod in ((0, c0), (2, c1)):
                for leaf, v in mod.state_dict().items():
                    sd[f"phase_film.{net}.{slot}.{leaf}"] = _np(v)
        params, _ = ti.convert_state_dict(sd)

        cond = np.random.default_rng(2).normal(
            size=(4, zt)).astype(np.float32)
        film = FiLMLayer(target_dim=zp)
        gamma, beta = film.apply({"params": params["phase_film"]},
                                 jnp.asarray(cond))
        with torch.no_grad():
            ct = torch.from_numpy(cond)[:, :, None, None]
            for net, out in (("gamma_network", gamma), ("beta_network",
                                                        beta)):
                c0, c1 = nets[net]
                want = c1(F.relu(c0(ct)))[:, :, 0, 0].numpy()
                np.testing.assert_allclose(np.asarray(out), want,
                                           rtol=1e-4, atol=1e-6)


class TestMixBackbonePermutation:
    def test_sobel_input_ordering(self):
        """The reference feeds cat([dx, dy], dim=1) (block order) into
        mix_backbone; forest-tpu's sobel_grads interleaves gx/gy per
        channel -- the imported conv kernel must be permuted to match."""
        from forest_tpu.ops.smoothing import sobel_grads
        import flax.linen as fnn
        c, gh = 4, 6
        torch.manual_seed(3)
        mb = tnn.Conv2d(2 * c, gh, 3, padding=1)
        sd = {"spatial_conv.mix_backbone.0.weight": _np(mb.weight),
              "spatial_conv.mix_backbone.0.bias": _np(mb.bias)}
        params, _ = ti.convert_state_dict(sd)

        x = np.random.default_rng(3).normal(
            size=(2, 8, 8, c)).astype(np.float32)
        feat_j = fnn.Conv(gh, (3, 3), padding="SAME").apply(
            {"params": params["spatial_conv"]["mix_backbone"]},
            sobel_grads(jnp.asarray(x)))

        sx = torch.tensor([[-1., 0., 1.], [-2., 0., 2.],
                           [-1., 0., 1.]]) / 4.0
        sy = torch.tensor([[-1., -2., -1.], [0., 0., 0.],
                           [1., 2., 1.]]) / 4.0
        with torch.no_grad():
            xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
            kx = sx.reshape(1, 1, 3, 3).expand(c, 1, 3, 3).contiguous()
            ky = sy.reshape(1, 1, 3, 3).expand(c, 1, 3, 3).contiguous()
            dx = F.conv2d(xt, kx, padding=1, groups=c)
            dy = F.conv2d(xt, ky, padding=1, groups=c)
            want = mb(torch.cat([dx, dy], dim=1)).numpy()
        np.testing.assert_allclose(np.asarray(feat_j),
                                   np.transpose(want, (0, 2, 3, 1)),
                                   rtol=1e-4, atol=1e-5)


def make_ref_state_dict(rng, cfg, tin, pin):
    """Synthesize a reference-shaped state_dict for the v4 model config
    (key inventory per the module docstring's file:line citations)."""
    m = cfg["model"]
    zt, zp = m["z_type_dim"], m["z_phase_dim"]
    tch = list(m["type_encoder"]["channels"])
    ks = m["type_encoder"].get("kernel_size", 1)
    pch = list(m["phase_tcn"]["channels"])
    pk = m["phase_tcn"].get("kernel_size", 3)
    s = m.get("spatial_conv", {})
    gh = s.get("gate_hidden", 64)
    gk = s.get("gate_kernel_size", 3)
    nd = s.get("num_directions", 4)
    r = s.get("rank", 4)
    proj = m.get("type_projection") or {}

    def t(*shape):
        return rng.normal(scale=0.2, size=shape).astype(np.float32)

    sd = {}
    j, prev = 0, tin
    for i, ch in enumerate(tch):
        sd[f"encoder.layers.{j}.weight"] = t(ch, prev, ks, ks)
        sd[f"encoder.layers.{j + 1}.weight"] = t(ch)
        sd[f"encoder.layers.{j + 1}.bias"] = t(ch)
        j += 2 + (1 if i < len(tch) - 1 else 0)  # ReLU slot (dropout=0)
        prev = ch

    c = zt
    sd["spatial_conv.bank"] = t(nd, c, 1, 3, 3)
    sd["spatial_conv.sobel_x"] = t(c, 1, 3, 3)
    sd["spatial_conv.sobel_y"] = t(c, 1, 3, 3)
    sd["spatial_conv.mix_backbone.0.weight"] = t(gh, 2 * c, 3, 3)
    sd["spatial_conv.mix_backbone.0.bias"] = t(gh)
    sd["spatial_conv.mix_head_A.weight"] = t(2 * nd * r, gh, 1, 1)
    sd["spatial_conv.mix_head_A.bias"] = t(2 * nd * r)
    sd["spatial_conv.mix_head_B.weight"] = t(c * r, gh, 1, 1)
    sd["spatial_conv.mix_head_B.bias"] = t(c * r)
    sd["spatial_conv.gate_net.0.weight"] = t(gh, c, gk, gk)
    sd["spatial_conv.gate_net.0.bias"] = t(gh)
    sd["spatial_conv.gate_net.2.weight"] = t(c, gh, gk, gk)
    sd["spatial_conv.gate_net.2.bias"] = t(c)

    prev = pin
    for i, ch in enumerate(pch):
        pre = f"phase_tcn.layers.{i}"
        if prev != ch:
            sd[f"{pre}.projection.weight"] = t(ch, prev, 1)
            sd[f"{pre}.projection.bias"] = t(ch)
        sd[f"{pre}.conv.weight"] = t(ch, prev, pk)
        sd[f"{pre}.conv.bias"] = t(ch)
        sd[f"{pre}.norm.weight"] = t(ch)
        sd[f"{pre}.norm.bias"] = t(ch)
        sd[f"{pre}.gate.weight"] = t(ch, ch, 1)
        sd[f"{pre}.gate.bias"] = t(ch)
        prev = ch

    sd["phase_head.weight"] = t(zp, pch[-1], 1, 1)
    sd["phase_head.bias"] = t(zp)
    fh = max(zt, zp) // 2
    for net in ("gamma_network", "beta_network"):
        sd[f"phase_film.{net}.0.weight"] = t(fh, zt, 1, 1)
        sd[f"phase_film.{net}.0.bias"] = t(fh)
        sd[f"phase_film.{net}.2.weight"] = t(zp, fh, 1, 1)
        sd[f"phase_film.{net}.2.bias"] = t(zp)

    if proj:
        ph, po = proj["hidden_dim"], proj["output_dim"]
        sd["type_projection.net.0.weight"] = t(ph, zt)
        sd["type_projection.net.0.bias"] = t(ph)
        sd["type_projection.net.1.weight"] = np.abs(t(ph)) + 0.5
        sd["type_projection.net.1.bias"] = t(ph)
        sd["type_projection.net.1.running_mean"] = t(ph)
        sd["type_projection.net.1.running_var"] = np.abs(t(ph)) + 0.5
        sd["type_projection.net.1.num_batches_tracked"] = np.asarray(7)
        sd["type_projection.net.3.weight"] = t(po, ph)
        sd["type_projection.net.3.bias"] = t(po)
    return sd


MODEL_CFG = {"version": "4", "model": {
    "z_type_dim": 8, "z_phase_dim": 3,
    "type_encoder": {"channels": [16, 8], "kernel_size": 3,
                     "num_groups": 4},
    "spatial_conv": {"gate_hidden": 6, "rank": 2},
    "phase_tcn": {"channels": [12, 12], "dilations": [1, 2]},
    "type_projection": {"enabled": True, "hidden_dim": 10,
                        "output_dim": 6},
}}


class TestFullModelImport:
    def test_import_and_run(self):
        from forest_tpu.models import representation as rmod
        rng = np.random.default_rng(0)
        tin, pin = 5, 4
        sd = make_ref_state_dict(rng, MODEL_CFG, tin, pin)
        params, rep = ti.import_reference_checkpoint(
            sd, MODEL_CFG, tin, pin)
        # accounting: everything either mapped or a known buffer/BN stat
        assert len(rep.mapped) + len(rep.skipped) == len(sd)
        assert not rep.unmapped
        assert rep.defaulted == ["type_projection/norm/bias",
                                 "type_projection/norm/scale"]
        # imported params drive the full model
        model = rmod.from_config(MODEL_CFG, tin, pin)
        z = model.apply({"params": params},
                        jnp.zeros((1, 8, 8, tin), jnp.float32))
        assert z.shape == (1, 8, 8, 8)
        zp = model.apply({"params": params},
                         jnp.zeros((2, 5, pin)), jnp.zeros((2, 8)),
                         method=model.forward_phase_at_locations)
        assert zp.shape == (2, 5, 3)
        g = model.apply({"params": params}, jnp.zeros((2, 8)),
                        method=model.project_type)
        assert g.shape == (2, 6)
        assert np.isfinite(np.asarray(z)).all()

    def test_shape_mismatch_rejected(self):
        rng = np.random.default_rng(0)
        sd = make_ref_state_dict(rng, MODEL_CFG, 5, 4)
        sd["phase_head.weight"] = rng.normal(
            size=(3, 99, 1, 1)).astype(np.float32)
        with pytest.raises(ValueError, match="mismatch|no home"):
            ti.import_reference_checkpoint(sd, MODEL_CFG, 5, 4)

    def test_unknown_key_rejected_strict(self):
        rng = np.random.default_rng(0)
        sd = make_ref_state_dict(rng, MODEL_CFG, 5, 4)
        sd["mystery.weight"] = np.zeros(3, np.float32)
        with pytest.raises(ValueError, match="unmapped"):
            ti.convert_state_dict(sd, strict=True)

    def test_translate_reference_model_config(self):
        ref = {"version": "4", "name": "frl_repr_model_v1",
               "latents": {"z_type_dim": 8, "z_phase_dim": 3},
               "type_encoder": {"channels": [16, 8], "kernel_size": 3,
                                "padding": 1, "dropout": [0.0, 0.0],
                                "num_groups": 4,
                                "input_dropout": {"schedule": "linear"}},
               "spatial_conv": {"num_layers": 2, "kernel_size": 3,
                                "gate_hidden": 6, "rank": 2},
               "phase_tcn": {"channels": [12, 12], "kernel_size": 3,
                             "dilations": [1, 2], "dropout": 0.1,
                             "num_groups": 8},
               "type_projection": {"enabled": True, "hidden_dim": 10,
                                   "output_dim": 6, "l2_normalize": True}}
        got = ti.translate_reference_model_config(ref)
        m = got["model"]
        assert m["z_type_dim"] == 8 and m["z_phase_dim"] == 3
        assert m["type_encoder"]["channels"] == [16, 8]
        assert m["type_encoder"]["dropout_rate"] == [0.0, 0.0]
        assert m["spatial_conv"] == {"gate_hidden": 6, "rank": 2}
        assert m["phase_tcn"]["dropout_rate"] == 0.1
        assert m["type_projection"]["enabled"]
        # already-translated configs pass through
        assert ti.translate_reference_model_config(MODEL_CFG) is MODEL_CFG
        # and the translated config builds the same model as MODEL_CFG
        from forest_tpu.models import representation as rmod
        a = rmod.from_config(got, 5, 4)
        b = rmod.from_config(MODEL_CFG, 5, 4)
        assert (a.z_type_dim, a.type_encoder_channels,
                a.phase_tcn_dilations, a.type_proj_hidden_dim) == \
               (b.z_type_dim, b.type_encoder_channels,
                b.phase_tcn_dilations, b.type_proj_hidden_dim)

    def test_cli_defaults_from_checkpoint(self, tmp_path, capsys):
        """No --model-config / --*-in-channels flags: everything comes
        from the checkpoint's stored reference-schema entries."""
        rng = np.random.default_rng(4)
        tin, pin = 5, 4
        sd = make_ref_state_dict(rng, MODEL_CFG, tin, pin)
        ref_cfg = {"version": "4",
                   "latents": {"z_type_dim": 8, "z_phase_dim": 3},
                   "type_encoder": {"channels": [16, 8], "kernel_size": 3,
                                    "num_groups": 4},
                   "spatial_conv": {"gate_hidden": 6, "rank": 2},
                   "phase_tcn": {"channels": [12, 12], "dilations": [1, 2]},
                   "type_projection": {"enabled": True, "hidden_dim": 10,
                                       "output_dim": 6}}
        ckpt = tmp_path / "encoder_last.pt"
        torch.save({"model_state_dict":
                    {k: torch.from_numpy(np.atleast_1d(v).copy())
                     if v.ndim else torch.tensor(v)
                     for k, v in sd.items()},
                    "model_config": ref_cfg,
                    "type_in_channels": tin,
                    "phase_in_channels": pin}, ckpt)
        out = tmp_path / "imported.msgpack"
        ti.main(["--checkpoint", str(ckpt), "--output", str(out)])
        assert out.exists()
        import json
        meta = json.loads(
            out.with_suffix(out.suffix + ".json").read_text())
        assert meta["type_in_channels"] == tin
        assert meta["model_config"]["model"]["z_type_dim"] == 8

    def test_import_then_finetune_e2e(self, tmp_path):
        """Full migration path: synthesize a reference checkpoint, import
        it, and warm-start the real training loop from it (--init-from).
        With a ~zero lr the params must come through the epoch (nearly)
        untouched, proving the imported weights actually seed the run
        (fresh-init params would differ by O(0.1))."""
        import yaml
        from forest_tpu.data.cube_v2 import (build_synthetic_v2_cube,
                                             synthetic_bindings)
        from forest_tpu.training import train_representation as tr
        from forest_tpu.training.checkpointing import save_state
        from forest_tpu.training.representation.training_config import (
            parse_training_config)

        cfg_model = {"version": "4", "model": {
            "z_type_dim": 8, "z_phase_dim": 3,
            "type_encoder": {"channels": [16, 8], "kernel_size": 3,
                             "num_groups": 4},
            "spatial_conv": {"gate_hidden": 6, "rank": 2},
            "phase_tcn": {"channels": [12, 12], "dilations": [1, 2]}}}
        tin, pin = 4, 3  # synthetic bindings feature channel counts
        rng = np.random.default_rng(7)
        sd = make_ref_state_dict(rng, cfg_model, tin, pin)
        params, _ = ti.import_reference_checkpoint(sd, cfg_model, tin, pin)
        imported = tmp_path / "imported.msgpack"
        save_state(imported, {"params": params}, {})

        root = tmp_path
        build_synthetic_v2_cube(root / "cube.zarr", height=96, width=96,
                                chunk_yx=32)
        bpath = root / "bindings.yaml"
        bpath.write_text(yaml.safe_dump(synthetic_bindings(
            root / "cube.zarr", root / "stats.json")))
        cfg = parse_training_config({
            "run": {"experiment_name": "mig",
                    "run_root": str(root / "runs")},
            "training": {"epoch": {"num_epochs": 1, "mode": "full",
                                   "batch_size": 4}},
            "optimizer": {"lr": 1e-12},
            "scheduler": {"warmup_epochs": 0, "phase_rewarmup": False},
            "spatial_domain": {"patch_size": 32,
                               "split_block_size": [1, 1]},
            "hardware": {"num_workers": 2},
        })
        result = tr.train(cfg, str(bpath), cfg_model, max_batches=2,
                          init_from=str(imported))
        got = result["state"].params
        np.testing.assert_allclose(
            np.asarray(got["phase_head"]["kernel"]),
            params["phase_head"]["kernel"], rtol=0, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(got["encoder"]["conv_0"]["kernel"]),
            params["encoder"]["conv_0"]["kernel"], rtol=0, atol=1e-6)

        # mismatched shapes are rejected with a clear error
        bad = dict(params)
        bad["phase_head"] = {"kernel": np.zeros((99, 3), np.float32),
                             "bias": np.zeros(3, np.float32)}
        bad_p = tmp_path / "bad.msgpack"
        save_state(bad_p, {"params": bad}, {})
        cfg2 = parse_training_config({
            "run": {"experiment_name": "mig2",
                    "run_root": str(root / "runs")},
            "training": {"epoch": {"num_epochs": 1, "mode": "full",
                                   "batch_size": 4}},
            "optimizer": {"lr": 1e-12},
            "scheduler": {"warmup_epochs": 0, "phase_rewarmup": False},
            "spatial_domain": {"patch_size": 32,
                               "split_block_size": [1, 1]},
            "hardware": {"num_workers": 2},
        })
        with pytest.raises(ValueError, match="init-from"):
            tr.train(cfg2, str(bpath), cfg_model, max_batches=1,
                     init_from=str(bad_p))

    def test_cli_roundtrip(self, tmp_path, capsys):
        import yaml
        from forest_tpu.eval import frozen
        rng = np.random.default_rng(0)
        tin, pin = 5, 4
        sd = make_ref_state_dict(rng, MODEL_CFG, tin, pin)
        ckpt = tmp_path / "encoder_last.pt"
        torch.save({"model_state_dict":
                    {k: torch.from_numpy(v.copy()) if v.ndim else
                     torch.tensor(v) for k, v in sd.items()},
                    "optimizer_state_dict": {}}, ckpt)
        mcfg = tmp_path / "model.yaml"
        mcfg.write_text(yaml.safe_dump(MODEL_CFG))
        out = tmp_path / "imported.msgpack"
        ti.main(["--checkpoint", str(ckpt), "--model-config", str(mcfg),
                 "--type-in-channels", str(tin),
                 "--phase-in-channels", str(pin), "--output", str(out)])
        assert "mapped" in capsys.readouterr().err
        model, params = frozen.load_frozen_model(out)
        z = model.apply({"params": params},
                        jnp.zeros((1, 8, 8, tin), jnp.float32))
        assert z.shape == (1, 8, 8, 8)
