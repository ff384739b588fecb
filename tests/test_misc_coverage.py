"""Coverage for smaller surfaces: TrainingBundle, map_to_pixel,
builder CLI validate-only, load_state roundtrip, transforms inverses."""
import numpy as np
import pytest

from forest_tpu.data import transforms
from forest_tpu.eval.embed_locations import map_to_pixel


class TestTrainingBundle:
    def test_build_from_dataset(self, tmp_path, rng):
        import jax

        jax.config.update("jax_platforms", "cpu")
        from forest_tpu.data.bindings import parse_bindings
        from forest_tpu.data.cube_v2 import (build_synthetic_v2_cube,
                                             synthetic_bindings)
        from forest_tpu.data.data_bundle import build_training_bundle
        from forest_tpu.data.feature_builder import FeatureBuilder
        from forest_tpu.data.frl_dataset import ForestDatasetV2
        from forest_tpu.data.stats import StatsCalculator

        build_synthetic_v2_cube(tmp_path / "c.zarr", height=64, width=64,
                                chunk_yx=32)
        b = parse_bindings(synthetic_bindings(tmp_path / "c.zarr",
                                              tmp_path / "s.json"))
        ds = ForestDatasetV2(b, split=None, patch_size=32,
                             split_block_size=(1, 1))
        stats = StatsCalculator(b, ds).compute(3)
        fb = FeatureBuilder(b, stats)
        bundle = build_training_bundle(ds, fb, "type_encoder_input",
                                       [0, 1])
        assert bundle.num_windows == 2
        assert bundle.data.shape == (2, 32, 32, 4)
        assert bundle.mask.shape == bundle.data.shape
        assert not bundle.temporal
        meta = bundle.window_meta()
        assert meta[0]["height"] == 32
        tb = build_training_bundle(ds, fb, "phase_ccdc", [0])
        assert tb.temporal and tb.data.shape == (1, 15, 32, 32, 3)


class TestMapToPixel:
    def test_affine(self):
        # geo_transform [x0, dx, y0, dy]: map = origin + pixel * step
        gt = [1000.0, 30.0, 5000.0, -30.0]
        rc = map_to_pixel([1030.0, 1000.0], [4970.0, 5000.0], gt)
        np.testing.assert_array_equal(rc, [[1, 1], [0, 0]])


class TestBuilderValidateCLI:
    def test_validate_only(self, tmp_path, capsys):
        import yaml

        from forest_tpu.data import zarr_builder

        spec = {"output": "c.zarr",
                "spatial": {"height": 8, "width": 8},
                "groups": []}
        p = tmp_path / "s.yaml"
        p.write_text(yaml.safe_dump(spec))
        zarr_builder.main(["--config", str(p), "--validate-only"])
        assert "spec OK" in capsys.readouterr().out
        bad = dict(spec)
        bad.pop("spatial")
        p.write_text(yaml.safe_dump(bad))
        with pytest.raises(SystemExit):
            zarr_builder.main(["--config", str(p), "--validate-only"])


class TestCheckpointRoundtrip:
    def test_save_load_state(self, tmp_path):
        import jax.numpy as jnp

        from forest_tpu.training.checkpointing import (load_state,
                                                       save_state)

        state = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
        save_state(tmp_path / "s.msgpack", state,
                   {"epoch": 3, "arr": np.arange(2)})
        restored, meta = load_state(tmp_path / "s.msgpack",
                                    {"w": jnp.zeros((2, 3)),
                                     "b": jnp.zeros(3)})
        np.testing.assert_array_equal(np.asarray(restored["w"]),
                                      np.arange(6).reshape(2, 3))
        assert meta["epoch"] == 3
        assert meta["arr"] == [0, 1]  # jsonable conversion


class TestTransforms:
    @pytest.mark.parametrize("name,x", [("log", 2.5), ("log1p", 0.7),
                                        ("sqrt", 4.0), ("neg", -3.0),
                                        ("log10", 3.0), ("cbrt", -8.0)])
    def test_inverse_roundtrip(self, name, x):
        t = transforms.get_transform(name)
        assert t.inverse(t.forward(x)) == pytest.approx(x)

    def test_parameterized_log_matches_reference(self):
        """Reference transforms.py:90-205: log = log(x + epsilon),
        default epsilon 1.0; dict specs carry an explicit epsilon."""
        x = np.asarray([0.0, 2.0])
        out = transforms.apply_transform("log", x)
        np.testing.assert_allclose(out, np.log(x + 1.0))
        out = transforms.apply_transform({"name": "log", "epsilon": 0.001},
                                         x)
        np.testing.assert_allclose(out, np.log(x + 0.001))
        t = transforms.get_transform({"name": "log", "epsilon": 0.5})
        assert t.inverse(t.forward(3.0)) == pytest.approx(3.0)

    def test_out_of_domain_nan(self):
        out = transforms.apply_transform("log", np.asarray([-1.0, 1.0]))
        assert np.isnan(out[0]) and out[1] == pytest.approx(np.log(2.0))

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            transforms.get_transform("bogus")


class TestConfigBuilderAliases:
    def test_reference_model_input_key_names(self):
        """Reference training YAMLs use model.type_encoder_feature /
        model.phase_encoder_feature (frl_training_v1.yaml); the builder
        accepts them alongside this repo's model_input.type_feature."""
        from forest_tpu.data.bindings import BindingsConfig
        from forest_tpu.training.representation import config_builders as cb
        b = BindingsConfig()
        cfg = cb.build_step_config(
            b, {"model": {"type_encoder_feature": "my_type_feat",
                          "phase_encoder_feature": "my_phase_feat"}})
        assert cfg.type_feature == "my_type_feat"
        assert cfg.phase_feature == "my_phase_feat"
        # repo-native names win when both present -- PER KEY: a
        # model_input section must not hide the model section's other keys
        cfg2 = cb.build_step_config(
            b, {"model_input": {"type_feature": "native"},
                "model": {"phase_encoder_feature": "ref_phase"}})
        assert cfg2.type_feature == "native"
        assert cfg2.phase_feature == "ref_phase"
        # bindings losses feature still overrides the model alias
        b2 = BindingsConfig(losses={"phase_neighborhood":
                                    {"feature": "from_losses"}})
        cfg3 = cb.build_step_config(
            b2, {"model": {"phase_encoder_feature": "my_phase_feat"}})
        assert cfg3.phase_feature == "from_losses"

    def test_aliases_reach_the_cli_path(self):
        """Regression: parse_training_config used to DROP the model /
        model_input sections, so the aliases never reached
        build_step_config through the real training entry point."""
        from forest_tpu.data.bindings import BindingsConfig
        from forest_tpu.training.representation import config_builders as cb
        from forest_tpu.training.representation.training_config import (
            parse_training_config)
        cfg = parse_training_config({
            "model": {"type_encoder_feature": "ref_type",
                      "phase_encoder_feature": "ref_phase"},
            "model_input": {"type_feature": "native_type"},
        })
        step = cb.build_step_config(BindingsConfig(),
                                    cfg.as_builder_dict())
        assert step.type_feature == "native_type"   # repo key wins per-key
        assert step.phase_feature == "ref_phase"    # ref key falls through
