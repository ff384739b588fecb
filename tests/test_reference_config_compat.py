"""Migration gate: the reference's REAL production YAMLs parse directly.

The README promises reference users can port their three config files
without edits (bindings / training / model). These tests feed the actual
files shipped in the reference checkout through this repo's parsers and
assert the load-bearing fields land -- the strongest possible check that
the config surface is compatible, using the configs as data (nothing is
copied into this repo). Skipped when the reference checkout is absent.
"""
from pathlib import Path

import pytest

REF = Path("/root/reference/frl/config")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference checkout not present")


@pytest.fixture(autouse=True)
def _env(monkeypatch):
    import jax
    jax.config.update("jax_platforms", "cpu")
    monkeypatch.setenv("ZARR_ROOT", "/tmp/zarr_root_placeholder")


class TestReferenceConfigCompat:
    def test_binding_v1_parses(self):
        from forest_tpu.data.bindings import parse_bindings
        b = parse_bindings(REF / "frl_binding_v1.yaml")
        # the production contract: 300 anchors/patch come from these
        assert "type_encoder_input" in b.features
        assert "phase_ccdc" in b.features
        assert "soft_neighborhood_phase" in b.losses  # reference naming
        assert "infonce_type_spatial" in b.losses
        assert len(b.dataset) >= 4
        samp = b.get_sampling_strategy("grid-plus-supplement")
        assert samp is not None

    def test_training_v1_parses_and_builds(self):
        from forest_tpu.data.bindings import parse_bindings
        from forest_tpu.training.representation import (
            config_builders as cb)
        from forest_tpu.training.representation.training_config import (
            parse_training_config)
        b = parse_bindings(REF / "frl_binding_v1.yaml")
        t = parse_training_config(REF / "frl_training_v1.yaml")
        assert t.epoch.batch_size == 12          # frl_training_v1.yaml:39
        assert t.spatial_domain.patch_size == 256
        # hardware.mixed_precision (frl_training_v1.yaml:32-34) -> the
        # spatial-conv compute-dtype default (TPU-native AMP equivalent)
        assert t.hardware.mixed_precision_dtype == "bfloat16"
        from forest_tpu.training.train_representation import (
            apply_mixed_precision)
        mc = apply_mixed_precision({"model": {"spatial_conv":
                                              {"rank": 4}}}, "bfloat16")
        assert mc["model"]["spatial_conv"]["compute_dtype"] == "bfloat16"
        assert mc["model"]["spatial_conv"]["rank"] == 4
        # an explicit model-config compute_dtype always wins
        mc = apply_mixed_precision(
            {"model": {"spatial_conv": {"compute_dtype": "float32"}}},
            "bfloat16")
        assert mc["model"]["spatial_conv"]["compute_dtype"] == "float32"
        assert apply_mixed_precision(None, None) == {}
        d = t.as_builder_dict()
        sc = cb.build_step_config(b, d)
        # model.type_encoder_feature / phase_encoder_feature flow through
        assert sc.type_feature == "type_encoder_input"
        assert sc.phase_feature == "phase_ccdc"
        # nested reference strategy blocks land on the flattened keys
        # (frl_binding_v1.yaml values, all distinct from the defaults)
        assert sc.neg_min_distance == 96.0
        assert sc.neg_max_distance == 192.0
        assert sc.neg_per_anchor == 16
        assert sc.spectral_sigma == 5
        assert sc.min_pair_weight == 0.03
        assert sc.temperature == 0.5
        assert sc.phase_k == 16 and sc.phase_min_overlap == 3
        assert sc.phase_sigma == 5.0
        assert sc.xb_phase_pca_dim == 8 and sc.xb_phase_knn_k == 20
        assert sc.xb_knn_k == 16 and sc.xb_temperature == 0.5
        assert sc.xb_neg_tau == 1.0 and sc.xb_neg_min_weight == 0.05
        # EVT block ships with weight 0.0 ("disabled") -> NOT enabled
        assert not sc.evt_enabled
        # per-loss bindings weights reach the weights dict
        w = cb.build_loss_weights(d, b)
        assert w["spatial_infonce"] == 0.5
        assert w["phase_neighborhood"] == 1.0
        assert w["vicreg_type"] == 0.1
        assert w["evt"] == 0.0          # disabled in the reference config
        assert w["type_leakage"] == 0.01
        # per-loss curriculum blocks drive the phase gate
        cur = cb.build_curricula(d, b)
        assert cur["phase_start_epoch"] == 50
        assert cur["phase_ramp_epochs"] == 10
        # top-level spatial_smoothing_curriculum folds into curriculum
        assert cur["smoothing_freeze_until"] == 20
        assert cur["smoothing_ramp_epochs"] == 30

    def test_model_v1_translates_and_builds(self):
        import yaml
        from forest_tpu.models import representation as rep
        from forest_tpu.utils.torch_import import (
            translate_reference_model_config)
        mc = yaml.safe_load((REF / "frl_repr_model_v1.yaml").read_text())
        m = rep.from_config(translate_reference_model_config(mc), 64, 11)
        assert (m.z_type_dim, m.z_phase_dim) == (48, 8)
        assert m.type_encoder_channels == (128, 48)
        assert m.phase_tcn_channels == (64, 64, 64)
        assert m.type_proj_hidden_dim is None  # enabled: false in the ref
