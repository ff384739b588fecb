"""Direct-import lockstep parity, part 2: the remaining loss surface.

Extends tests/test_reference_oracle.py (same technique: import the actual
reference torch code from /root/reference/frl, feed identical numpy inputs)
to the element-wise losses and the remaining pair/triplet machinery:

- ``losses/reconstruction.py:28``  l1 / l2 / huber / smooth_l1, masked
- ``losses/categorical.py:29``     CE with mask / class weights / smoothing
- ``losses/count.py:27``           Poisson NLL (full) + negative binomial
- ``losses/triplet_phase.py:239``  phase_triplet_loss + stats
- ``losses/triplet_phase.py:352``  phase_recovery_discrimination_loss
- ``losses/phase_neighborhood.py:637``  compute_phase_spread_ranking
- ``losses/pairs.py:128/220/291/368``  kNN / mutual-kNN / quantile / radius

Skipped when the reference checkout is absent.
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
    import importlib

    sys.path.insert(0, str(REF))
    try:
        return {
            "reconstruction": importlib.import_module(
                "losses.reconstruction"),
            "categorical": importlib.import_module("losses.categorical"),
            "count": importlib.import_module("losses.count"),
            "triplet": importlib.import_module("losses.triplet_phase"),
            "phase_nb": importlib.import_module("losses.phase_neighborhood"),
            "pairs": importlib.import_module("losses.pairs"),
            "evt": importlib.import_module("losses.evt_soft_neighborhood"),
        }
    finally:
        sys.path.remove(str(REF))


REFMOD = _import_reference()


@pytest.fixture(autouse=True)
def _cpu():
    jax.config.update("jax_platforms", "cpu")


def _t(x):
    return torch.from_numpy(np.asarray(x))


class TestReconstructionLockstep:
    @pytest.mark.parametrize("loss_type,delta", [("l1", 1.0), ("l2", 1.0),
                                                 ("huber", 0.7),
                                                 ("smooth_l1", 1.0)])
    def test_masked(self, loss_type, delta):
        from forest_tpu.losses.reconstruction import reconstruction_loss
        rng = np.random.default_rng(0)
        pred = rng.normal(size=(4, 8, 8)).astype(np.float32) * 2.0
        tgt = rng.normal(size=(4, 8, 8)).astype(np.float32)
        mask = rng.random((4, 8, 8)) > 0.3
        ref = REFMOD["reconstruction"].reconstruction_loss(
            _t(pred), _t(tgt), _t(mask), loss_type=loss_type, delta=delta)
        ours = reconstruction_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                   jnp.asarray(mask), kind=loss_type,
                                   delta=delta)
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_unmasked(self):
        from forest_tpu.losses.reconstruction import reconstruction_loss
        rng = np.random.default_rng(1)
        pred = rng.normal(size=(32,)).astype(np.float32)
        tgt = rng.normal(size=(32,)).astype(np.float32)
        ref = REFMOD["reconstruction"].reconstruction_loss(_t(pred), _t(tgt))
        ours = reconstruction_loss(jnp.asarray(pred), jnp.asarray(tgt))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


class TestCategoricalLockstep:
    def _problem(self, rng, b=3, c=6, h=5, w=5):
        logits = rng.normal(size=(b, c, h, w)).astype(np.float32)
        target = rng.integers(0, c, size=(b, h, w))
        mask = rng.random((b, h, w)) > 0.25
        return logits, target, mask

    def test_masked_mean(self):
        from forest_tpu.losses.categorical import (IGNORE_INDEX,
                                                   categorical_loss)
        rng = np.random.default_rng(2)
        logits, target, mask = self._problem(rng)
        ref = REFMOD["categorical"].categorical_loss(
            _t(logits), _t(target), _t(mask))
        tgt_m = np.where(mask, target, IGNORE_INDEX)
        ours = categorical_loss(
            jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(tgt_m))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_class_weights_and_smoothing(self):
        from forest_tpu.losses.categorical import categorical_loss
        rng = np.random.default_rng(3)
        logits, target, _ = self._problem(rng)
        cw = rng.uniform(0.5, 2.0, size=6).astype(np.float32)
        ref = REFMOD["categorical"].categorical_loss(
            _t(logits), _t(target), class_weights=_t(cw))
        ours = categorical_loss(jnp.asarray(logits.transpose(0, 2, 3, 1)),
                                jnp.asarray(target),
                                class_weights=jnp.asarray(cw))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

        ref_s = REFMOD["categorical"].categorical_loss(
            _t(logits), _t(target), label_smoothing=0.1)
        ours_s = categorical_loss(jnp.asarray(logits.transpose(0, 2, 3, 1)),
                                  jnp.asarray(target), label_smoothing=0.1)
        np.testing.assert_allclose(float(ours_s), float(ref_s), rtol=1e-5)

    def test_weight_sum_mode_matches_torch_f_cross_entropy(self):
        """normalization='weight_sum' is the legacy VQ-VAE contract
        (/root/reference/scripts/train_vqvae.py:308-314): torch's
        F.cross_entropy(weight=..., reduction='mean') divide-by-weight-sum,
        including zero-weight classes neither counting nor diluting."""
        import torch.nn.functional as F

        from forest_tpu.losses.categorical import (IGNORE_INDEX,
                                                   categorical_loss)
        rng = np.random.default_rng(4)
        logits, target, _ = self._problem(rng)
        cw = rng.uniform(0.5, 2.0, size=6).astype(np.float32)
        cw[2] = 0.0  # a MISS-style zero-weight class
        target[0, 0, :] = IGNORE_INDEX
        ref = F.cross_entropy(
            _t(logits), _t(target), weight=_t(cw),
            ignore_index=IGNORE_INDEX, reduction="mean")
        ours = categorical_loss(
            jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(target),
            class_weights=jnp.asarray(cw), normalization="weight_sum")
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
        # and the two modes genuinely differ under non-uniform weights
        ours_count = categorical_loss(
            jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(target),
            class_weights=jnp.asarray(cw))
        assert abs(float(ours_count) - float(ref)) > 1e-4


class TestCountLockstep:
    def test_poisson_full(self):
        """Ours always includes the log(y!) term = the reference's
        full=True Poisson NLL."""
        from forest_tpu.losses.count import count_loss
        rng = np.random.default_rng(4)
        log_rate = rng.normal(size=(64,)).astype(np.float32)
        target = rng.poisson(2.0, size=64).astype(np.float32)
        mask = rng.random(64) > 0.2
        ref = REFMOD["count"].count_loss(
            _t(np.exp(log_rate)), _t(target), _t(mask),
            loss_type="poisson", full=True)
        ours = count_loss(jnp.asarray(log_rate), jnp.asarray(target),
                          jnp.asarray(mask), kind="poisson")
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)

    def test_negative_binomial(self):
        """Parameterization map: the reference's ``dispersion`` is the NB
        size r (variance = mu + mu^2/r); ours is alpha = 1/r."""
        from forest_tpu.losses.count import count_loss
        rng = np.random.default_rng(5)
        log_rate = rng.normal(size=(64,)).astype(np.float32)
        target = rng.poisson(2.0, size=64).astype(np.float32)
        r = 2.5
        ref = REFMOD["count"].count_loss(
            _t(np.exp(log_rate)), _t(target),
            loss_type="negative_binomial", dispersion=r)
        ours = count_loss(jnp.asarray(log_rate), jnp.asarray(target),
                          kind="negbinomial", dispersion=1.0 / r)
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def _recovery_ysfc(rng, n, t, p_disturb=0.3, max_cls=20):
    y = np.zeros((n, t), np.int64)
    y[:, 0] = rng.integers(0, 6, size=n)
    for k in range(1, t):
        reset = rng.uniform(size=n) < p_disturb
        y[:, k] = np.where(reset, 0, np.minimum(y[:, k - 1] + 1, max_cls - 1))
    return y


class TestTripletLockstep:
    def test_phase_triplet_loss(self):
        from forest_tpu.losses.triplet_phase import phase_triplet_loss
        rng = np.random.default_rng(6)
        n, t, d = 40, 10, 5
        ysfc = _recovery_ysfc(rng, n, t)
        e0, e1, e2 = (rng.normal(size=(n, d)).astype(np.float32)
                      for _ in range(3))
        t0, t1, t2 = 1, 4, 8
        ref_loss, ref_stats = REFMOD["triplet"].phase_triplet_loss(
            _t(e0), _t(e1), _t(e2), _t(ysfc.astype(np.float32)),
            t0, t1, t2, large_margin=1.0, small_margin=0.3)
        ours, stats = phase_triplet_loss(
            jnp.asarray(e0), jnp.asarray(e1), jnp.asarray(e2),
            jnp.asarray(ysfc, jnp.float32), t0, t1, t2)
        assert int(stats["n_constraints"]) == int(ref_stats["n_constraints"])
        assert int(stats["n_large"]) == int(ref_stats["n_large"])
        assert int(stats["n_small"]) == int(ref_stats["n_small"])
        np.testing.assert_allclose(float(stats["frac_satisfied"]),
                                   float(ref_stats["frac_satisfied"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(ours), float(ref_loss), rtol=1e-4)

    def test_recovery_discrimination(self):
        from forest_tpu.losses.triplet_phase import (
            phase_recovery_discrimination_loss)
        rng = np.random.default_rng(7)
        n, t, d = 24, 9, 4
        ysfc = _recovery_ysfc(rng, n, t)
        z = rng.normal(size=(n, t, d)).astype(np.float32)
        ref_loss, ref_stats = \
            REFMOD["triplet"].phase_recovery_discrimination_loss(
                _t(z), _t(ysfc.astype(np.float32)), margin=0.5)
        ours, stats = phase_recovery_discrimination_loss(
            jnp.asarray(z), jnp.asarray(ysfc, jnp.float32), margin=0.5)
        assert int(stats["n_pairs"]) == int(ref_stats["n_pairs"])
        np.testing.assert_allclose(float(ours), float(ref_loss), rtol=1e-4)


class TestSpreadRankingLockstep:
    def test_spread_ranking(self):
        from forest_tpu.losses.phase_neighborhood import (
            build_phase_neighborhood_batch, compute_phase_spread_ranking)
        rng = np.random.default_rng(8)
        n, t, c, d = 14, 8, 4, 3
        spec = rng.normal(size=(n, t, c)).astype(np.float32)
        phase = rng.normal(size=(n, t, d)).astype(np.float32)
        ysfc = _recovery_ysfc(rng, n, t)
        pairs = rng.integers(0, n, size=(12, 2)).astype(np.int64)
        dyn = rng.uniform(0.0, 3.0, size=n).astype(np.float32)

        ref_batch = REFMOD["phase_nb"].build_phase_neighborhood_batch(
            _t(spec), _t(phase), _t(ysfc.astype(np.float32)), _t(pairs),
            min_overlap=3)
        vm = ref_batch["valid_pair_mask"].numpy()
        assert vm.any(), "test fixture produced no valid pairs"
        ref_loss, ref_stats = REFMOD["phase_nb"].compute_phase_spread_ranking(
            ref_batch, _t(pairs[vm, 0]), _t(pairs[vm, 1]), _t(dyn),
            margin=0.1, delta=0.3)

        batch = build_phase_neighborhood_batch(
            jnp.asarray(spec), jnp.asarray(phase),
            jnp.asarray(ysfc, jnp.float32), jnp.asarray(pairs, jnp.int32),
            min_overlap=3, num_classes=32)
        ours, stats = compute_phase_spread_ranking(
            batch, jnp.asarray(pairs, jnp.int32), jnp.asarray(dyn),
            margin=0.1, delta=0.3)
        assert int(stats["n_pairs"]) == int(vm.sum())
        assert (int(stats["n_constrained_i"])
                == int(ref_stats["n_constrained_i"]))
        assert (int(stats["n_constrained_j"])
                == int(ref_stats["n_constrained_j"]))
        np.testing.assert_allclose(float(ours), float(ref_loss),
                                   rtol=2e-4, atol=1e-6)


class TestPairsLockstep:
    def _dist(self, rng, n=20):
        x = rng.normal(size=(n, 4))
        d = np.sqrt(((x[:, None] - x[None, :]) ** 2).sum(-1))
        return d.astype(np.float32)

    def _our_set(self, pairs, valid):
        return {(int(i), int(j)) for (i, j), v
                in zip(np.asarray(pairs), np.asarray(valid)) if v}

    def test_pairs_knn(self):
        from forest_tpu.losses.pairs import pairs_knn
        rng = np.random.default_rng(9)
        d = self._dist(rng)
        vm = (rng.random(20) > 0.15).astype(np.float32)
        ref = REFMOD["pairs"].pairs_knn(_t(d), k=4, valid_mask=_t(vm))
        pairs, valid = pairs_knn(jnp.asarray(d), 4,
                                 valid_mask=jnp.asarray(vm))
        want = {(int(i), int(j)) for i, j in ref.numpy()}
        assert self._our_set(pairs, valid) == want

    def test_pairs_mutual_knn(self):
        from forest_tpu.losses.pairs import pairs_mutual_knn
        rng = np.random.default_rng(10)
        d = self._dist(rng)
        ref = REFMOD["pairs"].pairs_mutual_knn(_t(d), k=5)
        pairs, valid = pairs_mutual_knn(jnp.asarray(d), 5)
        want = {frozenset((int(i), int(j))) for i, j in ref.numpy()}
        got = {frozenset(p) for p in self._our_set(pairs, valid)}
        assert got == want

    def test_pairs_quantile_and_radius(self):
        from forest_tpu.losses.pairs import pairs_quantile, pairs_radius
        rng = np.random.default_rng(11)
        d = self._dist(rng)
        ref_q = REFMOD["pairs"].pairs_quantile(_t(d), low=0.05, high=0.2)
        adj = np.asarray(pairs_quantile(jnp.asarray(d), 0.2, low=0.05))
        want_q = {(int(i), int(j)) for i, j in ref_q.numpy()}
        got_q = {(i, j) for i, j in zip(*np.nonzero(adj))}
        assert got_q == want_q

        ref_r = REFMOD["pairs"].pairs_radius(_t(d), min_dist=0.2,
                                             max_dist=1.0)
        adj_r = np.asarray(pairs_radius(jnp.asarray(d), 1.0, min_dist=0.2))
        want_r = {(int(i), int(j)) for i, j in ref_r.numpy()}
        got_r = {(i, j) for i, j in zip(*np.nonzero(adj_r))}
        assert got_r == want_r

    def test_pairs_with_spatial_constraint(self):
        """Constraint-BEFORE-selection order (pairs.py:458-528): kNN falls
        through past spatially-excluded neighbors; negative quantiles are
        computed over the post-constraint distribution."""
        from forest_tpu.losses.pairs import pairs_with_spatial_constraint
        rng = np.random.default_rng(12)
        n = 24
        feat = self._dist(rng, n=n)
        coords = rng.integers(0, 40, size=(n, 2)).astype(np.float64)
        spat = np.sqrt(((coords[:, None] - coords[None, :]) ** 2
                        ).sum(-1)).astype(np.float32)
        ref_pos, ref_neg = REFMOD["pairs"].pairs_with_spatial_constraint(
            _t(feat), _t(spat), positive_strategy="knn", positive_k=4,
            positive_min_spatial=5.0, negative_quantile_low=0.5,
            negative_quantile_high=0.75, negative_min_spatial=9.0)

        pos, pos_v = pairs_with_spatial_constraint(
            jnp.asarray(feat), jnp.asarray(coords), strategy="knn", k=4,
            min_spatial=5.0)
        assert (self._our_set(pos, pos_v)
                == {(int(i), int(j)) for i, j in ref_pos.numpy()})

        neg, neg_v = pairs_with_spatial_constraint(
            jnp.asarray(feat), jnp.asarray(coords), strategy="quantile",
            q=0.75, q_low=0.5, k=n, min_spatial=9.0)
        assert (self._our_set(neg, neg_v)
                == {(int(i), int(j)) for i, j in ref_neg.numpy()})


class TestEvtLockstep:
    """EVT diffusion metric + soft-neighborhood loss vs the reference
    (losses/evt_soft_neighborhood.py:46-420), from a fabricated confusion
    CSV through count/row-sum filtering, diffusion, inverse-frequency
    weights, and the full weighted KL loss (same-code exclusion)."""

    def _fixture(self, tmp_path, rng):
        codes = [7001, 7002, 7003, 7004, 7005]
        m = rng.integers(10, 200, (5, 5)).astype(float)
        m += np.diag(rng.integers(300, 600, size=5).astype(float))
        m[4, :] = 2.0  # sparse row -> dropped by min_confusion_samples
        m[:, 4] = 2.0
        lines = ["," + ",".join(str(c) for c in codes)]
        for c, row in zip(codes, m):
            lines.append(f"{c}," + ",".join(str(v) for v in row))
        p = tmp_path / "conf.csv"
        p.write_text("\n".join(lines) + "\n")
        # 7004 dropped by min_count
        counts = {7001: 5000, 7002: 800, 7003: 12000, 7004: 50, 7005: 3000}
        return p, counts

    def test_metric_and_full_loss(self, tmp_path):
        from forest_tpu.losses.evt_soft_neighborhood import (
            EvtDiffusionMetric, evt_soft_neighborhood_loss)
        rng = np.random.default_rng(13)
        csv_p, counts = self._fixture(tmp_path, rng)
        kw = dict(min_count=100, min_confusion_samples=30,
                  diffusion_steps=2, max_weight=10.0)
        ref_metric = REFMOD["evt"].EvtDiffusionMetric(csv_p, counts, **kw)
        ours = EvtDiffusionMetric(csv_p, counts, **kw)
        assert ours.n_codes == ref_metric.n_codes == 3  # 7004+7005 dropped
        assert set(int(c) for c in ours.codes) == ref_metric.valid_codes

        # anchors: known codes + one dropped + one unknown
        anchors = np.asarray([7001, 7002, 7003, 7001, 7002, 7003,
                              7001, 7004, 9999, 7003], np.int64)
        d_ref_t, valid_t = ref_metric.reference_distances(_t(anchors))
        w_t = ref_metric.anchor_weights(_t(anchors))
        idx, valid, w = ours.lookup(anchors)
        np.testing.assert_array_equal(valid, valid_t.numpy())
        np.testing.assert_allclose(w, w_t.numpy(), rtol=1e-6)
        # our d_ref construction (1 - onehot-selected similarity) must
        # match the reference's gathered distances on valid pairs
        sim = ours.similarity[np.ix_(idx, idx)]
        vv = valid[:, None] & valid[None, :]
        np.testing.assert_allclose(np.where(vv, 1.0 - sim, 1.0),
                                   d_ref_t.numpy(), rtol=1e-6, atol=1e-6)

        emb = rng.normal(size=(len(anchors), 6)).astype(np.float32)
        ref_loss, ref_stats = REFMOD["evt"].evt_soft_neighborhood_loss(
            _t(emb), _t(anchors), ref_metric, tau_ref=0.5, tau_learned=0.5)
        loss, stats = evt_soft_neighborhood_loss(
            jnp.asarray(emb), jnp.asarray(idx), jnp.asarray(valid),
            jnp.asarray(w), jnp.asarray(ours.similarity),
            jnp.asarray(anchors), tau_ref=0.5, tau_learned=0.5)
        assert int(stats["n_anchors_valid"]) == int(
            ref_stats["n_anchors_valid"])
        assert int(stats["n_rows_active"]) == int(ref_stats["n_rows_active"])
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
        np.testing.assert_allclose(float(stats["mean_entropy_ref"]),
                                   float(ref_stats["mean_entropy_ref"]),
                                   rtol=1e-4)
