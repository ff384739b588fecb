"""Loss-family tests: analytic edge cases + invariants + gradient flow
(the reference's test strategy, SURVEY.md §5, ported to the mask-based JAX
formulations)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forest_tpu.losses import (contrastive, evt_soft_neighborhood, pairs,
                               phase_neighborhood, phase_pairs,
                               soft_neighborhood, triplet_phase,
                               variance_covariance)


class TestSoftNeighborhood:
    def _mats(self, rng, b=2, m=6):
        d = jnp.asarray(np.abs(rng.normal(size=(b, m, m))), jnp.float32)
        d = d + jnp.transpose(d, (0, 2, 1))
        mask = ~jnp.eye(m, dtype=bool)[None].repeat(b, 0)
        return d, mask

    def test_identity_is_zero(self, rng):
        d, mask = self._mats(rng)
        loss, stats = soft_neighborhood.soft_neighborhood_matching_loss(
            d, d, mask)
        assert float(loss) == pytest.approx(0.0, abs=1e-6)
        assert int(stats["n_rows_valid"]) == 12

    def test_mismatch_positive(self, rng):
        d, mask = self._mats(rng)
        d2 = jnp.asarray(np.abs(rng.normal(size=d.shape)), jnp.float32)
        loss, _ = soft_neighborhood.soft_neighborhood_matching_loss(
            d, d2, mask)
        assert float(loss) > 0

    def test_fully_masked_rows_safe(self, rng):
        d, mask = self._mats(rng, b=1, m=4)
        mask = jnp.zeros_like(mask)
        loss, stats = soft_neighborhood.soft_neighborhood_matching_loss(
            d, d * 2, mask)
        assert float(loss) == 0.0
        assert int(stats["n_rows_valid"]) == 0

    def test_min_valid_per_row_skips(self, rng):
        d, mask = self._mats(rng, b=1, m=4)
        # leave only 1 valid entry in row 0 -> row skipped
        mask = mask.at[0, 0, :].set(False).at[0, 0, 1].set(True)
        _, stats = soft_neighborhood.soft_neighborhood_matching_loss(
            d, d, mask, min_valid_per_row=2)
        assert int(stats["n_rows_valid"]) == 3

    def test_pair_weights(self, rng):
        d, mask = self._mats(rng, b=2)
        d_bad = d.at[1].set(d[1] * 3 + 1)
        w0 = jnp.asarray([1.0, 0.0])
        loss0, _ = soft_neighborhood.soft_neighborhood_matching_loss(
            d, d_bad, mask, pair_weights=w0)
        # pair 0 is identity -> zero; pair 1 weighted out -> total 0
        assert float(loss0) == pytest.approx(0.0, abs=1e-6)
        w1 = jnp.asarray([0.0, 1.0])
        loss1, _ = soft_neighborhood.soft_neighborhood_matching_loss(
            d, d_bad, mask, pair_weights=w1)
        assert float(loss1) > 0

    def test_gradient_flows(self, rng):
        d, mask = self._mats(rng)
        d2 = d * 1.5

        def f(dl):
            return soft_neighborhood.soft_neighborhood_matching_loss(
                d, dl, mask)[0]

        g = jax.grad(f)(d2)
        assert float(jnp.abs(g).sum()) > 0

    def test_temperature_sharpens(self, rng):
        d, mask = self._mats(rng)
        d2 = jnp.asarray(np.abs(rng.normal(size=d.shape)), jnp.float32)
        _, s_sharp = soft_neighborhood.soft_neighborhood_matching_loss(
            d, d2, mask, tau_ref=0.1)
        _, s_flat = soft_neighborhood.soft_neighborhood_matching_loss(
            d, d2, mask, tau_ref=10.0)
        assert float(s_sharp["mean_entropy_p"]) < float(
            s_flat["mean_entropy_p"])

    def test_invalid_min_valid_raises(self, rng):
        d, mask = self._mats(rng)
        with pytest.raises(ValueError):
            soft_neighborhood.soft_neighborhood_matching_loss(
                d, d, mask, min_valid_per_row=1)


class TestContrastive:
    def test_perfect_separation_low_loss(self):
        za = jnp.zeros((4, 8))
        pos = jnp.zeros((2, 8)) + 0.01
        neg = jnp.ones((2, 8)) * 10
        z_other = jnp.concatenate([pos, neg])
        aid = jnp.asarray([0, 0, 0, 0])
        is_pos = jnp.asarray([True, True, False, False])
        loss, aux = contrastive.contrastive_loss(za, z_other, aid, is_pos, 1)
        assert float(loss) < 0.1
        assert int(aux["n_anchors_used"]) == 1

    def test_anchor_without_positive_excluded(self):
        za = jnp.zeros((2, 4))
        zo = jnp.ones((2, 4))
        aid = jnp.asarray([0, 1])
        is_pos = jnp.asarray([False, False])
        loss, aux = contrastive.contrastive_loss(za, zo, aid, is_pos, 2)
        assert float(loss) == 0.0
        assert int(aux["n_anchors_used"]) == 0

    def test_pair_valid_mask(self, rng):
        za = jnp.asarray(rng.normal(size=(6, 4)), jnp.float32)
        zo = jnp.asarray(rng.normal(size=(6, 4)), jnp.float32)
        aid = jnp.asarray([0, 0, 0, 1, 1, 1])
        is_pos = jnp.asarray([True, False, False, True, False, False])
        all_valid = jnp.ones(6, bool)
        only0 = jnp.asarray([True, True, True, False, False, False])
        l_all, _ = contrastive.contrastive_loss(za, zo, aid, is_pos, 2,
                                                pair_valid=all_valid)
        l_0, aux0 = contrastive.contrastive_loss(za, zo, aid, is_pos, 2,
                                                 pair_valid=only0)
        assert int(aux0["n_anchors_used"]) == 1
        assert np.isfinite(float(l_all)) and np.isfinite(float(l_0))

    def test_similarities(self, rng):
        za = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
        zo = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
        for kind in ["l2", "cosine", "dot"]:
            s = contrastive.pair_similarity(za, zo, kind)
            assert s.shape == (4,)
        with pytest.raises(ValueError):
            contrastive.pair_similarity(za, zo, "bogus")

    def test_gradient_flows(self, rng):
        za = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
        zo = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
        aid = jnp.asarray([0, 0, 1, 1])
        is_pos = jnp.asarray([True, False, True, False])

        def f(z):
            return contrastive.contrastive_loss(z, zo, aid, is_pos, 2)[0]

        g = jax.grad(f)(za)
        assert float(jnp.abs(g).sum()) > 0


class TestVICReg:
    def test_std_at_target_zero_var_term(self, rng):
        z = jnp.asarray(rng.normal(size=(2000, 8)) * 1.5, jnp.float32)
        _, var_t, _ = variance_covariance.variance_covariance_loss(
            z, std_target=1.0)
        assert float(var_t) == pytest.approx(0.0, abs=1e-4)

    def test_collapsed_dims_penalized(self):
        z = jnp.zeros((100, 8))
        total, var_t, cov_t = variance_covariance.variance_covariance_loss(z)
        assert float(var_t) == pytest.approx(1.0, abs=0.02)

    def test_correlated_dims_cov_penalty(self, rng):
        a = rng.normal(size=(500, 1))
        z = jnp.asarray(np.concatenate([a, a], 1), jnp.float32)
        _, _, cov_t = variance_covariance.variance_covariance_loss(z)
        assert float(cov_t) > 0.1

    def test_mask(self, rng):
        z = jnp.asarray(rng.normal(size=(50, 4)), jnp.float32)
        z = z.at[25:].set(1e6)  # masked-out garbage
        mask = jnp.arange(50) < 25
        total, var_t, cov_t = variance_covariance.variance_covariance_loss(
            z, mask)
        assert np.isfinite(float(total))
        assert float(var_t) < 1.0


class TestPairs:
    def test_knn_small_example(self):
        d = jnp.asarray([[0.0, 1.0, 5.0],
                         [1.0, 0.0, 2.0],
                         [5.0, 2.0, 0.0]])
        p, v = pairs.pairs_knn(d, k=1)
        got = {tuple(x) for x, ok in zip(np.asarray(p), np.asarray(v)) if ok}
        assert got == {(0, 1), (1, 0), (2, 1)}

    def test_mutual_knn_symmetry(self, rng):
        x = jnp.asarray(rng.normal(size=(20, 4)), jnp.float32)
        d = jnp.sqrt(soft_neighborhood.pairwise_sq_distances(x))
        p, v = pairs.pairs_mutual_knn(d, k=3)
        got = {tuple(x) for x, ok in zip(np.asarray(p), np.asarray(v)) if ok}
        for (i, j) in got:
            assert (j, i) in got

    def test_quantile_and_radius(self, rng):
        d = jnp.asarray(np.abs(rng.normal(size=(10, 10))), jnp.float32)
        adj_q = pairs.pairs_quantile(d, 0.3)
        assert adj_q.shape == (10, 10)
        adj_r = pairs.pairs_radius(d, 0.5)
        dd = np.asarray(pairs._sanitize(d, None))
        np.testing.assert_array_equal(np.asarray(adj_r),
                                      np.isfinite(dd) & (dd <= 0.5))

    def test_spatial_constraint(self):
        d = jnp.ones((4, 4), jnp.float32)
        coords = jnp.asarray([[0, 0], [0, 1], [0, 5], [9, 9]])
        out = pairs.apply_spatial_constraint(d, coords, min_spatial=3.0)
        assert not bool(jnp.isfinite(out[0, 1]))  # distance 1 < 3 -> inf
        assert bool(jnp.isfinite(out[0, 2]))      # distance 5 >= 3 kept

    def test_chunked_matches_dense_mutual(self, rng):
        x = jnp.asarray(rng.normal(size=(50, 6)), jnp.float32)
        d = jnp.sqrt(soft_neighborhood.pairwise_sq_distances(x))
        p1, v1 = pairs.pairs_mutual_knn(d, k=4)
        p2, v2 = pairs.pairs_mutual_knn_chunked(x, k=4, chunk_size=16)
        s1 = {tuple(r) for r, ok in zip(np.asarray(p1), np.asarray(v1)) if ok}
        s2 = {tuple(r) for r, ok in zip(np.asarray(p2), np.asarray(v2)) if ok}
        assert s1 == s2

    def test_mask_to_pairs(self, rng):
        adj = jnp.zeros((5, 5), bool).at[1, 2].set(True).at[3, 4].set(True)
        p, v = pairs.mask_to_pairs(adj, max_pairs=4)
        got = {tuple(x) for x, ok in zip(np.asarray(p), np.asarray(v)) if ok}
        assert got == {(1, 2), (3, 4)}


class TestPhasePairs:
    def test_overlap_matrix(self):
        ysfc = jnp.asarray([[0, 1, 2], [1, 2, 3], [5, 6, 7]])
        ov = phase_pairs.ysfc_overlap_matrix(ysfc, 10)
        assert float(ov[0, 1]) == 2  # shares {1, 2}
        assert float(ov[0, 2]) == 0
        assert float(ov[0, 0]) == 3

    def test_duplicate_values_counted_once(self):
        ysfc = jnp.asarray([[1, 1, 1], [1, 2, 2]])
        ov = phase_pairs.ysfc_overlap_matrix(ysfc, 5)
        assert float(ov[0, 1]) == 1

    def test_build_filters_and_self_pairs(self, rng):
        n, t = 12, 6
        spec = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
        ysfc = jnp.asarray(rng.integers(0, 4, size=(n, t)), jnp.float32)
        p, w, v, stats = phase_pairs.build_phase_pairs(
            spec, ysfc, k=4, min_overlap=2, min_pairs=1, sigma=5.0)
        assert p.shape == (n * 4 + n, 2)
        pv = np.asarray(p)[np.asarray(v)]
        # self-pairs only for surviving anchors
        selfs = pv[pv[:, 0] == pv[:, 1]]
        assert len(selfs) == int(stats["n_self_pairs"])
        # weights in (0, 1]
        wv = np.asarray(w)[np.asarray(v)]
        assert np.all(wv > 0) and np.all(wv <= 1.0 + 1e-6)

    def test_min_overlap_filters_all(self, rng):
        spec = jnp.asarray(rng.normal(size=(6, 3)), jnp.float32)
        ysfc = jnp.asarray(np.tile(np.arange(6)[:, None], (1, 4)) * 7,
                           jnp.float32)  # disjoint values
        _, _, v, stats = phase_pairs.build_phase_pairs(
            spec, ysfc, k=3, min_overlap=1, min_pairs=1,
            num_ysfc_classes=64)
        assert int(stats["n_after_overlap"]) == 0
        assert not bool(jnp.any(v))


class TestPhaseNeighborhood:
    def test_seq_lengths(self):
        ysfc = jnp.asarray([[0, 1, 2, 0, 1]], jnp.float32)
        sl = phase_neighborhood.seq_lengths_per_t(ysfc)
        np.testing.assert_array_equal(np.asarray(sl[0]), [3, 3, 3, 2, 2])

    def test_best_t_longest_then_recent(self):
        # value 1 appears at t=1 (in length-3 seq) and t=4 (length-2 seq):
        # longest wins -> t=1. Value 0 at t=0 (len 3) and t=3 (len 2) -> t=0.
        ysfc = jnp.asarray([[0, 1, 2, 0, 1]], jnp.float32)
        presence, best_t = phase_neighborhood._presence_and_best_t(ysfc, 8)
        assert bool(presence[0, 1])
        assert int(best_t[0, 1]) == 1
        assert int(best_t[0, 0]) == 0
        # tie in length: most recent wins
        ysfc2 = jnp.asarray([[0, 1, 0, 1]], jnp.float32)  # two len-2 seqs
        _, bt2 = phase_neighborhood._presence_and_best_t(ysfc2, 8)
        assert int(bt2[0, 1]) == 3
        assert int(bt2[0, 0]) == 2

    def _setup(self, rng, n=8, t=6, c=4, d=3):
        spec = jnp.asarray(rng.normal(size=(n, t, c)), jnp.float32)
        phase = jnp.asarray(rng.normal(size=(n, t, d)), jnp.float32)
        ysfc = jnp.asarray(rng.integers(0, 4, size=(n, t)), jnp.float32)
        pair_idx = jnp.asarray([[i, (i + 1) % n] for i in range(n)]
                               + [[i, i] for i in range(n)], jnp.int32)
        return spec, phase, ysfc, pair_idx

    def test_batch_shapes_and_masks(self, rng):
        spec, phase, ysfc, pi = self._setup(rng)
        b = phase_neighborhood.build_phase_neighborhood_batch(
            spec, phase, ysfc, pi, min_overlap=2)
        m = b["M"]
        assert b["d_ref_self"].shape == (pi.shape[0], m, m)
        # self mask excludes diagonal
        assert not bool(jnp.any(b["mask_self"]
                                & jnp.eye(m, dtype=bool)[None]))
        # invalid pairs have all-False masks
        inv = ~b["valid_pair_mask"]
        assert not bool(jnp.any(b["mask_cross"] & inv[:, None, None]))

    def test_loss_self_and_cross_reported(self, rng):
        spec, phase, ysfc, pi = self._setup(rng)
        loss, stats = phase_neighborhood.phase_neighborhood_loss(
            spec, phase, ysfc, pi, min_overlap=2)
        assert np.isfinite(float(loss))
        assert "loss_self" in stats and "loss_cross" in stats

    def test_gradient_flows_to_phase(self, rng):
        spec, phase, ysfc, pi = self._setup(rng)

        def f(ph):
            return phase_neighborhood.phase_neighborhood_loss(
                spec, ph, ysfc, pi, min_overlap=2)[0]

        g = jax.grad(f)(phase)
        assert float(jnp.abs(g).sum()) > 0

    def test_spread_ranking_direction(self, rng):
        spec, phase, ysfc, pi = self._setup(rng)
        b = phase_neighborhood.build_phase_neighborhood_batch(
            spec, phase, ysfc, pi, min_overlap=2)
        n = spec.shape[0]
        dyn = jnp.asarray(rng.normal(size=(n,)) * 3, jnp.float32)
        loss, stats = phase_neighborhood.compute_phase_spread_ranking(
            b, pi, dyn, margin=0.1, delta=0.5)
        assert np.isfinite(float(loss))
        assert float(stats["frac_satisfied"]) <= 1.0


class TestTriplet:
    def test_classification_cases(self):
        # T=6, samples at 0, 3, 5
        ysfc = jnp.asarray([
            [3, 4, 0, 1, 2, 3],    # disturbance at t=2 in (0,3) -> case 0
            [3, 4, 5, 6, 0, 1],    # t=4 in (3,5) -> case 1
            [1, 2, 3, 4, 5, 6],    # none -> case 2
            [0, 1, 2, 3, 4, 5],    # disturbance AT sample t=0 -> skip
        ], jnp.float32)
        case = triplet_phase.classify_triplet_batch(ysfc, 0, 3, 5)
        np.testing.assert_array_equal(np.asarray(case), [0, 1, 2, 3])

    def test_zero_when_satisfied(self):
        # case none: want d(0,1), d(1,2) << d(0,2). Construct embeddings.
        e0 = jnp.zeros((1, 4))
        e1 = jnp.zeros((1, 4)).at[0, 0].set(0.1)
        e2 = jnp.zeros((1, 4)).at[0, 0].set(100.0)
        ysfc = jnp.asarray([[1, 2, 3, 4, 5, 6]], jnp.float32)
        loss, stats = triplet_phase.phase_triplet_loss(
            e0, e1, e2, ysfc, 0, 3, 5, small_margin=0.3)
        assert float(loss) < 0.01
        assert float(stats["frac_satisfied"]) == 1.0

    def test_violated_positive(self):
        e0 = jnp.zeros((1, 4))
        e1 = jnp.zeros((1, 4)).at[0, 0].set(10.0)  # d(0,1) huge
        e2 = jnp.zeros((1, 4)).at[0, 0].set(0.1)   # d(0,2) tiny
        ysfc = jnp.asarray([[1, 2, 3, 4, 5, 6]], jnp.float32)
        loss, _ = triplet_phase.phase_triplet_loss(e0, e1, e2, ysfc, 0, 3, 5)
        assert float(loss) > 1.0

    def test_skip_contributes_nothing(self):
        e = jnp.ones((1, 4))
        ysfc = jnp.asarray([[0, 1, 2, 3, 4, 5]], jnp.float32)  # skip
        loss, stats = triplet_phase.phase_triplet_loss(e, e, e, ysfc, 0, 3, 5)
        assert float(loss) == 0.0
        assert int(stats["n_constraints"]) == 0

    def test_recovery_discrimination(self):
        t = 6
        z_sep = jnp.zeros((1, t, 4)).at[0, 3:, 0].set(5.0)
        ysfc = jnp.asarray([[0, 1, 2, 5, 6, 7]], jnp.float32)
        loss_sep, stats = triplet_phase.phase_recovery_discrimination_loss(
            z_sep, ysfc, margin=0.5)
        z_same = jnp.zeros((1, t, 4))
        loss_same, _ = triplet_phase.phase_recovery_discrimination_loss(
            z_same, ysfc, margin=0.5)
        assert float(loss_sep) < 0.05
        assert float(loss_same) > 0.4  # ~softplus(0.5)
        assert int(stats["n_active_pixels"]) == 1

    def test_no_active_pixels(self):
        z = jnp.zeros((2, 4, 3))
        ysfc = jnp.full((2, 4), 3.0)  # neither low nor high
        loss, stats = triplet_phase.phase_recovery_discrimination_loss(
            z, ysfc)
        assert float(loss) == 0.0
        assert int(stats["n_active_pixels"]) == 0


class TestEvt:
    @pytest.fixture
    def metric(self, tmp_path):
        codes = [100, 200, 300, 400]
        conf = np.asarray([
            [50, 30, 0, 0],
            [25, 60, 5, 0],
            [0, 5, 70, 20],
            [0, 0, 25, 55],
        ], float)
        lines = ["," + ",".join(map(str, codes))]
        for c, row in zip(codes, conf):
            lines.append(f"{c}," + ",".join(map(str, row)))
        lines.append("Total," + ",".join(["1"] * 4))  # summary row dropped
        p = tmp_path / "conf.csv"
        p.write_text("\n".join(lines))
        counts = {100: 1000, 200: 500, 300: 800, 400: 50}
        return evt_soft_neighborhood.EvtDiffusionMetric(
            p, counts, min_count=100, min_confusion_samples=10,
            diffusion_steps=2)

    def test_metric_construction(self, metric):
        assert metric.n_codes == 3  # 400 dropped by min_count
        assert set(metric.code_to_idx) == {100, 200, 300}
        s = metric.similarity
        assert s.shape == (3, 3)
        np.testing.assert_allclose(s.sum(1), 1.0, atol=1e-6)
        # confused codes (100, 200) more similar than (100, 300)
        assert s[0, 1] > s[0, 2]

    def test_lookup_and_weights(self, metric):
        idx, valid, w = metric.lookup(np.asarray([100, 999, 300]))
        np.testing.assert_array_equal(valid, [True, False, True])
        assert w[1] == 0.0 and w[0] > 0

    def test_loss_prefers_confusion_aligned_embedding(self, metric, rng):
        codes = np.asarray([100, 200, 300, 100, 200, 300])
        idx, valid, w = metric.lookup(codes)
        sim = jnp.asarray(metric.similarity)
        args = (jnp.asarray(idx), jnp.asarray(valid), jnp.asarray(w), sim,
                jnp.asarray(codes))
        # aligned: 100 and 200 close, 300 far
        e_aligned = jnp.asarray([[0.], [0.3], [5.], [0.05], [0.35], [5.1]])
        e_anti = jnp.asarray([[0.], [5.], [0.3], [0.05], [5.1], [0.35]])
        l_al, s = evt_soft_neighborhood.evt_soft_neighborhood_loss(
            e_aligned, *args)
        l_an, _ = evt_soft_neighborhood.evt_soft_neighborhood_loss(
            e_anti, *args)
        assert float(l_al) < float(l_an)
        assert int(s["n_anchors_valid"]) == 6

    def test_below_min_anchors_zero(self, metric):
        codes = np.asarray([100, 999])
        idx, valid, w = metric.lookup(codes)
        loss, _ = evt_soft_neighborhood.evt_soft_neighborhood_loss(
            jnp.zeros((2, 3)), jnp.asarray(idx), jnp.asarray(valid),
            jnp.asarray(w), jnp.asarray(metric.similarity),
            jnp.asarray(codes), min_valid_anchors=4)
        assert float(loss) == 0.0


class TestNaNYsfc:
    def test_overlap_matrix_ignores_nan(self):
        """NaN ysfc must not alias to value 0 (= disturbance year)."""
        ysfc = jnp.asarray([[jnp.nan, 1.0, 2.0], [0.0, 1.0, 5.0]])
        ov = phase_pairs.ysfc_overlap_matrix(ysfc, 10)
        # shared values: {1, 2} vs {0, 1, 5} -> only {1}
        assert float(ov[0, 1]) == 1.0
        assert float(ov[0, 0]) == 2.0  # NaN not counted for pixel 0


class TestSpatialConstraintCombo:
    def test_knn_with_constraint(self, rng):
        x = jnp.asarray(rng.normal(size=(20, 4)), jnp.float32)
        d = jnp.sqrt(soft_neighborhood.pairwise_sq_distances(x))
        coords = jnp.asarray(rng.integers(0, 64, size=(20, 2)))
        p, v = pairs.pairs_with_spatial_constraint(
            d, coords, strategy="knn", k=3, min_spatial=8.0)
        c = np.asarray(coords)
        n_ok = 0
        for (i, j), ok in zip(np.asarray(p), np.asarray(v)):
            if ok:
                n_ok += 1
                dist = np.sqrt(((c[i] - c[j]) ** 2).sum())
                assert dist >= 8.0
        # constraint-BEFORE-selection (reference order): anchors keep their
        # k slots by falling through to farther admissible neighbors
        assert n_ok > 0

    def test_quantile_strategy_path(self, rng):
        x = jnp.asarray(rng.normal(size=(12, 3)), jnp.float32)
        d = jnp.sqrt(soft_neighborhood.pairwise_sq_distances(x))
        coords = jnp.asarray(rng.integers(0, 64, size=(12, 2)))
        p, v = pairs.pairs_with_spatial_constraint(
            d, coords, strategy="quantile", q=0.3, k=4, min_spatial=2.0)
        assert p.shape[1] == 2
        assert bool(jnp.any(v))

    def test_unknown_strategy_raises(self, rng):
        d = jnp.ones((4, 4))
        with pytest.raises(ValueError):
            pairs.pairs_with_spatial_constraint(d, jnp.zeros((4, 2)),
                                                strategy="bogus")


class TestGroupedContrastiveEquivalence:
    """contrastive_loss_grouped over a regular [S, K] layout must equal the
    flat segment-op contrastive_loss with anchor-major ids (the grouped form
    replaces TPU scatters with dense reductions on the hot path)."""

    def test_matches_flat(self, rng):
        import jax.numpy as jnp
        from forest_tpu.losses.contrastive import (contrastive_loss,
                                                   contrastive_loss_grouped)

        s, k, d = 37, 11, 6
        za = jnp.asarray(rng.normal(size=(s, d)), jnp.float32)
        zo = jnp.asarray(rng.normal(size=(s, k, d)), jnp.float32)
        is_pos = jnp.asarray(rng.random((s, k)) < 0.4)
        valid = jnp.asarray(rng.random((s, k)) < 0.8)
        w = jnp.asarray(rng.random((s, k)).astype(np.float32) + 0.05)

        lg, ag = contrastive_loss_grouped(za, zo, is_pos, weights=w,
                                          pair_valid=valid,
                                          similarity="l2", temperature=0.3)
        ids = jnp.repeat(jnp.arange(s), k)
        lf, af = contrastive_loss(
            jnp.repeat(za, k, axis=0), zo.reshape(-1, d), ids,
            is_pos.reshape(-1), s, weights=w.reshape(-1),
            pair_valid=valid.reshape(-1), similarity="l2", temperature=0.3)
        np.testing.assert_allclose(float(lg), float(lf), rtol=1e-5)
        for key in ag:
            np.testing.assert_allclose(np.asarray(ag[key]),
                                       np.asarray(af[key]), rtol=1e-4,
                                       atol=1e-6)

    def test_mutual_knn_grouped_matches_flat(self, rng):
        import jax.numpy as jnp
        from forest_tpu.losses.pairs import (mutual_knn_grouped,
                                             pairs_mutual_knn_chunked)

        f = jnp.asarray(rng.normal(size=(40, 5)), jnp.float32)
        pids = jnp.asarray(rng.integers(0, 4, size=(40,)), jnp.int32)
        coords = jnp.asarray(rng.integers(0, 32, size=(40, 2)), jnp.int32)
        idx, valid = mutual_knn_grouped(f, 6, pids, coords, 4.0, 16)
        pairs, vflat = pairs_mutual_knn_chunked(f, 6, pids, coords, 4.0, 16)
        np.testing.assert_array_equal(np.asarray(idx).reshape(-1),
                                      np.asarray(pairs[:, 1]))
        np.testing.assert_array_equal(np.asarray(valid).reshape(-1),
                                      np.asarray(vflat))


class TestGroupedPhaseBatch:
    """The grouped (one-hot-einsum) builder must reproduce the flat
    builder's batch exactly: same distances, masks, and gradients."""

    def _data(self, s=3, a=10, t=8, c=4, d=3, p=14, seed=0):
        r = np.random.default_rng(seed)
        spec = jnp.asarray(r.normal(size=(s, a, t, c)), jnp.float32)
        phase = jnp.asarray(r.normal(size=(s, a, t, d)), jnp.float32)
        ysfc = jnp.asarray(r.integers(0, 6, size=(s, a, t)), jnp.float32)
        pairs = jnp.asarray(r.integers(0, a, size=(s, p, 2)), jnp.int32)
        pvalid = jnp.asarray(r.random(size=(s, p)) < 0.9)
        return spec, phase, ysfc, pairs, pvalid

    def test_matches_flat(self):
        from forest_tpu.losses import phase_neighborhood as pn
        s, a, t, c, d, p = 3, 10, 8, 4, 3, 14
        spec, phase, ysfc, pairs, pvalid = self._data(s, a, t, c, d, p)
        offsets = (jnp.arange(s) * a)[:, None, None]
        flat = pn.build_phase_neighborhood_batch(
            spec.reshape(-1, t, c), phase.reshape(-1, t, d),
            ysfc.reshape(-1, t), (pairs + offsets).reshape(-1, 2),
            pvalid.reshape(-1), min_overlap=2, num_classes=8)
        grouped = pn.build_phase_neighborhood_batch_grouped(
            spec, phase, ysfc, pairs, pvalid, min_overlap=2, num_classes=8)
        for k in flat:
            if k == "M":
                assert flat[k] == grouped[k]
                continue
            np.testing.assert_allclose(
                np.asarray(flat[k], np.float32),
                np.asarray(grouped[k], np.float32), atol=2e-5,
                err_msg=k)
        # pair-axis-minor layout: same tensors transposed
        mnb = pn.build_phase_neighborhood_batch_grouped(
            spec, phase, ysfc, pairs, pvalid, min_overlap=2, num_classes=8,
            layout="mnb")
        assert mnb["layout"] == "mnb"
        for k in ("d_ref_self", "d_learned_self", "d_learned_self_j",
                  "d_ref_cross", "d_learned_cross"):
            # compare SQUARED distances: mnb computes |x-y|^2 directly
            # while bmn expands x^2-2xy+y^2, which catastrophically
            # cancels for near-identical vectors (the mnb form is the
            # more accurate one; sqrt amplifies the difference near 0).
            np.testing.assert_allclose(
                np.transpose(np.asarray(mnb[k], np.float32),
                             (2, 0, 1)) ** 2,
                np.asarray(flat[k], np.float32) ** 2, atol=1e-5,
                err_msg=k)
        for k in ("mask_self", "mask_cross"):
            np.testing.assert_array_equal(
                np.transpose(np.asarray(mnb[k]), (2, 0, 1)),
                np.asarray(flat[k]), err_msg=k)
        np.testing.assert_array_equal(np.asarray(mnb["valid_pair_mask"]),
                                      np.asarray(flat["valid_pair_mask"]))
        # sample-leading pair-minor layout: [S, M, N, P] tensors
        mnsp = pn.build_phase_neighborhood_batch_grouped(
            spec, phase, ysfc, pairs, pvalid, min_overlap=2, num_classes=8,
            layout="mnsp")
        assert mnsp["layout"] == "mnsp"
        for k in ("d_ref_self", "d_learned_self", "d_learned_self_j",
                  "d_ref_cross", "d_learned_cross"):
            arr = np.transpose(np.asarray(mnsp[k], np.float32),
                               (0, 3, 1, 2)).reshape(s * p, t, t)
            np.testing.assert_allclose(
                arr ** 2, np.asarray(flat[k], np.float32) ** 2,
                atol=1e-5, err_msg=k)
        for k in ("mask_self", "mask_cross"):
            arr = np.transpose(np.asarray(mnsp[k]),
                               (0, 3, 1, 2)).reshape(s * p, t, t)
            np.testing.assert_array_equal(arr, np.asarray(flat[k]),
                                          err_msg=k)
        np.testing.assert_array_equal(
            np.asarray(mnsp["valid_pair_mask"]).reshape(-1),
            np.asarray(flat["valid_pair_mask"]))

    def test_gradients_match_flat(self):
        import jax

        from forest_tpu.losses import phase_neighborhood as pn
        s, a, t, c, d, p = 2, 8, 6, 3, 3, 10
        spec, phase, ysfc, pairs, pvalid = self._data(s, a, t, c, d, p,
                                                      seed=3)
        offsets = (jnp.arange(s) * a)[:, None, None]
        w = jnp.ones((s * p,), jnp.float32)

        def loss_flat(ph):
            l, _ = pn.phase_neighborhood_loss(
                spec.reshape(-1, t, c), ph.reshape(-1, t, d),
                ysfc.reshape(-1, t), (pairs + offsets).reshape(-1, 2),
                w, pvalid.reshape(-1), min_overlap=2, num_classes=8)
            return l

        def loss_grouped(ph, layout="bmn"):
            batch = pn.build_phase_neighborhood_batch_grouped(
                spec, ph, ysfc, pairs, pvalid, min_overlap=2,
                num_classes=8, layout=layout)
            l, _ = pn.phase_neighborhood_loss(
                spec.reshape(-1, t, c), ph.reshape(-1, t, d),
                ysfc.reshape(-1, t), (pairs + offsets).reshape(-1, 2),
                w, pvalid.reshape(-1), min_overlap=2, num_classes=8,
                _batch=batch)
            return l

        lf, gf = jax.value_and_grad(loss_flat)(phase)
        lg, gg = jax.value_and_grad(loss_grouped)(phase)
        np.testing.assert_allclose(float(lf), float(lg), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gg),
                                   atol=2e-5)
        lm, gm = jax.value_and_grad(
            lambda ph: loss_grouped(ph, "mnb"))(phase)
        np.testing.assert_allclose(float(lm), float(lf), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gf),
                                   atol=2e-5)
        ls, gs = jax.value_and_grad(
            lambda ph: loss_grouped(ph, "mnsp"))(phase)
        np.testing.assert_allclose(float(ls), float(lf), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gf),
                                   atol=2e-5)

    def test_spread_ranking_layout_parity(self):
        from forest_tpu.losses import phase_neighborhood as pn
        s, a, t, c, d, p = 2, 8, 6, 3, 3, 10
        spec, phase, ysfc, pairs, pvalid = self._data(s, a, t, c, d, p,
                                                      seed=9)
        offsets = (jnp.arange(s) * a)[:, None, None]
        pp_flat = (pairs + offsets).reshape(-1, 2)
        rng = np.random.default_rng(10)
        dyn = jnp.asarray(rng.normal(size=(s * a,)), jnp.float32)
        losses = {}
        for layout in ("bmn", "mnb", "mnsp"):
            batch = pn.build_phase_neighborhood_batch_grouped(
                spec, phase, ysfc, pairs, pvalid, min_overlap=2,
                num_classes=8, layout=layout)
            l, st = pn.compute_phase_spread_ranking(
                batch, pp_flat, dyn, margin=0.1, delta=0.2)
            losses[layout] = float(l)
            assert int(st["n_pairs"]) > 0
        np.testing.assert_allclose(losses["mnb"], losses["bmn"], rtol=1e-5)
        np.testing.assert_allclose(losses["mnsp"], losses["bmn"],
                                   rtol=1e-5)


class TestReferenceParityFixes:
    """Round-2 review-pass parity corrections vs the reference."""

    def test_phase_pairs_valid_anchors_excluded(self):
        from forest_tpu.losses.phase_pairs import build_phase_pairs
        r = np.random.default_rng(0)
        n, t = 12, 8
        spec = jnp.asarray(r.normal(size=(n, 4)), jnp.float32)
        ysfc = jnp.asarray(r.integers(0, 5, size=(n, t)), jnp.float32)
        va = jnp.asarray([True] * 9 + [False] * 3)
        pairs, w, valid, stats = build_phase_pairs(
            spec, ysfc, k=4, min_overlap=1, min_pairs=1,
            num_ysfc_classes=8, valid_anchors=va)
        p = np.asarray(pairs)
        v = np.asarray(valid)
        # invalid anchors never appear on either side of a valid pair
        assert not np.isin(p[v], [9, 10, 11]).any()
        # without the mask, the same invalid ids would appear
        pairs2, _, valid2, _ = build_phase_pairs(
            spec, ysfc, k=4, min_overlap=1, min_pairs=1, num_ysfc_classes=8)
        assert np.isin(np.asarray(pairs2)[np.asarray(valid2)],
                       [9, 10, 11]).any()

    def test_spread_normalizes_over_valid_pairs(self):
        """Reference phase_neighborhood.py:722: mean over ALL valid pairs,
        so adding unconstrained pairs dilutes the loss."""
        from forest_tpu.losses import phase_neighborhood as pn
        m = 4
        b1, b2 = 2, 6  # 2 constrained pairs, then 4 extra unconstrained

        def batch(nb, dyn):
            d = jnp.ones((m, m, nb)) * jnp.arange(1, nb + 1)[None, None, :]
            mask = jnp.broadcast_to(
                ~jnp.eye(m, dtype=bool)[:, :, None], (m, m, nb))
            return {
                "d_learned_self": d, "d_learned_self_j": jnp.zeros_like(d),
                "mask_self": mask,
                "valid_pair_mask": jnp.ones((nb,), bool),
                "layout": "mnb", "M": m,
            }, jnp.stack([jnp.arange(nb), jnp.arange(nb)], 1), dyn

        # all pairs constrained (dyn diff > delta): i more dynamic
        dyn_hi = jnp.asarray([10.0, 10.0])
        bt, pi, _ = batch(b1, None)
        l1, s1 = pn.compute_phase_spread_ranking(
            bt, pi, jnp.asarray([10.0] * b1), delta=0.5)
        # same 2 "pairs" + 4 unconstrained ones must DILUTE the loss
        bt2, pi2, _ = batch(b2, None)
        dyn2 = jnp.asarray([10.0] * b2)
        l2, s2 = pn.compute_phase_spread_ranking(bt2, pi2, dyn2, delta=0.5)
        # with self-pairs dyn diff == 0 -> nothing constrained -> loss 0
        assert float(l2) == 0.0 and float(l1) == 0.0

    def test_spread_dilution_numeric(self):
        from forest_tpu.losses import phase_neighborhood as pn
        m, nb = 3, 4
        # pair 0: i spreads 0, j spreads 1 with i more dynamic -> violation
        d_i = jnp.zeros((m, m, nb))
        d_j = jnp.ones((m, m, nb))
        mask = jnp.broadcast_to(~jnp.eye(m, dtype=bool)[:, :, None],
                                (m, m, nb))
        batch = {"d_learned_self": d_i, "d_learned_self_j": d_j,
                 "mask_self": mask,
                 "valid_pair_mask": jnp.ones((nb,), bool),
                 "layout": "mnb", "M": m}
        pairs = jnp.asarray([[0, 1], [2, 3], [4, 5], [6, 7]])
        # only pair 0 constrained (dyn gap > delta)
        dyn = jnp.zeros((8,)).at[0].set(10.0)
        loss, stats = pn.compute_phase_spread_ranking(
            batch, pairs, dyn, margin=0.1, delta=0.5)
        per_pair = float(jax.nn.softplus(1.0 - 0.0 + 0.1))
        # normalized by 4 valid pairs, NOT by 1 constrained pair
        np.testing.assert_allclose(float(loss), per_pair / 4, rtol=1e-6)
        assert int(stats["n_constrained_i"]) == 1

    def test_frobenius_leakage_is_norm_not_square(self, rng):
        from forest_tpu.training.representation.step import (
            frobenius_type_leakage)
        n, t, zp, zt = 40, 5, 6, 8
        h = jnp.asarray(rng.normal(size=(n, t, zp)), jnp.float32)
        z = jnp.asarray(rng.normal(size=(n, zt)), jnp.float32)
        valid = jnp.ones((n,), bool)
        got = float(frobenius_type_leakage(h, z, valid))
        hm = np.asarray(h).mean(1)
        hc = hm - hm.mean(0)
        zc = np.asarray(z) - np.asarray(z).mean(0)
        cross = hc.T @ zc / (n - 1)
        np.testing.assert_allclose(got, np.sqrt((cross ** 2).sum()),
                                   rtol=1e-5)

    def test_vq_pallas_nan_row_matches_xla_convention(self):
        from forest_tpu.ops import vq
        x = jnp.asarray(np.r_[np.full((1, 8), np.nan),
                              np.random.default_rng(0).normal(
                                  size=(7, 8))].astype(np.float32))
        cb = jnp.asarray(np.random.default_rng(1).normal(
            size=(16, 8)).astype(np.float32))
        ix = np.asarray(vq._vq_core_xla(x, cb)[0])
        ip = np.asarray(vq._vq_core_pallas(x, cb, tile_n=8,
                                           interpret=True)[0])
        ia = np.asarray(vq._vq_assign_pallas(x, cb, tile_n=8,
                                             mxu_bf16=False,
                                             interpret=True))
        assert ix[0] == 0  # XLA argmin convention on an all-NaN row
        assert ip[0] == 0 and ia[0] == 0  # pallas matches, never leaks K
        np.testing.assert_array_equal(ip[1:], ix[1:])
        np.testing.assert_array_equal(ia[1:], ix[1:])
