"""FIA post-stratification estimators + embedding strata + kNN imputation."""
import numpy as np
import pytest

from forest_tpu.eval import fia


class TestPostStratification:
    def test_matches_srs_with_one_stratum(self, rng):
        y = rng.normal(10, 2, 100)
        ps = fia.post_stratified_estimate(y, np.zeros(100, int), {0: 1.0})
        srs = fia.simple_random_estimate(y)
        assert ps["mean"] == pytest.approx(srs["mean"])
        # var = s2/n + 0 ~ srs variance (second term vanishes with W=1)
        assert ps["variance"] == pytest.approx(srs["variance"], rel=1e-9)

    def test_informative_strata_reduce_variance(self, rng):
        # two strata with very different means; equal weights
        y = np.concatenate([rng.normal(0, 1, 200), rng.normal(50, 1, 200)])
        strata = np.repeat([0, 1], 200)
        re = fia.relative_efficiency(y, strata, {0: 0.5, 1: 0.5})
        assert re > 10  # between-strata variance removed

    def test_weights_shift_mean(self, rng):
        y = np.concatenate([np.zeros(50), np.ones(50) * 10])
        strata = np.repeat([0, 1], 50)
        ps = fia.post_stratified_estimate(y, strata, {0: 0.9, 1: 0.1})
        assert ps["mean"] == pytest.approx(1.0)

    def test_missing_stratum_renormalized(self, rng):
        y = rng.normal(size=30)
        strata = np.zeros(30, int)
        ps = fia.post_stratified_estimate(y, strata,
                                          {0: 0.5, 7: 0.5})
        assert ps["n_strata"] == 1
        assert ps["mean"] == pytest.approx(float(y.mean()))

    def test_singleton_stratum_flagged(self):
        y = np.asarray([1.0, 2.0, 3.0, 9.0])
        strata = np.asarray([0, 0, 0, 1])
        ps = fia.post_stratified_estimate(y, strata, {0: 0.75, 1: 0.25})
        assert ps["small_strata"] == [1]

    def test_no_data_raises(self):
        with pytest.raises(ValueError):
            fia.post_stratified_estimate(np.asarray([1.0]),
                                         np.asarray([5]), {0: 1.0})


class TestEmbeddingStrata:
    def test_gmm_strata_pipeline(self, rng):
        from sklearn.mixture import GaussianMixture
        pop = np.concatenate([rng.normal(0, 0.3, (800, 2)),
                              rng.normal(5, 0.3, (200, 2))])
        gm = GaussianMixture(2, random_state=0).fit(pop)
        plots = np.concatenate([rng.normal(0, 0.3, (20, 2)),
                                rng.normal(5, 0.3, (20, 2))])
        labels, weights = fia.embedding_strata(gm, plots,
                                               z_population=pop)
        assert set(labels) == {0, 1}
        assert sum(weights.values()) == pytest.approx(1.0)
        # weights reflect the 80/20 population split
        assert max(weights.values()) == pytest.approx(0.8, abs=0.05)


class TestKnnImpute:
    def test_recovers_smooth_function(self, rng):
        z = rng.uniform(-1, 1, (500, 2))
        y = z[:, 0] * 3 + z[:, 1]
        zq = rng.uniform(-0.8, 0.8, (50, 2))
        pred = fia.knn_impute(z, y, zq, k=7)
        expect = zq[:, 0] * 3 + zq[:, 1]
        assert np.abs(pred - expect).mean() < 0.25
