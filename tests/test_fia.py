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


class TestStratificationHelpers:
    """Shared helpers ported from the R notebooks (hierarchical / HDBSCAN /
    removals: /root/reference/frl/analysis/*.Rmd)."""

    def test_ward_recovers_separated_clusters(self, rng):
        x = np.concatenate([rng.normal(0, 0.2, (50, 3)),
                            rng.normal(8, 0.2, (50, 3))])
        lab = fia.ward_cluster(x, 2)
        assert len(np.unique(lab)) == 2
        assert len(np.unique(lab[:50])) == 1
        assert len(np.unique(lab[50:])) == 1

    def test_dh_strata_skewed_vs_quantile(self, rng):
        # zero-inflated + right-skewed: DH puts the zero mass in one
        # stratum and refines the tail (the removals design rationale)
        x = np.concatenate([np.zeros(800), rng.exponential(5, 200)])
        lab = fia.dh_strata(x, 4)
        assert len(np.unique(lab)) >= 2
        assert len(np.unique(lab[:800])) == 1  # zero mass in one stratum

    def test_dh_strata_constant_input(self):
        lab = fia.dh_strata(np.ones(10), 4)
        assert (lab == 0).all()

    def test_pooled_within_variance_analytic(self):
        # two groups, each with known within-variance 1.0 (ddof pooled):
        # y = [0,2] and [10,12]: SS=2+2=4, dof = 4-2 = 2 -> 2.0
        y = np.array([0.0, 2.0, 10.0, 12.0])
        g = np.array([0, 0, 1, 1])
        assert fia.pooled_within_variance(y, g) == pytest.approx(2.0)
        # crossing with a constant second label changes nothing
        assert fia.pooled_within_variance(y, g, np.zeros(4)) == \
            pytest.approx(2.0)

    def test_aggregate_and_apply_bin_map(self, rng):
        fine = np.repeat([0, 1, 2, 3], 25)
        y = np.repeat([0.0, 0.1, 10.0, 10.1], 25)
        m = fia.aggregate_bins_by_target(fine, y, 2)
        s = fia.apply_bin_map(fine, m)
        assert m[0] == m[1] and m[2] == m[3] and m[0] != m[2]
        assert len(np.unique(s)) == 2

    def test_oof_scores_predict_linear_target(self, rng):
        x = rng.normal(size=(300, 4))
        y = x @ np.array([1.0, -2.0, 0.5, 0.0]) + 3
        s = fia.oof_linear_scores(x, y)
        assert np.corrcoef(s, y)[0, 1] > 0.95


class TestHierarchicalStrata:
    def test_variance_reduction_vs_srs(self, rng):
        # 3 latent types with distinct y levels; one type has phase
        # substructure that further splits y.
        n = 900
        t = rng.integers(0, 3, n)
        z_type = rng.normal(0, 0.3, (n, 4)) + t[:, None] * 5.0
        phase_group = rng.integers(0, 2, n)
        z_phase = rng.normal(0, 0.3, (n, 3))
        z_phase[t == 2] += (phase_group[t == 2] * 6.0)[:, None]
        y = t * 10.0 + np.where(t == 2, phase_group * 20.0, 0.0) \
            + rng.normal(0, 1.0, n)
        res = fia.hierarchical_type_phase_strata(
            z_type, z_phase, y, k_type=3, phase_subdivide_frac=0.34,
            k_phase=2, k_strata=4)
        v_strat = fia.pooled_within_variance(y, res["stratum"])
        v_srs = float(y.var(ddof=1))
        assert v_strat < 0.2 * v_srs  # big reduction
        # the phase-variable type bin is the one subdivided
        sub = res["subdivided"]
        assert len(sub) == 1
        bin_of_t2 = np.bincount(res["type_bin"][t == 2]).argmax()
        assert sub[0] == bin_of_t2
        # the fine-bin count grew only for the subdivided bin
        assert len(np.unique(res["fine_bin"])) == 4  # 2 whole + 2 subs

    def test_transfer_map(self, rng):
        n = 300
        t = rng.integers(0, 2, n)
        z_type = rng.normal(0, 0.2, (n, 3)) + t[:, None] * 4.0
        z_phase = rng.normal(size=(n, 2))
        y1 = t * 5.0 + rng.normal(0, 0.5, n)
        y2 = t * -3.0 + rng.normal(0, 0.5, n)  # different target, same structure
        res = fia.hierarchical_type_phase_strata(
            z_type, z_phase, y1, k_type=2, phase_subdivide_frac=0.0,
            k_phase=2, k_strata=2)
        s_transfer = fia.apply_bin_map(res["fine_bin"], res["bin_map"])
        v = fia.pooled_within_variance(y2, s_transfer)
        assert v < 0.2 * y2.var(ddof=1)


class TestHdbscanStrata:
    def test_noise_reassignment(self, rng):
        x = np.concatenate([rng.normal(0, 0.1, (30, 2)),
                            rng.normal(5, 0.1, (30, 2)),
                            [[2.5, 2.5]]])  # an outlier
        lab = np.concatenate([np.zeros(30), np.ones(30), [-1]]).astype(int)
        out = fia.assign_noise_to_nearest(x, lab)
        assert (out >= 0).all()
        assert out[-1] in (0, 1)

    def test_density_strata_reduce_variance(self, rng):
        n = 400
        g = rng.integers(0, 4, n)
        centers = rng.normal(0, 6.0, (4, 5))
        z = centers[g] + rng.normal(0, 0.3, (n, 5))
        y = g * 8.0 + rng.normal(0, 1.0, n)
        rep = fia.density_strata_report(z, y, k_cluster=4, k_strata=4,
                                        minpts_grid=(10, 20, 40))
        assert rep["pct_of_baseline"] < 20.0
        assert rep["ess"] > 4 * n / 5
        assert rep["hdbscan"]["k"] >= 2
        assert len(rep["hdbscan"]["grid"]) == 3


class TestRemovalsStratification:
    def test_report_rows_and_variance_reduction(self, rng):
        n = 600
        g = rng.integers(0, 3, n)
        z_type = rng.normal(0, 0.3, (n, 4)) + g[:, None] * 4.0
        z_all = np.concatenate([z_type, rng.normal(size=(n, 2))], 1)
        # zero-inflated removals driven by the type structure
        removals = np.where(rng.random(n) < 0.6, 0.0,
                            rng.exponential(1.0, n) * (1 + g * 5.0))
        balive = g * 12.0 + rng.normal(0, 1.0, n)
        aux = g * 20.0 + rng.normal(0, 8.0, n)  # noisy TCC-like covariate
        rows = fia.removals_stratification_report(
            z_type, z_all, removals, transfer_target=balive, aux=aux,
            k_strata=4)
        for key in ("baseline", "aux_dh", "emb_unsup", "emb_sup_type",
                    "emb_sup", "emb_transfer"):
            assert key in rows
        assert rows["baseline"]["pct_of_baseline"] == 100.0
        # Supervised embedding strata beat the baseline. The ideal
        # type-stratified pct here is ~93: with 60% zero-inflation the
        # within-type mixture variance (0.64*m_g^2) dwarfs the between-
        # type term, so thresholds are set just above the analytic floor.
        assert rows["emb_sup"]["pct_of_baseline"] < 96.0
        assert rows["emb_sup"]["ess"] > n
        # transfer (BALIVE-trained) also helps since structure is shared
        assert rows["emb_transfer"]["pct_of_baseline"] < 98.0


class TestEmbeddingEvaluation:
    def test_adjusted_r2_penalizes_features(self, rng):
        y = rng.normal(size=100)
        pred = y + rng.normal(0, 0.1, 100)
        a_small = fia.adjusted_r2(pred, y, 2)
        a_big = fia.adjusted_r2(pred, y, 50)
        assert a_small > a_big > 0.5

    def test_linear_probe_table_ranks_informative_block(self, rng):
        n = 400
        x_good = rng.normal(size=(n, 3))
        x_noise = rng.normal(size=(n, 3))
        y = x_good @ np.ones(3) + rng.normal(0, 0.2, n)
        tab = fia.linear_probe_table({"good": x_good, "noise": x_noise,
                                      "both": np.hstack([x_good, x_noise])},
                                     y)
        assert tab["good"]["adj_r2"] > 0.9
        assert tab["noise"]["adj_r2"] < 0.2
        assert tab["both"]["adj_r2"] > 0.9
        assert tab["good"]["n_features"] == 3

    def test_blockwise_l2_normalize(self, rng):
        a = rng.normal(0, 100.0, (50, 2))  # huge scale
        b = rng.normal(0, 0.01, (50, 3))   # tiny scale
        z = fia.blockwise_l2_normalize({"a": a, "b": b})
        na = np.sqrt((z[:, :2] ** 2).sum(1)).mean()
        nb = np.sqrt((z[:, 2:] ** 2).sum(1)).mean()
        assert na == pytest.approx(1.0, rel=1e-9)
        assert nb == pytest.approx(1.0, rel=1e-9)
        z2 = fia.blockwise_l2_normalize({"a": a, "b": b},
                                        weights={"b": 2.0})
        assert np.sqrt((z2[:, 2:] ** 2).sum(1)).mean() == \
            pytest.approx(2.0, rel=1e-9)

    def test_tune_phase_weight_prefers_informative_block(self, rng):
        n = 300
        zt_tr = rng.normal(size=(n, 3))
        zp_tr = rng.normal(size=(n, 2))
        y_tr = zp_tr @ np.ones(2)  # ONLY phase matters
        zt_va = rng.normal(size=(100, 3))
        zp_va = rng.normal(size=(100, 2))
        y_va = zp_va @ np.ones(2)
        res = fia.tune_phase_weight_and_k(zt_tr, zp_tr, y_tr, zt_va, zp_va,
                                          y_va, weight_grid=(0.0, 1.0, 4.0),
                                          k_grid=(5, 10))
        # up-weighting the (only informative) phase block must win over
        # dropping it; the exact winning weight depends on the row-L2
        # scaling so assert the property, not the grid point
        assert res["best"]["phase_weight"] > 0
        w0_best = min(e["rmse"] for e in res["sweep"]
                      if e["phase_weight"] == 0.0)
        assert res["best"]["rmse"] < 0.75 * w0_best
        assert len(res["sweep"]) == 6

    def test_error_by_strata_and_recovery_classes(self, rng):
        y = np.concatenate([np.zeros(100), rng.exponential(5, 200)])
        pred = y + rng.normal(0, 0.5, 300)
        out = fia.error_by_strata(pred, y, n_deciles=5)
        assert "zero" in out and out["zero"]["n"] == 100
        assert sum(v["n"] for k, v in out.items()
                   if k.startswith("decile")) == 200
        ysfc = np.concatenate([np.full(100, np.nan),
                               rng.uniform(0, 30, 200)])
        rc = fia.response_by_recovery_class(y, ysfc)
        assert rc["never_disturbed"]["n"] == 100
        assert sum(v["n"] for k, v in rc.items()
                   if k.startswith("ysfc")) == 200


class TestFiaCLI:
    def _write_csv(self, path, rng, n=300):
        import csv
        g = rng.integers(0, 3, n)
        zt = rng.normal(0, 0.3, (n, 4)) + g[:, None] * 5.0
        zp = rng.normal(0, 0.3, (n, 2))
        y = g * 10.0 + rng.normal(0, 1.0, n)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow([f"z_type_{i}" for i in range(4)]
                       + [f"z_phase_{i}" for i in range(2)] + ["BALIVE"])
            for i in range(n):
                w.writerow(list(zt[i]) + list(zp[i]) + [y[i]])
        return y

    def test_hierarchical_cli(self, rng, tmp_path, capsys):
        csv_p = tmp_path / "emb.csv"
        self._write_csv(csv_p, rng)
        fia.main(["--csv", str(csv_p), "--target", "BALIVE",
                  "--analysis", "hierarchical", "--k-type", "3",
                  "--k-strata", "3",
                  "--output", str(tmp_path / "strata.npz")])
        import json
        out = json.loads(capsys.readouterr().out)
        assert out["pct_of_baseline"] < 30.0
        assert (tmp_path / "strata.npz").exists()
        lab = np.load(tmp_path / "strata.npz")["stratum"]
        assert len(lab) == 300

    def test_probe_table_cli(self, rng, tmp_path, capsys):
        csv_p = tmp_path / "emb.csv"
        self._write_csv(csv_p, rng)
        fia.main(["--csv", str(csv_p), "--target", "BALIVE",
                  "--analysis", "probe_table"])
        import json
        out = json.loads(capsys.readouterr().out)
        assert out["table"]["z_type"]["adj_r2"] > 0.9
        assert "z_type+z_phase" in out["table"]

    def test_skips_invalid_embed_rows(self, rng, tmp_path, capsys):
        """embed_locations writes valid=0 rows for out-of-cube points with
        every other column padded to '' (DictWriter restval); fia.main must
        skip them instead of crashing on float('')."""
        import csv
        csv_p = tmp_path / "emb.csv"
        self._write_csv(csv_p, rng, n=100)
        rows = list(csv.reader(open(csv_p)))
        rows[0] = ["index", "valid"] + rows[0]
        for i, r in enumerate(rows[1:]):
            r[:0] = [str(i), "1"]
        rows.append(["100", "0"] + [""] * (len(rows[0]) - 2))
        with open(csv_p, "w", newline="") as f:
            csv.writer(f).writerows(rows)
        fia.main(["--csv", str(csv_p), "--target", "BALIVE",
                  "--analysis", "probe_table"])
        import json
        out = json.loads(capsys.readouterr().out)
        assert out["n_plots"] == 100  # the padded row was dropped

    def test_all_rows_invalid_exits(self, tmp_path):
        csv_p = tmp_path / "emb.csv"
        csv_p.write_text("index,valid,z_type_0,BALIVE\n0,0,,\n1,0,,\n")
        with pytest.raises(SystemExit, match="no usable rows"):
            fia.main(["--csv", str(csv_p), "--target", "BALIVE",
                      "--analysis", "probe_table"])

    def test_removals_cli(self, rng, tmp_path, capsys):
        csv_p = tmp_path / "emb.csv"
        self._write_csv(csv_p, rng)
        fia.main(["--csv", str(csv_p), "--target", "BALIVE",
                  "--analysis", "removals", "--k-strata", "4"])
        import json
        out = json.loads(capsys.readouterr().out)
        assert out["table"]["emb_sup"]["pct_of_baseline"] < 50.0

    def test_report_artifacts(self, rng, tmp_path, capsys):
        """--report-dir writes the Rmd-equivalent CSV + markdown tables
        (fia_removals_stratification.Rmd:320-344 efficiency columns)."""
        import csv
        import json
        csv_p = tmp_path / "emb.csv"
        self._write_csv(csv_p, rng)
        rep = tmp_path / "report"
        fia.main(["--csv", str(csv_p), "--target", "BALIVE",
                  "--analysis", "removals", "--k-strata", "4",
                  "--report-dir", str(rep)])
        out = json.loads(capsys.readouterr().out)
        rows = list(csv.DictReader(open(rep / "removals_efficiency.csv")))
        assert {r["stratification"] for r in rows} == set(out["table"])
        base = next(r for r in rows if r["stratification"] == "baseline")
        assert float(base["pct_of_baseline"]) == 100.0
        assert float(base["within_sd"]) == pytest.approx(
            float(base["within_var"]) ** 0.5, rel=1e-3)
        sup = next(r for r in rows if r["stratification"] == "emb_sup")
        # supervised embedding strata beat the baseline -> RE > 1
        assert float(sup["re_vs_aux"]) > 1.0
        md = (rep / "removals_efficiency.md").read_text()
        assert "| stratification |" in md and "emb_sup" in md
        # the Rmd's strata-boxplot figure sheet
        assert (rep / "strata_boxplot.png").stat().st_size > 1000

        # probe-table + summary variants also produce artifacts
        fia.main(["--csv", str(csv_p), "--target", "BALIVE",
                  "--analysis", "probe_table", "--report-dir", str(rep)])
        capsys.readouterr()
        assert (rep / "probe_table_table.csv").exists()
        fia.main(["--csv", str(csv_p), "--target", "BALIVE",
                  "--analysis", "hierarchical", "--k-type", "3",
                  "--k-strata", "3", "--report-dir", str(rep)])
        capsys.readouterr()
        summary = list(csv.DictReader(
            open(rep / "hierarchical_summary.csv")))
        assert len(summary) == 1
        assert float(summary[0]["pct_of_baseline"]) < 30.0


class TestEvtTypology:
    """fia_evt_type_clustering.Rmd ports: EVT-centroid Ward segments,
    cohesion metrics, cannot-link constrained typology."""

    def _data(self, rng, n=600):
        # 4 EVTs in 2 latent groups: 7001/7002 near each other, 7003/7004
        # near each other; plus a rare EVT 7005 near group 2.
        evt = rng.choice([7001, 7002, 7003, 7004], n)
        base = {7001: 0.0, 7002: 0.6, 7003: 8.0, 7004: 8.6, 7005: 8.3}
        z = np.asarray([base[e] for e in evt])[:, None] \
            + rng.normal(0, 0.2, (n, 3))
        evt = np.concatenate([evt, [7005] * 5])
        z = np.concatenate([z, 8.3 + rng.normal(0, 0.2, (5, 3))])
        return z.astype(np.float32), evt

    def test_segments_and_rare_evt_attach(self, rng):
        z, evt = self._data(rng)
        res = fia.evt_centroid_segments(z, evt, k=2, min_evt_n=20)
        # the two latent groups separate; the rare EVT joins group 2
        assert res["evt_group"][7001] == res["evt_group"][7002]
        assert res["evt_group"][7003] == res["evt_group"][7004]
        assert res["evt_group"][7001] != res["evt_group"][7003]
        assert res["evt_group"][7005] == res["evt_group"][7003]
        assert res["cohesion"] > 0.95
        assert 0.0 <= res["frac_single_segment"] <= 1.0
        assert len(res["segments"]) == len(evt)

    def test_cannot_link_macro_purity(self, rng):
        z, evt = self._data(rng)
        # adversarial macro: 7001/7003 are "Tree", 7002/7004 not -- the
        # unconstrained Ward would merge within latent groups; cannot-link
        # must keep macro-pure segments
        macro = {7001: True, 7003: True, 7002: False, 7004: False,
                 7005: False}
        res = fia.evt_centroid_segments(z, evt, k=2, min_evt_n=20,
                                        macro=macro)
        for c, s in res["evt_group"].items():
            assert res["seg_macro"][s] == macro[c], (c, s)
        assert "leakage" in res
        # leakage: embedding-only assignment crosses macros since the
        # latent structure conflicts with the macro split
        assert 0.0 <= res["leakage"] <= 1.0

    def test_cohesion_metrics_analytic(self):
        evt = np.array([1, 1, 1, 2, 2, 2])
        seg = np.array([0, 0, 1, 1, 1, 1])
        coh, single = fia.evt_cohesion(evt, seg)
        assert coh == pytest.approx(5 / 6)
        assert single == pytest.approx(0.5)
