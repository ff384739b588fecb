"""FRL data pipeline tests: bindings parse, v2 cube, dataset loading,
feature builder (+ whitening), stats calculator, anchor sampling,
spatial utils."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forest_tpu.data import anchor_sampling
from forest_tpu.data.bindings import parse_bindings
from forest_tpu.data.cube_v2 import build_synthetic_v2_cube, synthetic_bindings
from forest_tpu.data.feature_builder import FeatureBuilder
from forest_tpu.data.frl_dataset import ForestDatasetV2
from forest_tpu.data.stats import OnlineCovarianceComputer, StatsCalculator
from forest_tpu.ops.whitening import apply_whitening, whitening_matrix
from forest_tpu.utils import spatial as sp


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("frl")
    build_synthetic_v2_cube(root / "cube.zarr", height=96, width=96,
                            chunk_yx=32, seed=0)
    bindings = parse_bindings(synthetic_bindings(
        root / "cube.zarr", root / "stats.json"))
    ds = ForestDatasetV2(bindings, split=None, patch_size=32,
                         split_block_size=(1, 1))
    calc = StatsCalculator(bindings, ds)
    stats = calc.compute(n_patches=6)
    (root / "stats.json").write_text(json.dumps(stats))
    fb = FeatureBuilder(bindings, stats)
    return root, bindings, ds, stats, fb


class TestBindings:
    def test_parse(self, env):
        _, b, _, _, _ = env
        assert b.time_window.num_years == 15
        assert "type_encoder_input" in b.features
        f = b.get_feature("phase_ccdc")
        assert f.temporal and f.covariance.calculate
        assert b.get_feature("type_encoder_input").channel_names[0] == \
            "static.elevation"
        s = b.get_sampling_strategy("grid-plus-supplement")
        assert s["supplement"]["n"] == 16

    def test_env_interpolation(self, env, monkeypatch, tmp_path):
        monkeypatch.setenv("ZARR_ROOT", "/data/zroot")
        d = {"zarr": {"path": "${ZARR_ROOT}/c.zarr"}}
        b = parse_bindings(d)
        assert b.zarr_path == "/data/zroot/c.zarr"

    def test_missing_source_raises(self, env):
        root, b, _, _, _ = env
        import copy
        bb = copy.deepcopy(b)
        bb.dataset["static"].channels[0].source = "static/nope/data/x"
        with pytest.raises(FileNotFoundError, match="nope"):
            ForestDatasetV2(bb, split=None, patch_size=32)


class TestDataset:
    def test_patch_groups_and_shapes(self, env):
        _, b, ds, _, _ = env
        p = ds.get_patch(0)
        assert p["static"].shape == (32, 32, 4)
        assert p["annual"].shape == (15, 32, 32, 4)
        assert p["static_mask"].shape == (32, 32, 3)
        assert p["annual_mask"].shape == (15, 32, 32, 1)
        # formula channel: t/(T-1)
        tpos = p["annual"][..., 3]
        np.testing.assert_allclose(tpos[0], 0.0)
        np.testing.assert_allclose(tpos[-1], 1.0)

    def test_splits_partition(self, env):
        _, b, ds, _, _ = env
        ns = [len(ForestDatasetV2(b, split=s, patch_size=32,
                                  split_block_size=(1, 1)).patches)
              for s in ("train", "val", "test")]
        assert all(n > 0 for n in ns)
        assert sum(ns) == len(ds.patches)

    def test_epoch_modes(self, env):
        _, b, _, _, _ = env
        ds = ForestDatasetV2(b, split="train", patch_size=32,
                             split_block_size=(1, 1), epoch_mode="number",
                             sample_number=2)
        ds.on_epoch_start()
        assert len(ds) == 2

    def test_ok_if_binarizes(self, env):
        _, _, ds, _, _ = env
        p = ds.get_patch(0)
        forest = p["static_mask"][..., 2]
        assert set(np.unique(forest)).issubset({0.0, 1.0})


class TestFeatureBuilder:
    def test_normalized_feature(self, env):
        _, _, ds, _, fb = env
        p = ds.get_patch(0)
        x, mask = fb.build_feature("type_encoder_input", p)
        assert x.shape == (32, 32, 4)
        v = np.asarray(x)[np.asarray(mask[..., 0])][:, 0]
        assert abs(v.mean()) < 2.0  # z-scored elevation roughly centered
        assert np.all(np.isfinite(np.asarray(x)))

    def test_temporal_feature_with_whitening(self, env):
        _, _, ds, stats, fb = env
        p = ds.get_patch(0)
        x, mask = fb.build_feature("phase_ccdc", p)
        assert x.shape == (15, 32, 32, 3)
        assert np.abs(np.asarray(x)).max() <= 5.0 + 1e-5  # whitening clip
        # whitened valid pixels should be roughly decorrelated
        rows = np.asarray(x).reshape(-1, 3)
        ok = np.asarray(mask).reshape(-1, 3).all(1)
        c = np.cov((rows[ok] - rows[ok].mean(0)).T)
        off = np.abs(c - np.diag(np.diag(c))).max()
        assert off < 0.5

    def test_at_locations_bit_identical(self, env):
        """The ~230x cheaper anchor-only build must match the full grid
        (feature_builder.py:180-233 contract)."""
        _, _, ds, _, fb = env
        p = ds.get_patch(0)
        coords = jnp.asarray([[5, 7], [20, 3], [31, 31]], jnp.int32)
        for fname in ("type_encoder_input", "phase_ccdc"):
            full, fmask = fb.build_feature(fname, p)
            loc, lmask = fb.build_feature_at_locations(fname, p, coords)
            if full.ndim == 4:  # temporal [T, H, W, C] -> [N, T, C]
                expect = np.stack([np.asarray(full[:, r, c])
                                   for r, c in np.asarray(coords)])
            else:
                expect = np.stack([np.asarray(full[r, c])
                                   for r, c in np.asarray(coords)])
            np.testing.assert_allclose(np.asarray(loc), expect, atol=1e-6)

    def test_builds_under_jit(self, env):
        _, _, ds, _, fb = env
        p = {k: jnp.asarray(v) for k, v in ds.get_patch(0).items()}

        @jax.jit
        def f(p):
            x, m = fb.build_feature("type_encoder_input", p)
            return x.sum()

        assert np.isfinite(float(f(p)))


class TestStats:
    def test_entries(self, env):
        _, _, _, stats, _ = env
        e = stats["type_encoder_input"]["static.elevation"]
        for k in ("mean", "sd", "min", "max", "q50"):
            assert k in e
        assert e["min"] <= e["q50"] <= e["max"]

    def test_covariance_present(self, env):
        _, _, _, stats, _ = env
        cov = stats["phase_ccdc"]["__covariance__"]
        m = np.asarray(cov["matrix"])
        assert m.shape == (3, 3)
        assert np.allclose(m, m.T)

    def test_online_covariance_matches_numpy(self, rng):
        x = rng.normal(size=(1000, 4))
        occ = OnlineCovarianceComputer(4)
        for i in range(0, 1000, 100):
            occ.update(x[i:i + 100])
        np.testing.assert_allclose(occ.covariance(), np.cov(x.T),
                                   rtol=1e-8)
        np.testing.assert_allclose(occ.mean, x.mean(0), rtol=1e-8)

    def test_online_covariance_nan_rows_dropped(self, rng):
        x = rng.normal(size=(100, 3))
        x[10, 0] = np.nan
        occ = OnlineCovarianceComputer(3)
        occ.update(x)
        assert occ.n == 99


class TestWhitening:
    def test_whitens_to_identity(self, rng):
        a = rng.normal(size=(4, 4))
        cov = a @ a.T + np.eye(4)
        w = whitening_matrix(cov)
        x = rng.multivariate_normal(np.zeros(4), cov, size=20000)
        out = np.asarray(apply_whitening(jnp.asarray(x, jnp.float32),
                                         jnp.asarray(w),
                                         jnp.zeros(4), clip=50.0))
        c = np.cov(out.T)
        np.testing.assert_allclose(c, np.eye(4), atol=0.15)

    def test_nan_safe_and_clipped(self):
        w = jnp.eye(3)
        x = jnp.asarray([[1.0, jnp.nan, 100.0]])
        out = apply_whitening(x, w, jnp.zeros(3), clip=5.0)
        np.testing.assert_allclose(np.asarray(out)[0], [1.0, 0.0, 5.0])


class TestAnchorSampling:
    def test_grid_count_and_bounds(self):
        key = jax.random.key(0)
        coords = anchor_sampling.sample_anchors_grid(
            key, 64, 64, stride=8, exclude_border=4, jitter_radius=2)
        ny, nx = anchor_sampling.grid_anchor_count(64, 64, 8, 4)
        assert coords.shape == (ny * nx, 2)
        c = np.asarray(coords)
        assert c.min() >= 4 and c.max() <= 59

    def test_jitter_varies(self):
        c1 = anchor_sampling.sample_anchors_grid(jax.random.key(1),
                                                 64, 64, 8, 4, 3)
        c2 = anchor_sampling.sample_anchors_grid(jax.random.key(2),
                                                 64, 64, 8, 4, 3)
        assert not np.array_equal(np.asarray(c1), np.asarray(c2))

    def test_supplement_respects_weights(self):
        w = jnp.zeros((32, 32)).at[10:12, 10:12].set(1.0)
        coords, valid = anchor_sampling.sample_anchors_supplement(
            jax.random.key(0), w, 3)
        c = np.asarray(coords)[np.asarray(valid)]
        assert np.asarray(valid).all()
        assert np.all((c >= 10) & (c < 12))

    def test_supplement_without_replacement(self):
        # Reference contract (anchor_sampling.py:166): multinomial with
        # replacement=False -- only as many valid draws as positive-weight
        # pixels, and no duplicates among them.
        w = jnp.zeros((32, 32)).at[10:12, 10:12].set(1.0)
        coords, valid = anchor_sampling.sample_anchors_supplement(
            jax.random.key(0), w, 50)
        v = np.asarray(valid)
        assert v.sum() == 4
        c = np.asarray(coords)[v]
        assert np.all((c >= 10) & (c < 12))
        assert len({(int(r), int(q)) for r, q in c}) == 4

    def test_zero_weights_invalid(self):
        w = jnp.zeros((16, 16))
        _, valid = anchor_sampling.sample_anchors_supplement(
            jax.random.key(0), w, 5)
        assert not np.any(valid)

    def test_inverse_frequency(self):
        vals = jnp.concatenate([jnp.zeros(90), jnp.ones(10)]).reshape(10, 10)
        mask = jnp.ones((10, 10))
        w = anchor_sampling.resolve_weights([mask], vals,
                                            "inverse-frequency")
        w = np.asarray(w)
        # rare class gets higher weight
        assert w[9, 9] > w[0, 0]
        np.testing.assert_allclose(w.sum(), 2.0, atol=1e-5)

    def test_gumbel_topk_large_axis_approx_path(self):
        # >4096 elements dispatches to approx_max_k (recall 0.95); draws
        # must stay inside the positive-weight set and stay duplicate-free
        from forest_tpu.ops.topk import gumbel_weighted_topk
        w = jnp.zeros(8192).at[100:164].set(1.0)
        idx, valid = gumbel_weighted_topk(jax.random.key(0), w, 32)
        i = np.asarray(idx)[np.asarray(valid)]
        assert len(i) >= 16  # approx recall may drop a few, never most
        assert np.all((i >= 100) & (i < 164))
        assert len(set(i.tolist())) == len(i)

    def test_topk_maybe_approx_exact_below_threshold(self):
        from forest_tpu.ops.topk import topk_maybe_approx
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(7, 100)).astype(np.float32))
        _, i = topk_maybe_approx(x, 5)
        _, i2 = jax.lax.top_k(x, 5)
        assert np.array_equal(np.asarray(i), np.asarray(i2))

    def test_sampler_from_config(self, env):
        _, b, _, _, _ = env
        samp = anchor_sampling.build_anchor_sampler(
            b.get_sampling_strategy("grid-plus-supplement"))
        ny, nx = anchor_sampling.grid_anchor_count(32, 32, 8, 4)
        n_exp = ny * nx + 16
        assert samp.n_anchors(32, 32) == n_exp
        grids = {"static_mask.aoi": jnp.ones((32, 32)),
                 "static_mask.forest": jnp.ones((32, 32))}
        coords, valid = samp(jax.random.key(0), grids, 32, 32)
        assert coords.shape == (n_exp, 2)


class TestSpatialUtils:
    def test_extract(self, rng):
        g = jnp.asarray(rng.normal(size=(8, 8, 3)), jnp.float32)
        coords = jnp.asarray([[1, 2], [7, 0]])
        out = sp.extract_at_locations(g, coords)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(g[1, 2]))

    def test_extract_temporal(self, rng):
        g = jnp.asarray(rng.normal(size=(5, 8, 8, 3)), jnp.float32)
        coords = jnp.asarray([[1, 2]])
        out = sp.extract_temporal_at_locations(g, coords)
        assert out.shape == (1, 5, 3)
        np.testing.assert_allclose(np.asarray(out[0]),
                                   np.asarray(g[:, 1, 2]))

    def test_knn_pairs_offsets(self):
        mask = jnp.ones((16, 16))
        anchors = jnp.asarray([[8, 8]])
        aidx, nbr, valid = sp.spatial_knn_pairs(anchors, mask, k=4,
                                                max_radius=2)
        got = {tuple(x) for x, ok in zip(np.asarray(nbr), np.asarray(valid))
               if ok}
        # 4 closest offsets are the rook neighbors
        assert got == {(7, 8), (9, 8), (8, 7), (8, 9)}

    def test_knn_pairs_bounds_and_mask(self):
        mask = jnp.ones((16, 16)).at[0, 1].set(0)
        anchors = jnp.asarray([[0, 0]])
        _, nbr, valid = sp.spatial_knn_pairs(anchors, mask, k=4,
                                             max_radius=1)
        got = {tuple(x) for x, ok in zip(np.asarray(nbr), np.asarray(valid))
               if ok}
        assert got == {(1, 0)}  # (0,-1)/(−1,0) out of bounds; (0,1) masked

    def test_negative_pairs_ring(self):
        mask = jnp.ones((64, 64))
        anchors = jnp.asarray([[32, 32], [10, 10]])
        aidx, nbr, valid = sp.spatial_negative_pairs(
            anchors, mask, jax.random.key(0), min_distance=16.0,
            max_distance=30.0, n_per_anchor=4)
        a = np.asarray(anchors)[np.asarray(aidx)]
        d = np.sqrt(((np.asarray(nbr) - a) ** 2).sum(1))
        ok = np.asarray(valid)
        assert ok.sum() > 0
        assert np.all(d[ok] >= 16.0) and np.all(d[ok] <= 30.0)

    def test_negative_slots_match_pairs_view(self):
        """spatial_negative_slots is the pool-factorized form the FRL step
        consumes (one-hot einsums over the pool instead of per-anchor
        coordinate gathers); materializing pool[sel] must reproduce
        spatial_negative_pairs exactly on the same key, and slot ids must
        reference in-pool valid pixels inside the ring."""
        mask = jnp.ones((64, 64)).at[:, :8].set(0)
        anchors = jnp.asarray([[32, 32], [10, 10], [50, 20]])
        key = jax.random.key(3)
        kw = dict(min_distance=12.0, max_distance=28.0, n_per_anchor=5)
        pool, pool_ok, sel, sel_ok = sp.spatial_negative_slots(
            anchors, mask, key, **kw)
        aidx, nbr, valid = sp.spatial_negative_pairs(anchors, mask, key,
                                                     **kw)
        np.testing.assert_array_equal(
            np.asarray(pool)[np.asarray(sel)].reshape(-1, 2),
            np.asarray(nbr))
        np.testing.assert_array_equal(np.asarray(sel_ok).reshape(-1),
                                      np.asarray(valid))
        pool_np, sel_np = np.asarray(pool), np.asarray(sel)
        ok_np = np.asarray(sel_ok)
        assert ok_np.sum() > 0
        for i in range(anchors.shape[0]):
            for j in range(kw["n_per_anchor"]):
                if not ok_np[i, j]:
                    continue
                p = pool_np[sel_np[i, j]]
                assert np.asarray(pool_ok)[sel_np[i, j]]
                assert p[1] >= 8  # masked columns never enter the pool
                dd = np.sqrt(((p - np.asarray(anchors)[i]) ** 2).sum())
                assert 12.0 <= dd <= 28.0


class TestDerivedFeatures:
    def test_temporal_deltas(self, rng):
        import jax.numpy as jnp
        from forest_tpu.data import derived_features as df
        x = jnp.asarray(rng.normal(size=(5, 4, 4, 2)), jnp.float32)
        d = df.temporal_deltas(x)
        assert d.shape == x.shape
        np.testing.assert_allclose(np.asarray(d[0]), 0.0)
        np.testing.assert_allclose(np.asarray(d[1]),
                                   np.asarray(x[1] - x[0]), atol=1e-6)
        # series layout [N, T, C]
        s = jnp.asarray(rng.normal(size=(3, 5, 2)), jnp.float32)
        ds = df.temporal_deltas(s)
        np.testing.assert_allclose(np.asarray(ds[:, 2]),
                                   np.asarray(s[:, 2] - s[:, 1]), atol=1e-6)

    def test_sobel_magnitude(self, rng):
        import jax.numpy as jnp
        from forest_tpu.data import derived_features as df
        # vertical edge -> nonzero magnitude at the edge
        x = jnp.zeros((8, 8, 1)).at[:, 4:, :].set(1.0)
        m = np.asarray(df.sobel_channels(x))
        assert m[4, 4, 0] > 0.5
        assert m[4, 1, 0] < 1e-3

    def test_rolling_mean_nan_safe(self, rng):
        import jax.numpy as jnp
        from forest_tpu.data import derived_features as df
        s = jnp.asarray(rng.normal(size=(2, 6, 1)), jnp.float32)
        s = s.at[0, 3, 0].set(jnp.nan)
        m = df.rolling_mean(s, 3)
        assert np.isfinite(np.asarray(m[0, 2, 0]))


class TestCubeV2CLI:
    def test_main_generates(self, tmp_path):
        from forest_tpu.data import cube_v2, zarrlite as zl
        cube_v2.main([str(tmp_path), "--height", "64", "--width", "64",
                      "--chunk", "32"])
        root = zl.open_zarr(tmp_path / "cube.zarr")
        assert "annual" in root and "static" in root
        assert (tmp_path / "bindings.yaml").exists()


class TestChannelMajorWire:
    """Channel-major batch assembly (set_wire_layout) + wire round-trip
    must reproduce the plain channel-last collate exactly."""

    def test_roundtrip_matches_plain(self, env):
        from forest_tpu.data import wire

        _, bindings, ds, _, _ = env
        ds.on_epoch_start()
        idx = [0, 1, len(ds) - 1]
        try:
            ds.set_wire_layout(True)
            cm = ds.load_batch(idx)
        finally:
            ds.set_wire_layout(False)
        plain = ds.load_batch(idx)
        assert set(k.replace("__cm", "") for k in cm) == set(plain)
        for k in cm:
            if k == "__window__":
                np.testing.assert_array_equal(cm[k], plain[k])
        # f32 wire (no bf16 cast): decode must be bit-exact vs plain.
        dec = jax.jit(wire.decode_wire_batch)(
            {k: jnp.asarray(v) for k, v in cm.items()})
        for k, v in plain.items():
            got = np.asarray(dec[k])
            assert got.shape == v.shape, k
            np.testing.assert_array_equal(got, v, err_msg=k)

    def test_bf16_wire_skips_exact_groups(self, env):
        from forest_tpu.data import wire

        _, bindings, ds, _, _ = env
        ds.on_epoch_start()
        try:
            ds.set_wire_layout(True)
            cm = ds.load_batch([0, 1])
        finally:
            ds.set_wire_layout(False)
        enc = wire.encode_wire_batch(cm, skip=("static_categorical",))
        for k, v in enc.items():
            if k == "__window__":
                continue
            base = k[:-len("__cm")] if k.endswith("__cm") else k
            want = (np.float32 if ("categorical" in base
                                   or base == "static_categorical")
                    else jnp.bfloat16)
            assert v.dtype == want, (k, v.dtype)
        dec = jax.jit(wire.decode_wire_batch)(
            {k: jnp.asarray(v) for k, v in enc.items()})
        plain = ds.load_batch([0, 1])
        for k, v in plain.items():
            got = np.asarray(dec[k])
            assert got.shape == v.shape and got.dtype == np.float32 \
                or k == "__window__", k
            if "categorical" in k:
                np.testing.assert_array_equal(got, v, err_msg=k)
            elif k != "__window__":
                f = v[np.isfinite(v)]
                g = got[np.isfinite(v)]
                tol = np.maximum(np.abs(f) * 8e-3, 1e-6)
                assert np.all(np.abs(g - f) <= tol), k
