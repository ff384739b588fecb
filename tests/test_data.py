"""Data layer tests: zarr-lite roundtrip, checkerboard split arithmetic,
chunk-locked sampler, schema collapse, dataset batches, prefetch loader."""
import json

import numpy as np
import pytest

from forest_tpu.data import checkerboard, schema as schema_mod, zarrlite as zl
from forest_tpu.data.cube import build_synthetic_cube
from forest_tpu.data.loader import PrefetchLoader
from forest_tpu.data.samplers import ChunkBatchSampler, ReservoirSampler
from forest_tpu.data.vqvae_dataset import IGNORE_INDEX, VQVAEDataset


class TestZarrLite:
    def test_roundtrip_blosc(self, tmp_path, rng):
        a = zl.create_array(tmp_path / "a", (10, 7, 33), (5, 7, 16),
                            np.float32, fill_value=float("nan"))
        data = rng.normal(size=(10, 7, 33)).astype(np.float32)
        a[:] = data
        b = zl.ZarrArray(tmp_path / "a")
        np.testing.assert_array_equal(b[:], data)
        # partial, cross-chunk slice
        np.testing.assert_array_equal(b[2:9, 1:6, 10:30],
                                      data[2:9, 1:6, 10:30])

    def test_fill_value_for_missing_chunks(self, tmp_path):
        a = zl.create_array(tmp_path / "a", (8, 8), (4, 4), np.float32,
                            fill_value=float("nan"))
        a[0:4, 0:4] = 1.0  # only one chunk written
        out = a[:]
        assert np.all(out[:4, :4] == 1.0)
        assert np.all(np.isnan(out[4:, 4:]))

    def test_int_dtypes_and_zlib(self, tmp_path, rng):
        a = zl.create_array(tmp_path / "a", (6, 6), (4, 4), np.int16,
                            fill_value=-1, compressor={"id": "zlib",
                                                       "level": 5})
        d = rng.integers(-5, 100, size=(6, 6)).astype(np.int16)
        a[:] = d
        np.testing.assert_array_equal(zl.ZarrArray(tmp_path / "a")[:], d)

    def test_groups_and_attrs(self, tmp_path):
        g = zl.create_group(tmp_path / "g")
        sub = g.create_group("annual")
        sub.create_array("x", (4,), (4,), np.int64, compressor=None)
        g.attrs["names"] = ["a", "b"]
        g.write_attrs()
        g2 = zl.open_zarr(tmp_path / "g")
        assert g2.attrs["names"] == ["a", "b"]
        assert "annual" in g2
        assert isinstance(g2["annual/x"], zl.ZarrArray)

    def test_chunk_exact_read(self, tmp_path, rng):
        a = zl.create_array(tmp_path / "a", (8, 8), (4, 4), np.float32)
        d = rng.normal(size=(8, 8)).astype(np.float32)
        a[:] = d
        np.testing.assert_array_equal(a.read_chunk((1, 0)), d[4:8, 0:4])


class TestCheckerboard:
    def test_codes_match_reference_arithmetic(self):
        """Independent recomputation of forest_dataset_v2.py:278-301."""
        p, (bh, bw) = 256, (4, 4)
        for pr in range(0, 40):
            for pc in range(0, 40):
                br, bc = pr // bh, pc // bw
                a = (br // 2 + bc // 2) % 2
                b = (br + bc) % 4
                expect = 3 if (a == 0 and b == 0) else \
                    2 if (a == 0 and b == 2) else 1
                got = checkerboard.split_code(pr * p, pc * p, p, (bh, bw))
                assert got == expect, (pr, pc)

    def test_vectorized_matches_scalar(self):
        ys = np.arange(0, 2560, 256)
        xs = np.arange(0, 2560, 256)
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        codes = checkerboard.split_code(yy.ravel(), xx.ravel(), 256)
        for y, x, c in zip(yy.ravel(), xx.ravel(), codes):
            assert c == checkerboard.split_code(int(y), int(x), 256)

    def test_all_splits_nonempty_and_disjoint(self):
        ys, xs = np.meshgrid(np.arange(50), np.arange(50), indexing="ij")
        codes = checkerboard.split_code(ys.ravel() * 64, xs.ravel() * 64, 64)
        u, c = np.unique(codes, return_counts=True)
        assert set(u) == {1, 2, 3}
        # train is the majority split
        assert c[0] > c[1] and c[0] > c[2]


class TestChunkBatchSampler:
    def test_batches_stay_within_chunk(self):
        xy = [np.arange(10), np.arange(10, 15), np.array([]),
              np.arange(15, 40)]
        s = ChunkBatchSampler(xy, batch_size=4, seed=0)
        chunk_of = {}
        for cid, arr in enumerate(xy):
            for i in arr:
                chunk_of[int(i)] = cid
        for batch in s:
            cids = {chunk_of[int(i)] for i in batch}
            assert len(cids) == 1

    def test_sharding_disjoint(self):
        xy = [np.arange(i * 10, i * 10 + 10) for i in range(6)]
        a = ChunkBatchSampler(xy, 5, seed=0, num_shards=2, shard_id=0)
        b = ChunkBatchSampler(xy, 5, seed=0, num_shards=2, shard_id=1)
        seen_a = {int(i) for batch in a for i in batch}
        seen_b = {int(i) for batch in b for i in batch}
        assert not (seen_a & seen_b)
        assert len(seen_a) + len(seen_b) == 60

    def test_replacement_pads_tail(self):
        xy = [np.arange(7)]
        s = ChunkBatchSampler(xy, 4, replacement_within_chunk=True, seed=0)
        batches = list(s)
        assert all(len(b) == 4 for b in batches)

    def test_reservoir_uniformity(self):
        rs = ReservoirSampler(100, seed=0)
        for i in range(0, 10000, 500):
            rs.add(np.arange(i, i + 500)[:, None])
        buf = rs.sample()
        assert buf.shape == (100, 1)
        assert rs.n_seen == 10000
        # roughly uniform over range: mean near 5000
        assert 3500 < buf.mean() < 6500


class TestSchema:
    def test_collapse_keeps_frequent(self):
        raw = np.array([10, 20, 30, 40])
        counts = np.array([1000, 500, 10, 1])
        e = schema_mod.collapse_vocab(raw, counts, samples_per_epoch=1511,
                                      min_hits_per_epoch=5,
                                      mass_coverage=1.0, vocab_cap=100)
        # expected hits: 1000, 500, 10, 1 -> keep first three
        assert e["raw_values"] == [10, 20, 30]
        assert e["num_ids"] == 5
        assert e["counts_per_id"][1] == 1.0  # UNK mass

    def test_mass_coverage_cut(self):
        raw = np.arange(10)
        counts = np.array([900] + [100] * 9)
        e = schema_mod.collapse_vocab(raw, counts, samples_per_epoch=1e9,
                                      min_hits_per_epoch=0,
                                      mass_coverage=0.5, vocab_cap=100)
        assert e["raw_values"] == [0]

    def test_vocab_cap(self):
        raw = np.arange(50)
        counts = np.full(50, 100)
        e = schema_mod.collapse_vocab(raw, counts, samples_per_epoch=1e9,
                                      min_hits_per_epoch=0, mass_coverage=1.0,
                                      vocab_cap=10)
        assert e["num_ids"] == 10

    def test_apply_schema_miss_unk(self):
        e = {"raw_values": [100, 200], "num_ids": 4}
        raw = np.array([100, 200, 300, -1, 5])
        dense = schema_mod.apply_schema(raw, e)
        np.testing.assert_array_equal(dense, [2, 3, 1, 0, 1])

    def test_dense_to_raw_roundtrip(self):
        e = {"raw_values": [100, 200], "num_ids": 4}
        m = schema_mod.dense_to_raw_map(e)
        np.testing.assert_array_equal(m, [-1, -1, 100, 200])


@pytest.fixture(scope="module")
def cube_and_schema(tmp_path_factory):
    root = tmp_path_factory.mktemp("cube")
    cube = build_synthetic_cube(root / "cube.zarr", height=96, width=96,
                                chunk_yx=32, patch_size=32, seed=0)
    sp = schema_mod.build_and_save_schema(cube, root / "run", batch_size=64,
                                          steps_per_epoch=100,
                                          min_hits_per_epoch=1)
    return root / "cube.zarr", sp


class TestVQVAEDataset:
    def test_splits_partition_aoi(self, cube_and_schema):
        zp, sp = cube_and_schema
        n = 0
        for split in ["train", "val", "test"]:
            ds = VQVAEDataset(zp, sp, split=split, block_size=(1, 1))
            assert len(ds) > 0, split
            n += len(ds)
        ds_all = VQVAEDataset(zp, sp, split=None, block_size=(1, 1))
        assert n == len(ds_all)

    def test_batch_contract(self, cube_and_schema):
        zp, sp = cube_and_schema
        ds = VQVAEDataset(zp, sp, split="train", block_size=(1, 1))
        s = ChunkBatchSampler(ds.xy_by_chunk, 16, seed=0)
        idx = next(iter(s))
        b = ds.load_batch(idx)
        B, T = 16, 5
        assert b["cont"].shape == (B, T, 8)
        assert b["cat"].shape == (B, T, 2)
        assert b["naip"].shape == (B, 3, 3, 3)
        assert b["canopy"].shape == (B,)
        assert b["yx"].shape == (B, 2)
        assert set(b["cat_target"]) == {"cat_0", "cat_1"}
        tgt = b["cat_target"]["cat_0"]
        assert tgt.shape == (B, T)
        # normalized continuous ~ standard scale where finite
        finite = np.isfinite(b["cont"])
        assert np.abs(b["cont"][finite].mean()) < 1.0

    def test_ignore_index_semantics(self, cube_and_schema):
        zp, sp = cube_and_schema
        ds = VQVAEDataset(zp, sp, split="train", block_size=(1, 1))
        s = ChunkBatchSampler(ds.xy_by_chunk, 64, seed=1)
        for i, idx in enumerate(s):
            b = ds.load_batch(idx)
            for name, tgt in b["cat_target"].items():
                valid = tgt != IGNORE_INDEX
                assert np.all(tgt[valid] >= 2)  # MISS/UNK never targets
            if i > 3:
                break

    def test_class_weights(self, cube_and_schema):
        zp, sp = cube_and_schema
        ds = VQVAEDataset(zp, sp, split="train", block_size=(1, 1))
        w = ds.class_weights_by_cat_name("cat_0")
        assert w[0] == 0 and w[1] == 0
        nz = w[w > 0]
        assert abs(nz.mean() - 1.0) < 1e-3

    def test_prefetch_loader(self, cube_and_schema):
        zp, sp = cube_and_schema
        ds = VQVAEDataset(zp, sp, split="train", block_size=(1, 1))
        s = ChunkBatchSampler(ds.xy_by_chunk, 32, seed=0, drop_last=True)
        n = 0
        for batch in PrefetchLoader(ds, s, num_workers=4, prefetch=2):
            assert batch["cont"].shape[0] == 32
            n += 1
        assert n == len(s)

    def test_prefetch_loader_close_stops_feeder(self, cube_and_schema):
        """close() tears down an ABANDONED iteration immediately instead of
        waiting for generator GC (which otherwise keeps the feeder running
        and prefetch+num_workers decoded batches pinned)."""
        import itertools
        import threading
        zp, sp = cube_and_schema
        ds = VQVAEDataset(zp, sp, split="train", block_size=(1, 1))
        endless = itertools.chain.from_iterable(
            ChunkBatchSampler(ds.xy_by_chunk, 32, seed=e)
            for e in range(10_000))
        before = threading.active_count()
        with PrefetchLoader(ds, endless, num_workers=2,
                            prefetch=2) as loader:
            it = iter(loader)
            next(it)                       # iteration live, then abandoned
            assert loader._active          # feeder registered
        # context exit -> close(): feeder joined, registry drained
        assert not loader._active
        assert threading.active_count() <= before + 2  # pool threads idle
        loader.close()                     # idempotent


class TestDerivedStatsPipeline:
    """DerivedStatsComputer/loader (reference derived_statistics_computer
    + loader roles): single-pass derived-feature stats persisted to zarr
    attrs and read back into normalizers."""

    def test_compute_save_load(self, tmp_path):
        import jax
        jax.config.update("jax_platforms", "cpu")
        from forest_tpu.data.bindings import parse_bindings
        from forest_tpu.data.cube_v2 import (build_synthetic_v2_cube,
                                             synthetic_bindings)
        from forest_tpu.data.frl_dataset import ForestDatasetV2
        from forest_tpu.data.stats import (DerivedStatsComputer,
                                           derived_normalizer,
                                           load_derived_stats)

        cube = f"{tmp_path}/cube.zarr"
        build_synthetic_v2_cube(cube, height=96, width=96)
        b = parse_bindings(synthetic_bindings(cube, "/dev/null"))
        ds = ForestDatasetV2(b, split=None, patch_size=32)
        src = next(iter(b.dataset))
        ch = b.dataset[src].channels[0].name
        specs = [
            {"name": "d1", "source": f"{src}.{ch}", "kind": "delta"},
            {"name": "sob", "source": f"{src}.{ch}", "kind": "sobel"},
            {"name": "roll", "source": f"{src}.{ch}", "kind": "rolling",
             "window": 3},
        ]
        comp = DerivedStatsComputer(b, ds, specs, seed=0)
        stats = comp.compute_and_save(n_patches=4)
        for name in ("d1", "sob", "roll"):
            e = stats[name]
            assert e["n_seen"] > 0
            assert np.isfinite([e["mean"], e["sd"], e["q50"]]).all()
            assert e["min"] <= e["q50"] <= e["max"]
        cov = np.asarray(stats["__covariance__"]["matrix"])
        assert cov.shape == (3, 3)
        assert np.allclose(cov, cov.T, atol=1e-9)

        back = load_derived_stats(cube)
        assert back["d1"]["mean"] == stats["d1"]["mean"]
        n = derived_normalizer(back["sob"])
        z = n.forward(np.asarray([back["sob"]["mean"]]))
        assert abs(float(z[0])) < 1e-6  # mean maps to ~0 under zscore

    def test_empty_dataset_no_crash(self, tmp_path):
        """Zero-patch datasets (e.g. a split whose checkerboard blocks all
        landed elsewhere) must yield placeholder stats, not IndexError in
        the covariance shape probe (regression)."""
        import jax
        jax.config.update("jax_platforms", "cpu")
        from forest_tpu.data.bindings import parse_bindings
        from forest_tpu.data.cube_v2 import (build_synthetic_v2_cube,
                                             synthetic_bindings)
        from forest_tpu.data.frl_dataset import ForestDatasetV2
        from forest_tpu.data.stats import DerivedStatsComputer

        cube = f"{tmp_path}/cube.zarr"
        build_synthetic_v2_cube(cube, height=64, width=64, chunk_yx=32)
        b = parse_bindings(synthetic_bindings(cube, "/dev/null"))
        ds = ForestDatasetV2(b, split=None, patch_size=32, min_aoi=1.1)
        assert len(ds) == 0
        src = next(iter(b.dataset))
        ch = b.dataset[src].channels[0].name
        specs = [{"name": "d1", "source": f"{src}.{ch}", "kind": "delta"},
                 {"name": "sob", "source": f"{src}.{ch}", "kind": "sobel"}]
        out = DerivedStatsComputer(b, ds, specs, seed=0).compute(
            n_patches=4)
        assert out["d1"]["n_seen"] == 0
        assert "__covariance__" not in out


class TestMultiHostIngestion:
    """SURVEY §6.8 per-host chunk assignment: N sampler shards must
    partition the chunk set disjointly AND exhaustively, and a simulated
    2-host feed into the 8-device DP step must compute the same update as
    the equivalent 1-host feed (VERDICT r2 item 7)."""

    def test_n_shard_partition_disjoint_exhaustive(self):
        sizes = [10, 3, 0, 25, 7, 7, 18, 1, 4]
        xy = []
        base = 0
        for s in sizes:
            xy.append(np.arange(base, base + s))
            base += s
        non_empty = {i for i, s in enumerate(sizes) if s}
        total = sum(sizes)
        for n_shards in (2, 3, 4):
            shards = [ChunkBatchSampler(xy, 5, seed=0,
                                        num_shards=n_shards, shard_id=i)
                      for i in range(n_shards)]
            chunk_sets = [set(s.my_chunks) for s in shards]
            # disjoint
            for i in range(n_shards):
                for j in range(i + 1, n_shards):
                    assert not (chunk_sets[i] & chunk_sets[j])
            # exhaustive over non-empty chunks
            assert set().union(*chunk_sets) == non_empty
            # every sample delivered exactly once across all shards
            seen = [int(v) for s in shards for b in s for v in b]
            assert len(seen) == total
            assert set(seen) == set(range(total))
            # greedy largest-first size balance: max shard load within
            # one largest chunk of the min load
            loads = [s.total for s in shards]
            assert max(loads) - min(loads) <= max(sizes)

    def test_two_host_feed_matches_single_host_dp(self, cube_and_schema):
        """Two shard samplers each contribute half the global batch; the
        DP step over the 8-device mesh must produce the same update as the
        identical global batch on one device."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from forest_tpu.models.vqvae import VQVAE
        from forest_tpu.training import vqvae_step
        from forest_tpu.training.train_vqvae import host_to_device_batch

        zp, sp = cube_and_schema
        ds = VQVAEDataset(zp, sp, split="train", block_size=(1, 1))
        per_host = 16
        hosts = [ChunkBatchSampler(ds.xy_by_chunk, per_host, seed=0,
                                   replacement_within_chunk=True,
                                   num_shards=2, shard_id=i)
                 for i in range(2)]
        idx0 = next(iter(hosts[0]))
        idx1 = next(iter(hosts[1]))
        # hosts read disjoint chunks
        assert not (set(hosts[0].my_chunks) & set(hosts[1].my_chunks))
        b0 = ds.load_batch(idx0)
        b1 = ds.load_batch(idx1)

        def concat(a, b):
            if isinstance(a, dict):
                return {k: concat(a[k], b[k]) for k in a}
            return np.concatenate([np.asarray(a), np.asarray(b)], axis=0)

        global_batch = host_to_device_batch(concat(b0, b1))
        model = VQVAE(cont_dim=len(ds.cont_names),
                      cat_vocab_sizes={n: ds.schema_cat[n]["num_ids"]
                                       for n in ds.cat_names},
                      naip_bands=ds.naip.shape[-1],
                      num_timesteps=len(ds.ds["years"]),
                      emb_dim=16, codebook_size=16, hidden=16,
                      quantizer="ema")
        opt = vqvae_step.make_optimizer(1e-3)
        state = vqvae_step.init_train_state(model, opt, global_batch,
                                            jax.random.key(0))
        raw = vqvae_step.make_train_step(model, opt, use_pallas=False)
        w = {k: jnp.float32(1.0) for k in ("cont", "cat", "canopy", "vq")}

        s1, m1 = jax.jit(raw)(state, global_batch, w, jax.random.key(0))

        mesh = Mesh(np.array(jax.devices()), ("data",))
        shard = NamedSharding(mesh, P("data"))
        sharded = jax.tree.map(
            lambda x: jax.device_put(x, shard)
            if hasattr(x, "ndim") and x.ndim else x, global_batch)
        s2, m2 = jax.jit(raw)(state, sharded, w, jax.random.key(0))

        np.testing.assert_allclose(float(m1["loss/total"]),
                                   float(m2["loss/total"]), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s1.params["codebook"]),
                                   np.asarray(s2.params["codebook"]),
                                   rtol=1e-4, atol=1e-5)
