"""MXU row scatter-add (ops/scatter.py) vs the XLA scatter oracle.

The op is the backward of the FRL step's merged anchor/neighbor/pool
extraction (training/representation/step.py stage 3; reference builds the
same extractions with torch advanced indexing, whose CUDA backward is a
parallel index_put_ -- /root/reference/frl/training/representation/
step.py). Contract: bit-close agreement with XLA's serial scatter-add for
arbitrary duplicate patterns, exact gradients through extract_rows, and a
correct fallback when a tile overflows the static cap.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forest_tpu.ops import scatter as sc


def _case(rng, b, n, c, r, dup_frac=0.2):
    idx = rng.integers(0, r, size=(b, n)).astype(np.int32)
    ndup = int(n * dup_frac)
    if ndup:
        idx[:, :ndup] = idx[:, ndup:2 * ndup]  # guaranteed duplicates
    dz = rng.normal(size=(b, n, c)).astype(np.float32)
    return jnp.asarray(idx), jnp.asarray(dz)


class TestScatterAddRows:
    @pytest.mark.parametrize("b,n,c,r", [
        (3, 500, 7, 8192),       # odd C, small N
        (2, 2012, 48, 65536),    # production FRL shape
        (1, 64, 48, 2048),       # single tile
    ])
    def test_matches_xla_scatter(self, b, n, c, r):
        rng = np.random.default_rng(0)
        idx, dz = _case(rng, b, n, c, r)
        ref = sc.scatter_add_rows(dz, idx, r, use_pallas=False)
        out = sc.scatter_add_rows(dz, idx, r, use_pallas=True,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-6)

    def test_heavy_duplicates(self):
        """Many rows onto few destinations (within one tile's cap)."""
        rng = np.random.default_rng(1)
        b, n, c, r = 2, 300, 5, 4096
        # ~150 rows per tile spread over 2 tiles -- inside cap=384-127
        idx = jnp.asarray(
            rng.choice([5, 6, 2050, 2060], size=(b, n)).astype(np.int32))
        dz = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
        ref = sc.scatter_add_rows(dz, idx, r, use_pallas=False)
        out = sc.scatter_add_rows(dz, idx, r, use_pallas=True,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-6)

    def test_overflow_falls_back_to_xla(self):
        """All rows into one tile exceeds the cap: same answer anyway."""
        rng = np.random.default_rng(2)
        b, n, c, r = 2, 600, 4, 8192
        idx = jnp.asarray(rng.integers(0, 100, size=(b, n)), jnp.int32)
        dz = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
        ref = sc.scatter_add_rows(dz, idx, r, use_pallas=False)
        out = sc.scatter_add_rows(dz, idx, r, use_pallas=True,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-6)

    def test_rank_and_bounds_invariants(self):
        rng = np.random.default_rng(3)
        n_rows, tile_rows = 8192, 2048
        idx = jnp.asarray(rng.integers(0, n_rows, size=(2, 256)),
                          jnp.int32)
        dest, bounds, maxcnt = sc._rank_and_bounds(idx, n_rows, tile_rows)
        dest_np, bounds_np = np.asarray(dest), np.asarray(bounds)
        assert bounds_np.shape == (2, n_rows // tile_rows + 1)
        for b in range(2):
            # dest is a permutation of 0..N-1
            assert sorted(dest_np[b].tolist()) == list(range(256))
            # grouped order really groups by tile, in bounds order
            order = np.argsort(dest_np[b], kind="stable")
            tiles = np.asarray(idx)[b][order] // tile_rows
            assert (np.diff(tiles) >= 0).all()
            counts = np.diff(bounds_np[b])
            np.testing.assert_array_equal(
                counts, np.bincount(tiles, minlength=len(counts)))
        assert int(maxcnt) == max(np.diff(bounds_np, axis=1).max(axis=1))

    def test_bad_n_rows_rejected(self):
        dz = jnp.zeros((1, 8, 3), jnp.float32)
        idx = jnp.zeros((1, 8), jnp.int32)
        with pytest.raises(ValueError, match="multiple"):
            sc.scatter_add_rows(dz, idx, 1000, use_pallas=True,
                                interpret=True)


class TestExtractRows:
    def test_forward_matches_take_along(self):
        rng = np.random.default_rng(4)
        g = jnp.asarray(rng.normal(size=(2, 4096, 6)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 4096, size=(2, 128)), jnp.int32)
        out = sc.extract_rows(g, idx, True, True)
        ref = jnp.take_along_axis(g, idx[:, :, None], axis=1)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_grad_matches_xla(self):
        rng = np.random.default_rng(5)
        g = jnp.asarray(rng.normal(size=(2, 4096, 6)).astype(np.float32))
        idx = np.asarray(rng.integers(0, 4096, size=(2, 128)),
                         dtype=np.int32)
        idx[:, :30] = idx[:, 30:60]  # duplicates exercise accumulation
        idx = jnp.asarray(idx)

        def loss_p(g):
            z = sc.extract_rows(g, idx, True, True)
            return jnp.sum(jnp.sin(z) * z)

        def loss_x(g):
            z = jnp.take_along_axis(g, idx[:, :, None], axis=1)
            return jnp.sum(jnp.sin(z) * z)

        gp = jax.grad(loss_p)(g)
        gx = jax.grad(loss_x)(g)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   atol=1e-5, rtol=1e-6)

    def test_coords_wrapper_matches_vmap_extract(self):
        rng = np.random.default_rng(6)
        grid = jnp.asarray(
            rng.normal(size=(2, 64, 64, 5)).astype(np.float32))
        coords = jnp.asarray(rng.integers(0, 64, size=(2, 40, 2)),
                             jnp.int32)
        zp = sc.extract_at_coords(grid, coords, interpret=True)
        zx = jax.vmap(lambda g, c: g[c[:, 0], c[:, 1]])(grid, coords)
        np.testing.assert_array_equal(np.asarray(zp), np.asarray(zx))

    def test_odd_grid_uses_xla_path(self):
        """H*W not a 2048 multiple silently routes to XLA, same result."""
        rng = np.random.default_rng(7)
        grid = jnp.asarray(
            rng.normal(size=(1, 30, 30, 4)).astype(np.float32))
        coords = jnp.asarray(rng.integers(0, 30, size=(1, 16, 2)),
                             jnp.int32)

        def loss(g):
            return jnp.sum(sc.extract_at_coords(g, coords) ** 2)

        gx = jax.grad(
            lambda g: jnp.sum(jax.vmap(
                lambda gg, c: gg[c[:, 0], c[:, 1]])(g, coords) ** 2))(grid)
        np.testing.assert_allclose(np.asarray(jax.grad(loss)(grid)),
                                   np.asarray(gx), atol=1e-6)
