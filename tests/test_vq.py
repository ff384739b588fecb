"""VQ hot-core tests: XLA vs Pallas(interpret) parity, gradient semantics, EMA.

Mirrors the reference test strategy (analytic edge cases + invariants +
gradient checks on synthetic tensors, SURVEY.md §5) for the reconstructed
vqvae.model contract (SURVEY.md §3).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forest_tpu.ops import vq


def _rand(n=300, d=24, k=17, seed=0):
    r = np.random.default_rng(seed)
    x = r.normal(size=(n, d)).astype(np.float32)
    cb = r.normal(size=(k, d)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(cb)


class TestAssignment:
    def test_xla_matches_bruteforce(self):
        x, cb = _rand()
        d = np.linalg.norm(np.asarray(x)[:, None] - np.asarray(cb)[None], axis=-1)
        expect = d.argmin(-1)
        got = vq.vq_assign(x, cb, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(got), expect)

    def test_assign_only_pallas_interpret_matches_xla(self):
        x, cb = _rand(n=1000, d=40, k=50)
        expect = vq.vq_assign(x, cb, use_pallas=False)
        got = vq._vq_assign_pallas(x, cb, tile_n=256, mxu_bf16=False,
                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))

    def test_assign_only_bf16_mxu_near_identical(self):
        # bf16-multiply/f32-accumulate (XLA DEFAULT-precision numerics):
        # assignments may flip only on near-ties; require <0.5% mismatch.
        x, cb = _rand(n=2000, d=64, k=128)
        expect = np.asarray(vq.vq_assign(x, cb, use_pallas=False))
        got = np.asarray(vq._vq_assign_pallas(x, cb, tile_n=512,
                                              mxu_bf16=True, interpret=True))
        assert (got != expect).mean() < 0.005

    def test_pallas_interpret_matches_xla(self):
        x, cb = _rand(n=1000, d=40, k=50)
        ix, qx, cx, sx = vq._vq_core_xla(x, cb)
        ip, qp, cp, sp = vq._vq_core_pallas(x, cb, tile_n=256, interpret=True)
        np.testing.assert_array_equal(np.asarray(ix), np.asarray(ip))
        np.testing.assert_allclose(np.asarray(qx), np.asarray(qp), atol=1e-5)
        np.testing.assert_allclose(np.asarray(cx), np.asarray(cp), atol=1e-3)
        np.testing.assert_allclose(np.asarray(sx), np.asarray(sp), atol=1e-3)

    def test_tie_break_lowest_index(self):
        # Duplicate codebook rows: argmin must pick the lowest index.
        cb = jnp.asarray(np.tile(np.arange(4, dtype=np.float32)[:, None],
                                 (2, 8)))  # codes 0..3 == codes 4..7
        x = cb[4:8] + 0.01
        for up in (False, None):
            idx = vq.vq_assign(x, cb, use_pallas=False) if up is False else \
                vq._vq_core_pallas(x, cb, interpret=True)[0]
            np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2, 3])

    def test_counts_and_sums(self):
        x, cb = _rand(n=123)
        idx, q, counts, sums = vq._vq_core_xla(x, cb)
        assert float(counts.sum()) == 123
        oh = np.eye(cb.shape[0])[np.asarray(idx)]
        np.testing.assert_allclose(np.asarray(sums), oh.T @ np.asarray(x),
                                   atol=1e-4)

    def test_pallas_padding_correction(self):
        # n deliberately not a multiple of the tile; code-0 counts must not
        # include padded rows.
        x, cb = _rand(n=77, d=8, k=4)
        _, _, cx, _ = vq._vq_core_xla(x, cb)
        _, _, cp, _ = vq._vq_core_pallas(x, cb, tile_n=256, interpret=True)
        np.testing.assert_allclose(np.asarray(cx), np.asarray(cp), atol=1e-4)
        assert float(cp.sum()) == 77


class TestFusedCommitmentDot:
    def test_with_qx_matches_outside_dot(self):
        """vq_core(with_qx=True) appends sum(q*x), computed in-kernel on
        the Pallas path (VMEM, no HBM re-read of q+x) and by consumer
        fusion on XLA; both must equal the explicit outside dot, and the
        first four outputs must be unchanged."""
        x, cb = _rand(n=1000, d=40, k=33)
        base = vq.vq_core(x, cb, use_pallas=False)
        for kw in ({"use_pallas": False}, {"interpret": True}):
            out = vq.vq_core(x, cb, with_qx=True, **kw)
            assert len(out) == 5
            idx, q, counts, sums, qx = out
            np.testing.assert_array_equal(np.asarray(idx),
                                          np.asarray(base[0]))
            np.testing.assert_allclose(np.asarray(q),
                                       np.asarray(base[1]), atol=1e-5)
            np.testing.assert_allclose(
                float(qx), float(jnp.sum(base[1] * x)), rtol=1e-5)

    def test_with_qx_padding_masked(self):
        """Rows past n (tile padding) must not leak into qx -- pinned by
        a size that forces padding on the Pallas tile grid."""
        x, cb = _rand(n=700, d=24, k=17, seed=3)
        _, q, _, _, qx = vq.vq_core(x, cb, interpret=True, with_qx=True)
        np.testing.assert_allclose(float(qx), float(jnp.sum(q * x)),
                                   rtol=1e-5)


class TestGradients:
    def test_ste_passes_gradient_to_encoder(self):
        x, cb = _rand()

        def f(x):
            return jnp.sum(vq.quantize_st(x, cb, use_pallas=False).quantized)

        g = jax.grad(f)(x)
        np.testing.assert_allclose(np.asarray(g), np.ones_like(g), atol=1e-6)

    def test_st_codebook_gets_gradient(self):
        x, cb = _rand()

        def f(cb):
            r = vq.quantize_st(x, cb, use_pallas=False)
            return r.vq_loss

        g = jax.grad(f)(cb)
        assert float(jnp.abs(g).sum()) > 0

    def test_ema_codebook_no_gradient(self):
        x, cb = _rand()

        def f(cb):
            r = vq.quantize_ema(x, cb, use_pallas=False)
            return r.vq_loss + jnp.sum(r.quantized)

        g = jax.grad(f)(cb)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)

    def test_commitment_loss_value(self):
        # x exactly on codes -> all losses zero, quantized == x.
        cb = jnp.asarray(np.random.default_rng(1).normal(size=(5, 6)),
                         dtype=jnp.float32)
        x = cb[jnp.asarray([0, 2, 4])]
        r = vq.quantize_st(x, cb, use_pallas=False)
        assert float(r.vq_loss) == pytest.approx(0.0, abs=1e-10)
        np.testing.assert_allclose(np.asarray(r.quantized), np.asarray(x))


class TestEMA:
    def test_update_moves_codebook_toward_data(self):
        x, cb = _rand(n=500, d=8, k=4)
        stats = vq.VQStats.init(4, 8)
        r = vq.quantize_ema(x, cb, use_pallas=False)
        stats, new_cb = vq.ema_codebook_update(stats, cb, r.counts, r.sums,
                                               decay=0.0)
        # decay=0 -> codebook == per-cluster means (up to Laplace smoothing)
        for kk in range(4):
            m = np.asarray(r.counts)[kk]
            if m > 0:
                mean = np.asarray(r.sums)[kk] / m
                np.testing.assert_allclose(np.asarray(new_cb)[kk], mean,
                                           rtol=1e-2, atol=1e-2)

    def test_usage_accumulates(self):
        x, cb = _rand(n=100, d=8, k=4)
        stats = vq.VQStats.init(4, 8)
        r = vq.quantize_ema(x, cb, use_pallas=False)
        stats, cb = vq.ema_codebook_update(stats, cb, r.counts, r.sums)
        stats, cb = vq.ema_codebook_update(stats, cb, r.counts, r.sums)
        assert float(stats.code_usage.sum()) == 200

    def test_psum_across_mesh(self):
        # Cross-replica psum of EMA stats must equal the single-device update
        # on the concatenated batch (the multi-chip contract, SURVEY.md §6.8).
        from jax.sharding import Mesh, PartitionSpec as P
        ndev = len(jax.devices())
        n_per, d, k = 64, 8, 6
        x, cb = _rand(n=n_per * ndev, d=d, k=k)
        stats = vq.VQStats.init(k, d)

        def shard_fn(x):
            r = vq.quantize_ema(x, cb, use_pallas=False)
            s, ncb = vq.ema_codebook_update(stats, cb, r.counts, r.sums,
                                            decay=0.5, axis_name="data")
            return ncb

        mesh = Mesh(np.array(jax.devices()), ("data",))
        ncb_sharded = jax.jit(jax.shard_map(
            shard_fn, mesh=mesh, in_specs=P("data"), out_specs=P()))(x)

        r = vq.quantize_ema(x, cb, use_pallas=False)
        _, ncb_ref = vq.ema_codebook_update(stats, cb, r.counts, r.sums,
                                            decay=0.5)
        np.testing.assert_allclose(np.asarray(ncb_sharded), np.asarray(ncb_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_reseed_dead_codes(self):
        cb = jnp.zeros((4, 8))
        stats = vq.VQStats(jnp.asarray([5.0, 0.0, 5.0, 0.0]),
                           jnp.zeros((4, 8)), jnp.zeros((4,)))
        cands = jnp.ones((10, 8)) * 7.0
        new_cb, new_stats = vq.reseed_dead_codes(cb, stats, cands,
                                                 jax.random.key(0))
        np.testing.assert_allclose(np.asarray(new_cb[1]), 7.0)
        np.testing.assert_allclose(np.asarray(new_cb[3]), 7.0)
        np.testing.assert_allclose(np.asarray(new_cb[0]), 0.0)
        assert float(new_stats.cluster_size[1]) > 0


class TestPerplexity:
    def test_uniform_is_k(self):
        c = jnp.ones((16,))
        assert float(vq.perplexity_from_counts(c)) == pytest.approx(16.0)

    def test_single_code_is_one(self):
        c = jnp.zeros((16,)).at[3].set(100.0)
        assert float(vq.perplexity_from_counts(c)) == pytest.approx(1.0)


class TestNanCodebookConvention:
    def test_nan_code_never_assigned_both_paths(self):
        x, cb = _rand(n=64, d=8, k=4)
        cb = cb.at[2, 3].set(jnp.nan)
        ix = vq.vq_core(x, cb, use_pallas=False)[0]
        ip = vq._vq_core_pallas(x, cb, tile_n=256, interpret=True)[0]
        np.testing.assert_array_equal(np.asarray(ix), np.asarray(ip))
        assert not np.any(np.asarray(ix) == 2)  # NaN code is unassignable
        ia = vq.vq_assign(x, cb, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ix))
        iap = vq._vq_assign_pallas(x, cb, tile_n=256, interpret=True)
        np.testing.assert_array_equal(np.asarray(iap), np.asarray(ix))

    def test_nan_input_row_still_index_zero(self):
        x, cb = _rand(n=16, d=8, k=4)
        x = x.at[3].set(jnp.nan)
        ix = vq.vq_core(x, cb, use_pallas=False)[0]
        ip = vq._vq_core_pallas(x, cb, tile_n=256, interpret=True)[0]
        np.testing.assert_array_equal(np.asarray(ix), np.asarray(ip))
        assert int(ix[3]) == 0


class TestVqAssignKwargs:
    def test_unknown_kwarg_rejected_on_every_path(self):
        x, cb = _rand(n=8, d=8, k=4)
        import pytest as _pytest
        with _pytest.raises(TypeError, match="unexpected"):
            vq.vq_assign(x, cb, use_pallas=False, mxu_bf1=True)

    def test_mxu_bf16_honored_on_xla_path(self):
        x, cb = _rand(n=64, d=8, k=4)
        i_b = vq.vq_assign(x, cb, use_pallas=False, mxu_bf16=True)
        i_f = vq.vq_assign(x, cb, use_pallas=False)
        # bf16 rounding may flip near-ties but must stay a valid assignment
        assert np.asarray(i_b).shape == np.asarray(i_f).shape
        assert np.all((np.asarray(i_b) >= 0) & (np.asarray(i_b) < 4))
        # on well-separated data the assignments agree exactly
        far = jnp.concatenate([cb[k][None] + 0.01 for k in range(4)])
        np.testing.assert_array_equal(
            np.asarray(vq.vq_assign(far, cb, use_pallas=False,
                                    mxu_bf16=True)),
            np.arange(4))


class TestCodebookSeededEmaInit:
    def test_unassigned_codes_keep_init_exactly(self):
        """Ratio invariance: with size=1/sum=codebook seeding, a code that
        never receives assignments keeps its init vector bit-exactly
        through EMA updates (regression: zero-init collapsed every
        unassigned code to the zero vector on the FIRST update, and
        identical zero rows dead-lock under lowest-index tie-break)."""
        rng = np.random.default_rng(3)
        cb = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        stats = vq.VQStats.init(4, 8, codebook=cb)
        # all samples sit on code 0
        x = jnp.broadcast_to(cb[0], (32, 8)) + 0.01
        r = vq.quantize_ema(x, cb, use_pallas=False)
        assert float(r.counts[0]) == 32 and float(r.counts[2]) == 0
        new_cb = cb
        for _ in range(5):
            stats, new_cb = vq.ema_codebook_update(stats, new_cb, r.counts,
                                                   r.sums)
        got = np.asarray(new_cb)
        # assigned code moved toward the data
        assert np.linalg.norm(got[0] - np.asarray(cb[0])) > 0
        # unassigned codes: ratio sum/size == init codebook (up to the
        # Laplace smoothing factor, identical across these codes)
        for k in (1, 2, 3):
            scale = got[k] / np.asarray(cb[k])
            np.testing.assert_allclose(scale, scale[0], rtol=1e-5)
            assert np.all(np.abs(scale - 1.0) < 0.05)  # near-invariant
        assert not np.any(np.all(got == 0.0, axis=1))  # nobody zeroed
