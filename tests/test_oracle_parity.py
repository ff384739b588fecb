"""CPU torch oracle parity for the VQ core (SURVEY.md §8.1 parity gate).

The missing vqvae package forces a reimplemented oracle (kept tiny,
CPU-only): codebook assignments must be identical between the torch
reference math and the forest-tpu XLA/Pallas paths, and the EMA update must
match the standard Laplace-smoothed formulation to float tolerance.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from forest_tpu.ops import vq


def torch_oracle_assign(x, cb):
    import torch

    xt = torch.from_numpy(np.asarray(x))
    ct = torch.from_numpy(np.asarray(cb))
    d = torch.cdist(xt, ct)
    return d.argmin(1).numpy()


def torch_oracle_ema(cluster_size, cluster_sum, cb, x, idx, decay, eps):
    import torch

    xt = torch.from_numpy(np.asarray(x, np.float64))
    k = cb.shape[0]
    onehot = torch.nn.functional.one_hot(
        torch.from_numpy(np.asarray(idx)).long(), k).double()
    counts = onehot.sum(0)
    sums = onehot.T @ xt
    new_size = decay * torch.from_numpy(cluster_size).double() \
        + (1 - decay) * counts
    new_sum = decay * torch.from_numpy(cluster_sum).double() \
        + (1 - decay) * sums
    n = new_size.sum()
    smoothed = (new_size + eps) / (n + k * eps) * n
    return (new_sum / smoothed[:, None]).numpy()


class TestOracleParity:
    @pytest.mark.parametrize("n,d,k", [(1000, 128, 256), (333, 24, 17)])
    def test_assignments_identical_xla(self, rng, n, d, k):
        x = rng.normal(size=(n, d)).astype(np.float32)
        cb = rng.normal(size=(k, d)).astype(np.float32)
        with jax.default_matmul_precision("highest"):
            got = np.asarray(vq.vq_assign(jnp.asarray(x), jnp.asarray(cb),
                                          use_pallas=False))
        expect = torch_oracle_assign(x, cb)
        mismatch = (got != expect).sum()
        assert mismatch == 0, f"{mismatch}/{n} assignments differ"

    def test_assignments_identical_pallas_interpret(self, rng):
        x = rng.normal(size=(500, 32)).astype(np.float32)
        cb = rng.normal(size=(64, 32)).astype(np.float32)
        with jax.default_matmul_precision("highest"):
            got = np.asarray(vq._vq_core_pallas(
                jnp.asarray(x), jnp.asarray(cb), interpret=True)[0])
        expect = torch_oracle_assign(x, cb)
        assert (got != expect).sum() == 0

    def test_ema_update_matches_oracle(self, rng):
        n, d, k = 400, 16, 8
        x = rng.normal(size=(n, d)).astype(np.float32)
        cb = rng.normal(size=(k, d)).astype(np.float32)
        stats = vq.VQStats(
            jnp.asarray(rng.random(k), jnp.float32),
            jnp.asarray(rng.normal(size=(k, d)), jnp.float32),
            jnp.zeros((k,)))
        r = vq.quantize_ema(jnp.asarray(x), jnp.asarray(cb),
                            use_pallas=False)
        _, new_cb = vq.ema_codebook_update(stats, jnp.asarray(cb),
                                           r.counts, r.sums,
                                           decay=0.99, eps=1e-5)
        idx = np.asarray(r.indices)
        expect = torch_oracle_ema(np.asarray(stats.cluster_size, np.float64),
                                  np.asarray(stats.cluster_sum, np.float64),
                                  cb, x, idx, 0.99, 1e-5)
        np.testing.assert_allclose(np.asarray(new_cb), expect,
                                   rtol=1e-4, atol=1e-5)

    def test_reconstruction_mse_parity(self, rng):
        """Quantized reconstruction through our ST path matches the oracle's
        gather to <= 1e-5 MSE (BASELINE.json acceptance)."""
        x = rng.normal(size=(800, 64)).astype(np.float32)
        cb = rng.normal(size=(128, 64)).astype(np.float32)
        with jax.default_matmul_precision("highest"):
            r = vq.quantize_st(jnp.asarray(x), jnp.asarray(cb),
                               use_pallas=False)
        expect_q = cb[torch_oracle_assign(x, cb)]
        mse = float(np.mean((np.asarray(r.quantized) - expect_q) ** 2))
        assert mse <= 1e-5


class TestTypeLocalDemeanOracle:
    """Pin type_local_spectral_demean against a torch oracle of
    /root/reference/frl/training/representation/step.py:907-932."""

    def _torch_oracle(self, z, spec, k, k_nbrs):
        import torch

        Z = torch.from_numpy(z)
        spec_all = torch.from_numpy(spec)
        Z_c = Z - Z.mean(0, keepdim=True)
        U, _, _ = torch.pca_lowrank(Z_c, q=k, center=False)
        sim = U @ U.T
        sim.fill_diagonal_(float("-inf"))
        k_nbrs = min(k_nbrs, sim.shape[0] - 1)
        topk_idx = sim.topk(k_nbrs, dim=1).indices
        S_mean = spec_all.mean(dim=1)
        S_hat = S_mean[topk_idx].mean(dim=1)
        return (spec_all - S_hat.unsqueeze(1)).numpy(), topk_idx.numpy()

    def test_demeaned_matches_torch_pca_lowrank(self, rng):
        import torch

        torch.manual_seed(0)
        n, d, t, c, k, k_nbrs = 96, 16, 6, 5, 8, 20
        # Clear rank-k spectral structure so the randomized pca_lowrank
        # oracle and the exact eigendecomposition find the same subspace.
        basis = rng.normal(size=(k, d)).astype(np.float32)
        coef = rng.normal(size=(n, k)).astype(np.float32) * \
            np.linspace(4.0, 1.5, k, dtype=np.float32)
        z = coef @ basis + 0.01 * rng.normal(size=(n, d)).astype(np.float32)
        spec = rng.normal(size=(n, t, c)).astype(np.float32)

        expect, _ = self._torch_oracle(z, spec, k, k_nbrs)
        from forest_tpu.losses.phase_neighborhood import \
            type_local_spectral_demean
        with jax.default_matmul_precision("highest"):
            got, _ = jax.jit(type_local_spectral_demean,
                             static_argnums=(3, 4))(
                jnp.asarray(z), jnp.asarray(spec),
                jnp.ones(n, bool), k, k_nbrs)
        np.testing.assert_allclose(np.asarray(got), expect,
                                   atol=1e-4, rtol=1e-4)

    def test_invalid_rows_never_selected_as_neighbors(self, rng):
        from forest_tpu.losses.phase_neighborhood import \
            type_local_spectral_demean

        n, d, t, c = 48, 8, 4, 3
        z = rng.normal(size=(n, d)).astype(np.float32)
        spec = rng.normal(size=(n, t, c)).astype(np.float32)
        valid = np.ones(n, bool)
        valid[5] = valid[17] = False

        def run(poison):
            z2, s2 = z.copy(), spec.copy()
            z2[~valid] = poison
            s2[~valid] = poison
            with jax.default_matmul_precision("highest"):
                out, _ = type_local_spectral_demean(
                    jnp.asarray(z2), jnp.asarray(s2),
                    jnp.asarray(valid), 8, 10)
            return np.asarray(out)[valid]

        np.testing.assert_allclose(run(0.0), run(1e4), atol=1e-3)
