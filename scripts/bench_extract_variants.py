"""Microbench: variants of anchor/neighbor extraction from [B,H,W,C] grids,
fwd+bwd, at production FRL-step shapes (B=12, 256^2, C=48, A=300,
k_pos=4 offset neighbors + 4 random negatives).

The step's profiled ~5 ms of spatial-extract backward scatter (CLAUDE.md
roadmap #2) comes from the z_a / z_nbr gathers' transpose. Candidates:

  gather        -- current: two vmapped int gathers (z_a, z_nbr)
  gather1       -- single merged gather (one scatter in bwd)
  segsum        -- custom_vjp: gather fwd, sorted segment-sum bwd
  shift         -- positives via statically shifted grids (gather at anchor
                   coords only, k_pos+1 dup-free scatters), negatives gathered

Chained-carry timing per CLAUDE.md; grads consumed via a scalar loss.

Run: python scripts/bench_extract_variants.py [--iters 20]
"""
from __future__ import annotations

# Containers can lose the editable install between rounds; make the
# repo-root import work regardless of pip state.
import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--b", type=int, default=12)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--c", type=int, default=48)
    ap.add_argument("--a", type=int, default=300)
    ap.add_argument("--kpos", type=int, default=4)
    ap.add_argument("--kneg", type=int, default=4)
    a = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    r = np.random.default_rng(0)
    b, hw, c, na = a.b, a.hw, a.c, a.a
    grid0 = jnp.asarray(r.normal(size=(b, hw, hw, c)).astype(np.float32))
    coords = jnp.asarray(r.integers(8, hw - 8, size=(b, na, 2)),
                         jnp.int32)
    offsets = jnp.asarray([[0, 1], [1, 0], [0, -1], [-1, 0]][:a.kpos],
                          jnp.int32)
    neg = jnp.asarray(r.integers(0, hw, size=(b, na * a.kneg, 2)),
                      jnp.int32)

    def loss_of(z_a, z_nbr, z_neg):
        return (jnp.sum(z_a * z_a) + jnp.sum(z_nbr) * 1e-3
                + jnp.sum(z_neg) * 1e-3)

    def v_extract(g, cc):
        return jax.vmap(lambda gg, c_: gg[c_[:, 0], c_[:, 1]])(g, cc)

    def make_gather():
        def f(g):
            z_a = v_extract(g, coords)
            nbr = (coords[:, :, None, :] + offsets[None, None]).reshape(
                b, -1, 2)
            z_nbr = v_extract(g, jnp.clip(nbr, 0, hw - 1))
            z_neg = v_extract(g, neg)
            return loss_of(z_a, z_nbr, z_neg)
        return f

    def make_gather1():
        def f(g):
            nbr = (coords[:, :, None, :] + offsets[None, None]).reshape(
                b, -1, 2)
            allc = jnp.concatenate(
                [coords, jnp.clip(nbr, 0, hw - 1), neg], axis=1)
            z = v_extract(g, allc)
            z_a = z[:, :na]
            z_nbr = z[:, na:na + na * a.kpos]
            z_neg = z[:, na + na * a.kpos:]
            return loss_of(z_a, z_nbr, z_neg)
        return f

    def make_segsum():
        p = hw * hw

        @jax.custom_vjp
        def extract(g, flat_idx):
            return jax.vmap(lambda gg, i: gg.reshape(p, c)[i])(g, flat_idx)

        def fwd(g, flat_idx):
            return extract(g, flat_idx), flat_idx

        def bwd(flat_idx, ct):
            def one(i, g):
                order = jnp.argsort(i)
                return jax.ops.segment_sum(
                    g[order], i[order], num_segments=p,
                    indices_are_sorted=True).reshape(hw, hw, c)
            return jax.vmap(one)(flat_idx, ct), None

        extract.defvjp(fwd, bwd)

        def f(g):
            nbr = (coords[:, :, None, :] + offsets[None, None]).reshape(
                b, -1, 2)
            allc = jnp.concatenate(
                [coords, jnp.clip(nbr, 0, hw - 1), neg], axis=1)
            flat = allc[..., 0] * hw + allc[..., 1]
            z = extract(g, flat)
            return loss_of(z[:, :na], z[:, na:na + na * a.kpos],
                           z[:, na + na * a.kpos:])
        return f

    def make_shift():
        def f(g):
            # stack the identity + kpos shifted views; one gather at the
            # (unique-ish) anchor coords with a distinct leading index per
            # view -> dup-free scatter in the transpose
            off_np = np.asarray(offsets)
            views = [g]
            for k in range(a.kpos):
                dr, dc = int(off_np[k, 0]), int(off_np[k, 1])
                views.append(jnp.roll(g, (-dr, -dc), axis=(1, 2)))
            stack = jnp.stack(views, axis=1)          # [B, K+1, H, W, C]

            def one(st, c_):
                return st[:, c_[:, 0], c_[:, 1]]      # [K+1, A, C]
            z = jax.vmap(one)(stack, coords)
            z_a = z[:, 0]
            z_nbr = z[:, 1:].transpose(0, 2, 1, 3).reshape(b, -1, c)
            z_neg = v_extract(g, neg)
            return loss_of(z_a, z_nbr, z_neg)
        return f

    def make_pallas():
        from forest_tpu.ops import scatter as sc

        def f(g):
            nbr = (coords[:, :, None, :] + offsets[None, None]).reshape(
                b, -1, 2)
            allc = jnp.concatenate(
                [coords, jnp.clip(nbr, 0, hw - 1), neg], axis=1)
            z = sc.extract_at_coords(g, allc)
            z_a = z[:, :na]
            z_nbr = z[:, na:na + na * a.kpos]
            z_neg = z[:, na + na * a.kpos:]
            return loss_of(z_a, z_nbr, z_neg)
        return f

    variants = {"gather": make_gather(), "gather1": make_gather1(),
                "segsum": make_segsum(), "shift": make_shift(),
                "pallas": make_pallas()}
    for name, f in variants.items():
        try:
            vg = jax.jit(jax.value_and_grad(f))

            def body(i, carry):
                g, acc = carry
                v, gr = jax.value_and_grad(f)(g)
                return g + 1e-12 * gr, acc + v

            run = jax.jit(lambda g: jax.lax.fori_loop(
                0, a.iters, body, (g, jnp.float32(0.0))))
            t0 = time.perf_counter()
            jax.block_until_ready(run(grid0))
            compile_s = time.perf_counter() - t0
            out = run(grid0)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            reps = 3
            o = (grid0, jnp.float32(0))
            for _ in range(reps):
                o = run(o[0])
            jax.block_until_ready(o)
            ms = (time.perf_counter() - t0) / (reps * a.iters) * 1e3
            print(f"{name:8s}: {ms:8.3f} ms/iter (fwd+bwd)  "
                  f"compile {compile_s:.1f}s")
        except Exception as e:
            print(f"{name:8s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
