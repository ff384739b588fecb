"""Microbench: where does EdgeAwareSmoothingConv2D's time go on TPU?

Times the full block plus isolated components at the production FRL shape
([B=12, 256, 256, C=48], bf16 compute) to size the win for a fused Pallas
kernel (CLAUDE.md round-2 priority 1). Every timed function is CHAINED
(output feeds the next iteration's input) so the axon relay cannot pipeline
iterations -- unchained per-call timings under-report by >100x.

Run on the TPU env: python scripts/bench_smoothing_block.py
"""
from __future__ import annotations

# Containers can lose the editable install between rounds; make the
# repo-root import work regardless of pip state.
import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))

import argparse
import json
import sys
import time

import numpy as np


def timeit_chained(step, *x0, iters=30, warmup=3):
    """step: args -> args-shaped carry. Chains through iters calls.
    Multi-arg carries keep large tensors as jit ARGUMENTS -- closing over
    them bakes them into the HLO as literals and the axon relay rejects
    the oversized compile request with HTTP 413."""
    import jax
    x = x0
    for _ in range(warmup):
        x = step(*x)
        x = x if isinstance(x, tuple) else (x,)
    jax.block_until_ready(x)
    x = x0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(*x)
        x = x if isinstance(x, tuple) else (x,)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--c", type=int, default=48)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--pallas", action="store_true",
                    help="also time the fused Pallas bank_mix kernel")
    a = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from forest_tpu.models.spatial import EdgeAwareSmoothingConv2D
    from forest_tpu.ops.smoothing import (bank_mix, bank_mix_xla,
                                          depthwise_bank_conv,
                                          _direction_bank, _sobel)

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    b, hw, c = a.batch, a.hw, a.c
    dt = jnp.dtype(a.dtype)
    key = jax.random.key(0)
    x = jax.random.normal(key, (b, hw, hw, c), jnp.float32)

    mod = EdgeAwareSmoothingConv2D(channels=c, compute_dtype=a.dtype)
    params = mod.init(key, x)

    results = {}

    def rec(name, fn, *args, **kw):
        try:
            sec = timeit_chained(fn, *args, **kw)
        except Exception as e:  # relay compiles are flaky; keep going
            print(json.dumps({"component": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}))
            sys.stdout.flush()
            return
        results[name] = sec * 1e3
        print(json.dumps({"component": name, "ms": round(sec * 1e3, 3)}))
        sys.stdout.flush()

    variants = [("xla", False)] + ([("pallas", None)] if a.pallas else [])
    for tag, up in variants:
        modv = EdgeAwareSmoothingConv2D(channels=c, compute_dtype=a.dtype,
                                        use_pallas=up)

        # full block fwd (x -> out, same shape: chainable)
        f_full = jax.jit(lambda x: modv.apply(params, x))
        rec(f"block_fwd_{tag}", f_full, x, iters=a.iters)

        # fwd+bwd incl param AND input grads, chained through a scalar that
        # consumes every gradient leaf (otherwise XLA DCEs the backward).
        gfn = jax.value_and_grad(
            lambda p, x: jnp.sum(modv.apply(p, x).astype(jnp.float32)),
            argnums=(0, 1))

        @jax.jit
        def fb(x):
            loss, (gp, gx) = gfn(params, x)
            gsum = sum(jnp.sum(v.astype(jnp.float32))
                       for v in jax.tree_util.tree_leaves(gp))
            return x + 0.0 * (loss + gsum) + 0.0 * gx
        rec(f"block_fwdbwd_{tag}", fb, x, iters=a.iters)

    bank = _direction_bank()
    xc = x.astype(dt)

    # 3. banks only
    @jax.jit
    def banks(x):
        fine = depthwise_bank_conv(x, bank, dilation=1)
        coarse = depthwise_bank_conv(x, bank, dilation=3)
        return jnp.sum(fine + coarse, axis=-1) + x
    rec("banks_fwd", banks, xc, iters=a.iters)

    # 4. sobel grouped conv
    sx, sy = _sobel()

    @jax.jit
    def grads(x):
        return jnp.sum(depthwise_bank_conv(x, np.stack([sx, sy])), -1) + x
    rec("sobel_fwd", grads, xc, iters=a.iters)

    # 5. banks + mixing einsum (the bank_mix XLA surface), chained
    k, r = 8, 4
    aw = jax.nn.softmax(jax.random.normal(key, (b, hw, hw, k, r), dt), 3)
    bw = jax.nn.softmax(jax.random.normal(key, (b, hw, hw, c, r), dt), 4)

    @jax.jit
    def bmix_xla(x, aw, bw):
        return bank_mix_xla(x, aw, bw), aw, bw
    rec("bankmix_xla_fwd", bmix_xla, xc, aw, bw, iters=a.iters)

    @jax.jit
    def bmix_xla_fb(x, aw, bw):
        g = jax.grad(lambda x: jnp.sum(
            bank_mix_xla(x, aw, bw).astype(jnp.float32)))(x)
        return g, aw, bw
    rec("bankmix_xla_fwdbwd", bmix_xla_fb, xc, aw, bw, iters=a.iters)

    # 6. dense convs only (backbone + heads + gate path)
    import flax.linen as nn

    class DenseOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            feat = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=dt)(
                jnp.concatenate([x, x], -1)))
            al = nn.Conv(k * r, (1, 1), dtype=dt)(feat)
            bl = nn.Conv(c * r, (1, 1), dtype=dt)(feat)
            g0 = nn.Conv(64, (3, 3), padding="SAME", dtype=dt)(x)
            g1 = nn.Conv(c, (3, 3), padding="SAME", dtype=dt)(nn.relu(g0))
            return x + g1 + jnp.sum(al, -1, keepdims=True) \
                + jnp.sum(bl, -1, keepdims=True)

    dm = DenseOnly()
    dp = dm.init(key, xc)
    f_dense = jax.jit(lambda x: dm.apply(dp, x))
    rec("dense_convs_fwd", f_dense, xc, iters=a.iters)

    if a.pallas:
        # numerical parity of the fused kernel vs XLA on REAL hardware
        xs, aws, bws = xc[:2], aw[:2], bw[:2]

        def gsum(fn):
            def loss(x, aw, bw):
                return jnp.sum(fn(x, aw, bw).astype(jnp.float32) ** 2)
            return jax.value_and_grad(loss, argnums=(0, 1, 2))(xs, aws, bws)
        try:
            v_p, g_p = jax.jit(lambda: gsum(
                lambda *t: bank_mix(*t, use_pallas=True)))()
            v_x, g_x = jax.jit(lambda: gsum(
                lambda *t: bank_mix(*t, use_pallas=False)))()
            err = max(float(jnp.max(jnp.abs(a1.astype(jnp.float32)
                                            - a2.astype(jnp.float32))))
                      for a1, a2 in zip(
                          jax.tree_util.tree_leaves((v_p, g_p)),
                          jax.tree_util.tree_leaves((v_x, g_x))))
            rel = abs(float(v_p) - float(v_x)) / max(abs(float(v_x)), 1e-9)
            print(json.dumps({"component": "parity_tpu",
                              "grad_max_abs_err": err, "loss_rel_err": rel}))
        except Exception as e:
            print(json.dumps({"component": "parity_tpu",
                              "error": f"{type(e).__name__}: {e}"[:200]}))
        sys.stdout.flush()

        @jax.jit
        def bmix_pl(x, aw, bw):
            return bank_mix(x, aw, bw, use_pallas=True), aw, bw
        rec("bankmix_pallas_fwd", bmix_pl, xc, aw, bw, iters=a.iters)

        @jax.jit
        def bmix_pl_fb(x, aw, bw):
            g = jax.grad(lambda x: jnp.sum(
                bank_mix(x, aw, bw, use_pallas=True).astype(jnp.float32)))(x)
            return g, aw, bw
        rec("bankmix_pallas_fwdbwd", bmix_pl_fb, xc, aw, bw, iters=a.iters)

    print(json.dumps({"summary": {k: round(v, 2) for k, v in
                                  results.items()}}))


if __name__ == "__main__":
    main()
