"""VQ assign-kernel variant sweep (TPU). One process, chained carries.

Isolates where assignment time goes: MXU matmul precision, tile size,
input dtype (HBM traffic), and the VPU argmin passes. Informs the
production settings of forest_tpu.ops.vq._vq_assign_pallas.
"""
from __future__ import annotations

# Containers can lose the editable install between rounds; make the
# repo-root import work regardless of pip state.
import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, K = 128 * 1024, 128, 256
ITERS = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _kernel(x_ref, c_ref, c2_ref, idx_ref, *, mxu_bf16, argmin: bool):
    x = x_ref[...]
    c = c_ref[...]
    if mxu_bf16 and x.dtype != jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
        c = c.astype(jnp.bfloat16)
    xc = jax.lax.dot_general(
        x, c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dist = c2_ref[...] - 2.0 * xc
    if argmin:
        min_d = jnp.min(dist, axis=1, keepdims=True)
        col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, dimension=1)
        idx = jnp.min(jnp.where(dist <= min_d, col, jnp.int32(dist.shape[1])),
                      axis=1)
        idx_ref[...] = idx[:, None]
    else:  # matmul-only probe: write the row-min instead (1 reduce pass)
        idx_ref[...] = jnp.min(dist, axis=1, keepdims=True).astype(jnp.int32)


def make_assign(tile_n, mxu_bf16, io_dtype, argmin=True):
    def assign(x, cb):
        xf = x.astype(io_dtype)
        cf = cb.astype(io_dtype)
        c2 = jnp.sum(cf.astype(jnp.float32) ** 2, axis=-1)[None, :]
        return pl.pallas_call(
            functools.partial(_kernel, mxu_bf16=mxu_bf16, argmin=argmin),
            grid=(N // tile_n,),
            in_specs=[
                pl.BlockSpec((tile_n, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, D), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 1), jnp.int32),
        )(xf, cf, c2)[:, 0]
    return assign


def _kernel_t(xt_ref, c_ref, c2_ref, idx_ref, *, mxu_bf16):
    """Transposed layout: anchors along LANES. dist is [K, T'], the argmin
    reduces over SUBLANES (cheap on the VPU, vs cross-lane reductions in the
    row-major kernel), and the [1, T'] index store is lane-contiguous."""
    xt = xt_ref[...]  # [D, T']
    c = c_ref[...]    # [K, D]
    if mxu_bf16 and xt.dtype != jnp.bfloat16:
        xt = xt.astype(jnp.bfloat16)
        c = c.astype(jnp.bfloat16)
    xc = jax.lax.dot_general(
        c, xt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [K, T']
    dist = c2_ref[...] - 2.0 * xc                    # c2 [K, 1] broadcasts
    min_d = jnp.min(dist, axis=0, keepdims=True)     # [1, T']
    row = jax.lax.broadcasted_iota(jnp.int32, dist.shape, dimension=0)
    idx = jnp.min(jnp.where(dist <= min_d, row, jnp.int32(dist.shape[0])),
                  axis=0, keepdims=True)             # [1, T']
    idx_ref[...] = idx


def make_assign_t(tile_t, mxu_bf16, io_dtype, pre_transposed):
    def assign(x, cb):
        xt = (x if pre_transposed else x.T).astype(io_dtype)
        cf = cb.astype(io_dtype)
        c2 = jnp.sum(cf.astype(jnp.float32) ** 2, axis=-1)[:, None]  # [K,1]
        idx = pl.pallas_call(
            functools.partial(_kernel_t, mxu_bf16=mxu_bf16),
            grid=(N // tile_t,),
            in_specs=[
                pl.BlockSpec((D, tile_t), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, D), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_t), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
        )(xt, cf, c2)
        return idx[0]
    return assign


def xla_assign(x, cb):
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    c2 = jnp.sum(cb * cb, axis=-1)
    d = x2 - 2.0 * jnp.dot(x, cb.T, preferred_element_type=jnp.float32) \
        + c2[None, :]
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def timeit(name, fn, x, cb0):
    def body(i, cb):
        idx = fn(x, cb)
        return cb + 1e-12 * jnp.sum(idx).astype(jnp.float32)

    run = jax.jit(lambda cb: jax.lax.fori_loop(0, ITERS, body, cb))
    t0 = time.perf_counter()
    jax.block_until_ready(run(cb0))
    comp = time.perf_counter() - t0
    out = run(cb0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = run(cb0)
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / (reps * ITERS) * 1e6
    log(f"{name:42s} {us:9.1f} us/call   (compile {comp:.1f}s)")
    return us


def main():
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(N, D)).astype(np.float32))
    cb0 = jnp.asarray(r.normal(size=(K, D)).astype(np.float32))
    log(f"backend={jax.default_backend()} N={N} D={D} K={K}")

    got = np.asarray(jax.jit(make_assign_t(512, False, jnp.float32, False))(
        x, cb0))
    exp = np.asarray(jax.jit(xla_assign)(x, cb0))
    log(f"pallasT f32 mismatch vs xla: {(got != exp).mean():.6f}")

    timeit("xla", xla_assign, x, cb0)
    xt = jnp.asarray(np.ascontiguousarray(np.asarray(x).T))
    for tile in (512, 1024, 2048, 4096):
        timeit(f"pallasT bf16-mxu tileT={tile} (incl x.T)",
               make_assign_t(tile, True, jnp.float32, False), x, cb0)
        timeit(f"pallasT bf16-mxu tileT={tile} (pre-T)",
               make_assign_t(tile, True, jnp.float32, True), xt, cb0)
        timeit(f"pallasT f32     tileT={tile} (pre-T)",
               make_assign_t(tile, False, jnp.float32, True), xt, cb0)
    timeit("pallasT bf16-io tileT=2048 (pre-T)",
           make_assign_t(2048, True, jnp.bfloat16, True), xt, cb0)
    timeit("pallas row-major f32 tile=512 (ref)",
           make_assign(512, False, jnp.float32), x, cb0)


if __name__ == "__main__":
    main()
