"""forest-tpu benchmark: prints ONE JSON line for the driver.

Primary metric (BASELINE.json): VQ quantize microseconds per 32x32 patch
(1024 pixels, D=128, K=256), measured on the available accelerator amortized
over a large multi-patch dispatch. ``vs_baseline`` is the speedup over a
torch-CPU reference implementation of the identical computation measured in
the same process (the reference repo's compute substrate is torch/BLAS on
CPU workers + cuDNN -- SURVEY.md §0; torch-CPU is the portable stand-in).

Extra fields report end-to-end pipeline numbers: synthetic-cube training
throughput (samples/sec through loader + jitted step) and zarr chunk decode
rate.

Usage: python bench.py  (uses the session's default JAX backend: TPU)
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

N_PATCH_PIXELS = 1024  # 32x32
D, K = 128, 256
N_PATCHES = 128
WARMUP, ITERS = 3, 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_tpu_quantize():
    """Full fused quantize -- the BASELINE.json hot-core contract: codebook
    L2 distances, argmin assignment, one-hot gather (quantized vectors), and
    the EMA sufficient statistics (per-code counts + vector sums). The
    torch-CPU baseline below runs the identical computation.

    Timing chains the carry: each iteration folds every kernel output back
    into the (tiny) codebook, so dispatches serialize, nothing is DCE'd, and
    nothing can be deduplicated/overlapped (CLAUDE.md rule -- independent
    dispatches under-report >100x through the axon relay).
    """
    import jax
    import jax.numpy as jnp

    from forest_tpu.ops import vq

    r = np.random.default_rng(0)
    n = N_PATCHES * N_PATCH_PIXELS
    x = jnp.asarray(r.normal(size=(n, D)).astype(np.float32))
    cb0 = jnp.asarray(r.normal(size=(K, D)).astype(np.float32))

    results = {}
    for name, up in [("xla", False), ("pallas", True)]:
        try:
            def body(i, cb, _up=up):
                idx, q, counts, sums = vq.vq_core(x, cb, use_pallas=_up)
                return cb + 1e-12 * (jnp.sum(idx).astype(jnp.float32)
                                     + jnp.sum(counts) + q[0, 0]
                                     + sums[0, 0])

            run = jax.jit(lambda cb: jax.lax.fori_loop(0, ITERS, body, cb))
            t0 = time.perf_counter()
            jax.block_until_ready(run(cb0))
            log(f"[bench] {name} compile {time.perf_counter() - t0:.1f}s")
            for _ in range(WARMUP):
                out = run(cb0)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                out = run(cb0)
            jax.block_until_ready(out)
            us_per_patch = ((time.perf_counter() - t0) / (reps * ITERS)
                            / N_PATCHES * 1e6)
            log(f"[bench] {name}: {us_per_patch:.3f} us/patch "
                f"(chained x{ITERS}, {reps} reps)")
            results[name] = us_per_patch
        except Exception as e:  # pragma: no cover
            log(f"[bench] {name} failed: {type(e).__name__}: {e}")
    if not results:
        return None, {}
    best = min(results.items(), key=lambda kv: kv[1])
    return best, {f"quantize_{k}_us": round(v, 3)
                  for k, v in results.items()}


def bench_torch_cpu_quantize():
    import os

    import torch

    # The session env pins BLAS to 1 thread; give the CPU baseline all cores
    # so vs_baseline is a fair chip-vs-socket comparison.
    try:
        torch.set_num_threads(os.cpu_count() or 1)
    except Exception:
        pass
    torch.manual_seed(0)
    n = N_PATCHES * N_PATCH_PIXELS
    x = torch.randn(n, D)
    cb = torch.randn(K, D)

    def f(cb):
        # The identical full fused-quantize contract the TPU bench runs:
        # distances, argmin, one-hot gather, EMA counts + sums.
        d = (x * x).sum(1, keepdim=True) - 2.0 * x @ cb.T \
            + (cb * cb).sum(1)[None, :]
        idx = d.argmin(1)
        oh = torch.nn.functional.one_hot(idx, K).float()
        q = oh @ cb
        counts = oh.sum(0)
        sums = oh.T @ x
        # Same chained-carry shape as the TPU bench (torch is synchronous so
        # this is symmetry, not necessity).
        return cb + 1e-12 * (idx.sum().float() + counts.sum()
                             + q[0, 0] + sums[0, 0])

    for _ in range(2):
        cb = f(cb)
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        cb = f(cb)
    us = (time.perf_counter() - t0) / iters / N_PATCHES * 1e6
    log(f"[bench] torch-cpu: {us:.3f} us/patch "
        f"({torch.get_num_threads()} threads)")
    return us


def bench_pipeline(tmpdir: str):
    """Short end-to-end training throughput on a synthetic cube."""
    import jax
    import jax.numpy as jnp

    from forest_tpu.data.cube import build_synthetic_cube
    from forest_tpu.data.loader import PrefetchLoader
    from forest_tpu.data.samplers import ChunkBatchSampler
    from forest_tpu.data.schema import build_and_save_schema
    from forest_tpu.data.vqvae_dataset import VQVAEDataset
    from forest_tpu.models.vqvae import VQVAE
    from forest_tpu.training import vqvae_step
    from forest_tpu.training.train_vqvae import host_to_device_batch

    cube = build_synthetic_cube(f"{tmpdir}/cube.zarr", height=256, width=256,
                                chunk_yx=32, patch_size=32, seed=0)
    sp = build_and_save_schema(cube, f"{tmpdir}/run", 1024, 100,
                               min_hits_per_epoch=1)
    ds = VQVAEDataset(f"{tmpdir}/cube.zarr", sp, split="train",
                      block_size=(1, 1))
    batch_size = 4096
    model = VQVAE(cont_dim=len(ds.cont_names),
                  cat_vocab_sizes={n: ds.schema_cat[n]["num_ids"]
                                   for n in ds.cat_names},
                  naip_bands=ds.naip.shape[-1],
                  num_timesteps=len(ds.ds["years"]),
                  emb_dim=D, codebook_size=K, hidden=128, quantizer="ema")
    opt = vqvae_step.make_optimizer(3e-4)
    sampler = ChunkBatchSampler(ds.xy_by_chunk, batch_size, seed=0,
                                replacement_within_chunk=True)
    first = host_to_device_batch(ds.load_batch(next(iter(sampler))))
    state = vqvae_step.init_train_state(model, opt, first, jax.random.key(0))
    step = jax.jit(vqvae_step.make_train_step(model, opt), donate_argnums=0)
    w = {k: jnp.float32(1.0) for k in ("cont", "cat", "canopy", "vq")}

    t0 = time.perf_counter()
    state, m = step(state, first, w, jax.random.key(0))
    jax.block_until_ready(m["loss/total"])
    log(f"[bench] train step compile {time.perf_counter() - t0:.1f}s")

    # chunk decode rate (host)
    t0 = time.perf_counter()
    nchunks = 32
    for i in range(nchunks):
        ds.cube.continuous.read_chunk((0, 0, i % 8, (i // 8) % 8))
    chunk_rate = nchunks / (time.perf_counter() - t0)

    n_steps, n_samples = 0, 0
    loader = PrefetchLoader(ds, sampler, num_workers=8, prefetch=4)
    t0 = time.perf_counter()
    for batch in loader:
        state, m = step(state, host_to_device_batch(batch), w,
                        jax.random.key(n_steps))
        n_steps += 1
        n_samples += batch_size
        if n_steps >= 30:
            break
    jax.block_until_ready(m["loss/total"])
    sps = n_samples / (time.perf_counter() - t0)
    log(f"[bench] pipeline: {sps:,.0f} samples/s  "
        f"chunk decode {chunk_rate:,.0f} chunks/s")
    return sps, chunk_rate


def bench_frl_step(iters: int = 10):
    """Production-scale FRL train step (B=12, 256^2, bf16 smoothing, fused
    Pallas kernel). Returns (ms_per_batch, speedup_vs_A40_reference)."""
    import importlib.util
    import io
    import pathlib
    from contextlib import redirect_stdout

    spec = importlib.util.spec_from_file_location(
        "bench_frl_step",
        pathlib.Path(__file__).parent / "scripts" / "bench_frl_step.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    frl_main = mod.main

    buf = io.StringIO()
    with redirect_stdout(buf):
        frl_main(["--bf16-smoothing", "--iters", str(iters)])
    out = buf.getvalue()
    log(out.strip())
    for line in out.splitlines():
        if line.startswith("steady step:"):
            ms = float(line.split("steady step:")[1].split("ms/batch")[0])
            x = float(line.split("-> ")[1].split("x reference")[0])
            return ms, x
    raise RuntimeError("frl bench produced no steady-step line")


def main():
    import tempfile

    import jax

    log(f"[bench] backend: {jax.default_backend()} devices: {jax.devices()}")
    best, per_kernel = bench_tpu_quantize()
    if best is None:
        # The driver contract is ONE JSON line no matter what.
        print(json.dumps({
            "metric": "vq_quantize_us_per_32x32_patch", "value": -1.0,
            "unit": "us", "vs_baseline": 0.0,
            "extra": {"error": "both quantize kernels failed"}}))
        return
    name, tpu_us = best
    torch_us = bench_torch_cpu_quantize()
    extra = {"kernel": name, **per_kernel}
    try:
        with tempfile.TemporaryDirectory() as td:
            sps, chunk_rate = bench_pipeline(td)
        extra.update(train_samples_per_sec=round(sps, 1),
                     zarr_chunks_per_sec=round(chunk_rate, 1))
    except Exception as e:  # pipeline bench is best-effort
        log(f"[bench] pipeline bench failed: {type(e).__name__}: {e}")
    try:
        ms, x_ref = bench_frl_step()
        extra.update(frl_step_ms=round(ms, 1), frl_vs_a40_ref=round(x_ref, 2))
    except Exception as e:  # best-effort
        log(f"[bench] frl step bench failed: {type(e).__name__}: {e}")

    print(json.dumps({
        "metric": "vq_quantize_us_per_32x32_patch",
        "value": round(tpu_us, 3),
        "unit": "us",
        "vs_baseline": round(torch_us / tpu_us, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
