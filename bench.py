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
# Wall-clock budget for the quantize section: the axon relay compiles
# erratically (1-10 s or 5+ min for identical graphs, CLAUDE.md). XLA runs
# first (guaranteed-compileable headline on a cold cache); the Pallas
# cross-check -- which wins the headline whenever it completes -- is
# skipped when the section budget is already spent so one bad compile
# can't push the scored bench past the driver's patience.
QUANTIZE_BUDGET_S = 150.0
# Per-section subprocess budgets. Every TPU section runs in its OWN child
# process, strictly sequentially, and the parent never opens a relay
# session: an idle parent session starves children (measured: the xla
# quantize child compiles in ~60 s alone but exceeded 180 s with the
# parent's session open), and an uninterruptible relay compile can
# otherwise block the whole bench past the driver's patience with NO JSON
# emitted. A killed child costs its budget and the bench degrades
# gracefully (xla fallback for the headline; -1 sentinel only if every
# kernel dies).
SECTION_BUDGET_S = {"probe": 90.0, "pipeline": 360.0,
                    "pallas": 240.0, "xla": 150.0}
FRL_BUDGET_S = 420.0
# Relay stalls are often transient (r2: the whole driver window was dead,
# but same-evening sessions recover within minutes). Failed sections get ONE
# retry after a cooldown -- highest-value first (quantize headline, then frl,
# then probe/pipeline) -- bounded by a global wall-clock budget so the bench
# always emits its JSON line inside the driver's patience.
GLOBAL_BUDGET_S = 1800.0
RETRY_COOLDOWN_S = 45.0
# Shorter pause after a timeout-KILLED child before launching the next one:
# the kill leaves the child's relay session (and any in-flight compile)
# dangling for a while, which starves a sibling launched immediately after.
KILL_COOLDOWN_S = 30.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _run_child(args, timeout):
    """Run ``python bench.py <args>`` with a hard timeout; relay [bench]
    stderr lines through; return the child's one-line JSON."""
    import subprocess

    p = subprocess.run([sys.executable, __file__, *args],
                       capture_output=True, text=True, timeout=timeout)
    for ln in p.stderr.splitlines():
        if ln.startswith("[bench]"):
            log(ln)
    if p.returncode != 0:
        raise RuntimeError(f"child {args} failed (rc={p.returncode}): "
                           f"{p.stderr.strip().splitlines()[-1:]}")
    return json.loads(p.stdout.strip().splitlines()[-1])


def _measure_quantize_kernel(use_pallas: bool) -> float:
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

    def body(i, cb):
        idx, q, counts, sums = vq.vq_core(x, cb, use_pallas=use_pallas)
        return cb + 1e-12 * (jnp.sum(idx).astype(jnp.float32)
                             + jnp.sum(counts) + q[0, 0]
                             + sums[0, 0])

    run = jax.jit(lambda cb: jax.lax.fori_loop(0, ITERS, body, cb))
    t0 = time.perf_counter()
    jax.block_until_ready(run(cb0))
    log(f"[bench] compile {time.perf_counter() - t0:.1f}s")
    out = cb0
    for _ in range(WARMUP):
        out = run(out)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 3
    # Chain the carry across reps too so successive dispatches can never
    # overlap or be deduplicated.
    for _ in range(reps):
        out = run(out)
    jax.block_until_ready(out)
    return ((time.perf_counter() - t0) / (reps * ITERS)
            / N_PATCHES * 1e6)


def bench_tpu_quantize(kernels=("xla", "pallas")):
    """Measure both kernels, each in its own sequential subprocess (see
    SECTION_BUDGET_S). XLA runs FIRST: with a cold compile cache the
    Pallas kernel never fits its budget (measured 3x in one session,
    healthy and degraded relays alike) while XLA compiles in ~90 s, so
    XLA-first guarantees a headline; when the cache is warm both children
    finish in seconds and min() still crowns Pallas. The cross-check is
    skipped once the section has a result and has already overspent
    QUANTIZE_BUDGET_S. A killed child gets a cooldown before the next
    launch: its uninterruptible relay compile keeps the session pinned
    briefly and starves an immediately-launched sibling (measured: the
    warm-cache xla child timed out when launched right after a pallas
    kill)."""
    import subprocess

    results = {}
    skipped = []
    t_section = time.perf_counter()
    cooldown_next = False
    for name in kernels:
        spent = time.perf_counter() - t_section
        if results and spent > QUANTIZE_BUDGET_S:
            log(f"[bench] skipping {name} cross-check: {spent:.0f}s in "
                f"quantize section > {QUANTIZE_BUDGET_S:.0f}s budget")
            skipped.append(name)
            continue
        if cooldown_next:
            log(f"[bench] cooldown {KILL_COOLDOWN_S:.0f}s after killed "
                "child (let the relay session drop)")
            time.sleep(KILL_COOLDOWN_S)
            cooldown_next = False
        try:
            val = _run_child(["--quantize-kernel", name],
                             SECTION_BUDGET_S[name])
            results[name] = float(val["us_per_patch"])
            log(f"[bench] {name}: {results[name]:.3f} us/patch "
                f"(chained x{ITERS}, 3 reps, subprocess)")
        except subprocess.TimeoutExpired:
            log(f"[bench] {name} child exceeded "
                f"{SECTION_BUDGET_S[name]:.0f}s (degraded relay?) "
                "-- killed")
            skipped.append(name)
            cooldown_next = True
        except Exception as e:  # pragma: no cover
            log(f"[bench] {name} failed: {type(e).__name__}: {e}")
            skipped.append(name)
    if not results:
        return None, {"quantize_skipped": ",".join(skipped) or "all"}
    best = min(results.items(), key=lambda kv: kv[1])
    extra = {f"quantize_{k}_us": round(v, 3) for k, v in results.items()}
    # Per-call numbers for the full fused contract (the headline win case:
    # idx + quantized vectors + EMA stats in one kernel pass).
    for k, v in results.items():
        extra[f"quantize_{k}_us_per_call"] = round(v * N_PATCHES, 1)
    if skipped:
        extra["quantize_skipped"] = ",".join(skipped)
    return best, extra


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
    """Steady-state end-to-end training throughput on a synthetic cube,
    with the component rates (chunk decode, host batch assembly, device
    step) reported separately so the e2e number can be sanity-checked
    against its bottleneck (this host has ONE core: e2e is host-bound).

    Measurement protocol (VERDICT weak #1): warm every stage first, then
    time >= MIN_BATCHES batches or a fixed window, whichever is longer in
    sample count; decode rate over >= 512 chunk reads.
    """
    import itertools

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

    def make_sampler(seed):
        return ChunkBatchSampler(ds.xy_by_chunk, batch_size, seed=seed,
                                 replacement_within_chunk=True)

    first = host_to_device_batch(ds.load_batch(next(iter(make_sampler(0)))))
    state = vqvae_step.init_train_state(model, opt, first, jax.random.key(0))
    step = jax.jit(vqvae_step.make_train_step(model, opt), donate_argnums=0)
    w = {k: jnp.float32(1.0) for k in ("cont", "cat", "canopy", "vq")}

    t0 = time.perf_counter()
    state, m = step(state, first, w, jax.random.key(0))
    jax.block_until_ready(m["loss/total"])
    log(f"[bench] train step compile {time.perf_counter() - t0:.1f}s")
    extra = {}

    # -- component 1: chunk decode rate (blosc decode + reshape, host) ----
    arr = ds.cube.continuous
    ny = -(-arr.shape[-2] // arr.chunks[-2])
    nx = -(-arr.shape[-1] // arr.chunks[-1])
    coords = [(0, 0, i % ny, (i // ny) % nx) for i in range(512)]
    for c in coords[:ny * nx]:  # warm page cache over the full grid
        arr.read_chunk(c)
    t0 = time.perf_counter()
    for c in coords:
        arr.read_chunk(c)
    chunk_rate = len(coords) / (time.perf_counter() - t0)
    extra["zarr_chunks_per_sec"] = round(chunk_rate, 1)

    # -- component 2: host batch assembly (decode + slice + collate) ------
    idxs = list(itertools.islice(iter(make_sampler(1)), 8))
    ds.load_batch(idxs[0])  # warm
    t0 = time.perf_counter()
    for b in idxs:
        ds.load_batch(b)
    host_sps = len(idxs) * batch_size / (time.perf_counter() - t0)
    extra["host_assembly_samples_per_sec"] = round(host_sps, 1)

    # -- component 3: device step only (state-chained, fixed batch) -------
    fixed = host_to_device_batch(ds.load_batch(idxs[0]))
    for i in range(3):
        state, m = step(state, dict(fixed), w, jax.random.key(i))
    jax.block_until_ready(m["loss/total"])
    t0 = time.perf_counter()
    dev_iters = 50
    for i in range(dev_iters):
        state, m = step(state, dict(fixed), w, jax.random.key(i))
    jax.block_until_ready(m["loss/total"])
    dev_ms = (time.perf_counter() - t0) / dev_iters * 1e3
    extra["device_step_ms"] = round(dev_ms, 3)
    extra["device_samples_per_sec"] = round(batch_size / dev_ms * 1e3, 1)

    # -- end-to-end: warm the loader, then measure a steady-state window --
    chained = itertools.chain.from_iterable(
        make_sampler(2 + e) for e in range(1000))
    loader = PrefetchLoader(ds, chained, num_workers=8, prefetch=4)
    it = iter(loader)
    warm, measure, window_s = 12, 120, 25.0
    for i in range(warm):  # let workers spin up + caches warm
        state, m = step(state, host_to_device_batch(next(it)), w,
                        jax.random.key(i))
    jax.block_until_ready(m["loss/total"])
    n_steps = 0
    t0 = time.perf_counter()
    while n_steps < measure or time.perf_counter() - t0 < window_s:
        state, m = step(state, host_to_device_batch(next(it)), w,
                        jax.random.key(n_steps))
        n_steps += 1
        if n_steps >= 4 * measure:
            break
    jax.block_until_ready(m["loss/total"])
    sps = n_steps * batch_size / (time.perf_counter() - t0)
    extra["train_samples_per_sec"] = round(sps, 1)
    extra["e2e_batches_measured"] = n_steps
    log(f"[bench] pipeline e2e: {sps:,.0f} samples/s over {n_steps} batches"
        f" | decode {chunk_rate:,.0f} chunks/s"
        f" | host assembly {host_sps:,.0f} samples/s"
        f" | device step {dev_ms:.2f} ms ({batch_size / dev_ms * 1e3:,.0f}"
        f" samples/s)")
    return extra


def bench_frl_step(iters: int = 10):
    """Production-scale FRL train step (B=12, 256^2, bf16 smoothing, fused
    Pallas kernel), in a subprocess with a hard timeout so a hung relay
    compile cannot stall the scored bench (healthy compile ~35 s; the
    budget covers a slow one). Returns (ms_per_batch, speedup_vs_A40)."""
    import pathlib
    import subprocess

    script = pathlib.Path(__file__).parent / "scripts" / "bench_frl_step.py"
    p = subprocess.run(
        [sys.executable, str(script), "--bf16-smoothing",
         "--iters", str(iters)],
        capture_output=True, text=True, timeout=FRL_BUDGET_S)
    out = p.stdout
    log(out.strip())
    if p.returncode != 0:
        raise RuntimeError(
            f"frl bench child failed (rc={p.returncode}): "
            f"{p.stderr.strip().splitlines()[-1:]}")
    for line in out.splitlines():
        if line.startswith("steady step:"):
            ms = float(line.split("steady step:")[1].split("ms/batch")[0])
            x = float(line.split("-> ")[1].split("x reference")[0])
            return ms, x
    raise RuntimeError("frl bench produced no steady-step line")


def probe_dispatch_latency():
    """Median per-dispatch latency of a tiny chained op (relay health).

    The axon relay sometimes enters a degraded state (long compiles AND
    elevated per-dispatch latency); this probe makes that visible in the
    scored extra so a slow pipeline number can be attributed to relay
    state rather than the code.
    """
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    x = f(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    n = 200
    for _ in range(n):
        x = f(x)
    jax.block_until_ready(x)
    us = (time.perf_counter() - t0) / n * 1e6
    log(f"[bench] dispatch latency: {us:.0f} us/op (chained x{n})")
    return round(us, 1)


def _probe_child() -> None:
    """Child mode (--section probe): the relay-health probe runs in its
    OWN tiny child so it still lands in the scored extra when the longer
    pipeline child times out (the probe is what makes a slow pipeline
    number attributable to relay state)."""
    import jax

    from forest_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    log(f"[bench] backend: {jax.default_backend()} "
        f"devices: {jax.devices()}")
    print(json.dumps({"dispatch_latency_us": probe_dispatch_latency()}))


def _pipeline_child() -> None:
    """Child mode (--section pipeline): pipeline component/e2e rates."""
    import tempfile

    from forest_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    extra = {}
    with tempfile.TemporaryDirectory() as td:
        extra.update(bench_pipeline(td))
    print(json.dumps(extra))


def main():
    import subprocess

    t_start = time.perf_counter()

    def budget_left():
        return GLOBAL_BUDGET_S - (time.perf_counter() - t_start)

    def try_section(section):
        try:
            return _run_child(["--section", section],
                              SECTION_BUDGET_S[section])
        except subprocess.TimeoutExpired:
            log(f"[bench] {section} child exceeded "
                f"{SECTION_BUDGET_S[section]:.0f}s -- killed; cooldown "
                f"{KILL_COOLDOWN_S:.0f}s before the next child")
            time.sleep(KILL_COOLDOWN_S)
        except Exception as e:  # probe/pipeline are best-effort
            log(f"[bench] {section} bench failed: {type(e).__name__}: {e}")
        return None

    extra = {}
    # Pipeline FIRST: its numbers are relay-health-sensitive (the round-1
    # driver run measured 83k samples/s in a process whose first compile
    # took 230 s, vs 669k standalone), so measure it before the quantize
    # section's potentially-long compiles can degrade the relay. Each TPU
    # section is its own child process; the parent NEVER opens a relay
    # session (an idle parent session starves children -- header note).
    failed = []
    for section in ("probe", "pipeline"):
        out = try_section(section)
        if out is None:
            failed.append(section)
        else:
            extra.update(out)

    best, per_kernel = bench_tpu_quantize()
    if best is None and budget_left() > (SECTION_BUDGET_S["xla"]
                                         + RETRY_COOLDOWN_S):
        # The headline metric gets the first retry slot: without it the
        # whole bench scores -1 (r2). A transient relay stall often clears
        # within a minute. Retry XLA, not Pallas: a cold Pallas compile
        # never fits its budget anyway (>240 s even on a healthy relay),
        # while XLA fits when the stall has cleared.
        log(f"[bench] quantize failed -- cooldown {RETRY_COOLDOWN_S:.0f}s "
            "then one retry (xla only)")
        time.sleep(RETRY_COOLDOWN_S)
        best, retry_kernel = bench_tpu_quantize(kernels=("xla",))
        per_kernel = {**per_kernel, **retry_kernel,
                      "quantize_retried": "xla"}
    if best is None:
        # The driver contract is ONE JSON line no matter what.
        print(json.dumps({
            "metric": "vq_quantize_us_per_32x32_patch", "value": -1.0,
            "unit": "us", "vs_baseline": 0.0,
            "extra": {"error": "both quantize kernels failed/timed out",
                      **per_kernel, **extra,
                      "sections_timed_out": ",".join(failed) or "none"}}))
        return
    name, tpu_us = best
    torch_us = bench_torch_cpu_quantize()
    extra = {"kernel": name, **per_kernel, **extra}

    for attempt in range(2):
        if "frl_step_ms" in extra or budget_left() < FRL_BUDGET_S:
            break
        try:
            ms, x_ref = bench_frl_step()
            extra.pop("frl_step_error", None)
            extra.update(frl_step_ms=round(ms, 1),
                         frl_vs_a40_ref=round(x_ref, 2))
        except Exception as e:  # best-effort
            log(f"[bench] frl step bench failed (attempt {attempt + 1}): "
                f"{type(e).__name__}: {e}")
            extra["frl_step_error"] = type(e).__name__
            if attempt == 0 and budget_left() > (FRL_BUDGET_S
                                                 + RETRY_COOLDOWN_S):
                time.sleep(RETRY_COOLDOWN_S)

    # Last: one retry each for failed probe/pipeline sections, lowest value
    # first priority-wise but only with leftover budget.
    still_failed = []
    for section in failed:
        if budget_left() > SECTION_BUDGET_S[section] + RETRY_COOLDOWN_S:
            log(f"[bench] retrying {section} after cooldown")
            time.sleep(RETRY_COOLDOWN_S)
            out = try_section(section)
            if out is not None:
                extra.update(out)
                continue
        still_failed.append(section)
    if still_failed:
        # A probe timeout means even backend init / an x+1 compile hung:
        # the relay itself is down or fully degraded -- make that
        # attribution explicit in the scored artifact.
        extra["sections_timed_out"] = ",".join(still_failed)

    print(json.dumps({
        "metric": "vq_quantize_us_per_32x32_patch",
        "value": round(tpu_us, 3),
        "unit": "us",
        "vs_baseline": round(torch_us / tpu_us, 2),
        "extra": extra,
    }))


def _quantize_child(kernel: str) -> None:
    """Child mode (--quantize-kernel): measure ONE kernel, print a one-line
    JSON; the parent enforces the wall-clock budget by killing us."""
    from forest_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    us = _measure_quantize_kernel(use_pallas=(kernel == "pallas"))
    print(json.dumps({"us_per_patch": us}))


if __name__ == "__main__":
    # The axon sitecustomize pins the platform regardless of JAX_PLATFORMS
    # (env vars alone are ignored -- CLAUDE.md); jax.config is the only
    # override that works. Lets CI run bench sections on CPU.
    _plat = __import__("os").environ.get("FOREST_TPU_BENCH_PLATFORM")
    if _plat:
        import jax

        jax.config.update("jax_platforms", _plat)
    if len(sys.argv) >= 3 and sys.argv[1] == "--quantize-kernel":
        _quantize_child(sys.argv[2])
    elif len(sys.argv) >= 3 and sys.argv[1:3] == ["--section", "pipeline"]:
        _pipeline_child()
    elif len(sys.argv) >= 3 and sys.argv[1:3] == ["--section", "probe"]:
        _probe_child()
    else:
        main()
