"""Epoch loops: iterate the loader, run the jitted step, aggregate metrics.

Contract from /root/reference/frl/training/representation/loops.py:85-246
(SURVEY.md §2.6): per-epoch metric accumulation plus the dataloader WAIT vs
STEP time split (the key input-pipeline health metric, SURVEY.md §6.1).
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from forest_tpu.data.loader import PrefetchLoader

# Metric dicts drain device->host in blocks of this many steps: one relay
# round trip per BLOCK instead of per step, while the dispatch queue stays
# well under the relay's ~30-deep drain cliff (CLAUDE.md TIMING PROTOCOL).
_METRIC_SYNC_STEPS = 16


def _drain_metrics(pending, agg: Dict[str, float]) -> None:
    """Fetch queued (weight, device-metrics) pairs in ONE device_get and
    fold the count-weighted sums into ``agg``. Clears ``pending``."""
    if not pending:
        return
    fetched = jax.device_get([m for _, m in pending])
    for (w, _), m in zip(pending, fetched):
        for k, v in m.items():
            agg[k] = agg.get(k, 0.0) + w * float(v)
    pending.clear()


def _to_device_batch(batch: Dict[str, np.ndarray],
                     wire_compact: bool = False,
                     wire_skip: tuple = ()) -> Dict[str, Any]:
    if wire_compact:
        # Compact H2D wire (data/wire.py): floats travel bf16 (the FRL
        # production batch is ~63 MB f32 at B=12 256^2 -- H2D is byte-
        # proportional, CLAUDE.md TIMING PROTOCOL); categorical-coded
        # float groups keep f32 (EVT codes are not bf16-exact).
        # ``wire_skip`` carries the step-config-derived exact-equality
        # groups (step.wire_exact_groups) whose names the wire's
        # 'categorical' substring heuristic cannot be trusted to catch.
        # The jitted steps decode (decode_wire_batch, identity on plain
        # batches).
        from forest_tpu.data.wire import encode_wire_batch

        batch = encode_wire_batch(batch, skip=wire_skip)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def run_epoch(dataset, step_fn: Callable, state_or_params, *,
              batch_size: int, weights: Dict[str, Any],
              curriculum: Dict[str, Any], rng_seed: int,
              train: bool, num_workers: int = 4,
              max_batches: Optional[int] = None,
              scheduler_step: Optional[Callable] = None,
              mesh=None, wire_compact: Optional[bool] = None,
              wire_skip: tuple = ()):
    """Returns (state_or_params, mean-metrics dict incl. timing).

    With ``mesh`` set the step is a shard_map DP step (dp.make_dp_frl_*):
    batches are dim-0-sharded over it. Under multi-process jax every
    process computes the SAME global batch index lists (deterministic from
    the dataset + batch_size) but decodes only its own contiguous slice;
    the slices are assembled into global arrays
    (hosts.global_batch_from_local), so host IO scales with processes and
    multi-process execution is identical to single-PROCESS DP over the
    same mesh (tests/test_multihost.py). Note DP itself keeps PER-REPLICA
    batch semantics (dp.py header; torch-DDP convention): losses normalize
    over replica-local valid anchors and gradients pmean with equal
    replica weight, so a repeat-filled tail batch whose padding lands on
    some replicas weighs those replicas' (zero) gradients equally -- a
    deliberate divergence from one-device semantics on tail batches."""
    # Compact H2D wire: auto-on for TPU backends (None), explicit
    # override otherwise. Multi-process global assembly keeps the plain
    # wire (arrays cross process boundaries before the device).
    wire = (jax.default_backend() == "tpu") if wire_compact is None \
        else bool(wire_compact)
    if hasattr(dataset, "set_wire_layout"):
        # Channel-major assembly rides the wire (decode restores the
        # channel-last contract on device); multi-process global assembly
        # keeps the plain layout alongside the plain wire. Scoped to this
        # epoch (finally below): post-training consumers of the same
        # dataset object (probes, exports) expect the plain collate.
        dataset.set_wire_layout(wire and jax.process_count() == 1)
    dataset.on_epoch_start()
    n = len(dataset)
    idx_batches = [list(range(i, min(i + batch_size, n)))
                   for i in range(0, n, batch_size)]
    # The ragged tail batch is repeat-filled to the static batch shape and
    # de-weighted through the per-sample validity mask consumed by
    # process_batch (the reference trains on every sample -- reference
    # loops.py drops none). Tiny debug datasets reduce to one padded batch.
    valid_counts = [len(b) for b in idx_batches]
    idx_batches = [b + [b[-1]] * (batch_size - len(b)) for b in idx_batches]
    if max_batches:
        idx_batches = idx_batches[:max_batches]
        valid_counts = valid_counts[:max_batches]

    if mesh is not None:
        from forest_tpu.parallel import hosts
        from forest_tpu.parallel.mesh import shard_batch_pytree
        n_proc, proc_id = hosts.process_shard()
    else:
        n_proc, proc_id = 1, 0
    if n_proc > 1:
        if batch_size % n_proc:
            raise ValueError(f"batch_size {batch_size} must divide by "
                             f"{n_proc} processes")
        local_bs = batch_size // n_proc
        lo = proc_id * local_bs
        load_batches = [b[lo:lo + local_bs] for b in idx_batches]
    else:
        local_bs, lo = batch_size, 0
        load_batches = idx_batches

    loader = PrefetchLoader(dataset, iter(load_batches),
                            num_workers=num_workers)
    try:
        return _run_epoch_loop(
            loader, dataset, step_fn, state_or_params, batch_size=batch_size,
            weights=weights, curriculum=curriculum, rng_seed=rng_seed,
            train=train, scheduler_step=scheduler_step, mesh=mesh, wire=wire,
            wire_skip=wire_skip, idx_meta=(valid_counts, n_proc, lo,
                                           local_bs))
    finally:
        if hasattr(dataset, "set_wire_layout"):
            dataset.set_wire_layout(False)


def _run_epoch_loop(loader, dataset, step_fn, state_or_params, *, batch_size,
                    weights, curriculum, rng_seed, train, scheduler_step,
                    mesh, wire, wire_skip, idx_meta):
    valid_counts, n_proc, lo, local_bs = idx_meta
    if mesh is not None:
        from forest_tpu.parallel import hosts
        from forest_tpu.parallel.mesh import shard_batch_pytree
    agg: Dict[str, float] = {}
    pending: list = []  # (weight, on-device metrics) awaiting block fetch
    n_steps = 0
    n_weight = 0.0
    wait_t = step_t = 0.0
    t0 = time.perf_counter()
    t_wait = time.perf_counter()
    for i, batch in enumerate(loader):
        wait_t += time.perf_counter() - t_wait
        t_step = time.perf_counter()
        rng = jax.random.key(rng_seed * 100003 + i)
        # Global validity mask (identical on every process); each process
        # carries its own slice alongside its row slice.
        mask = np.zeros((batch_size,), bool)
        mask[:valid_counts[i]] = True
        if n_proc > 1:
            db = {k: np.asarray(v) for k, v in batch.items()}
            db["__sample_valid__"] = mask[lo:lo + local_bs]
            db = hosts.global_batch_from_local(db, mesh)
        else:
            db = _to_device_batch(batch, wire_compact=wire,
                                  wire_skip=wire_skip)
            db["__sample_valid__"] = jnp.asarray(mask)
            if mesh is not None:
                db = shard_batch_pytree(db, mesh)
        if train:
            state_or_params, m = step_fn(state_or_params, db, rng,
                                         weights, curriculum)
            if scheduler_step is not None:
                scheduler_step()
        else:
            m = step_fn(state_or_params, db, rng, weights, curriculum)
        # Metrics stay ON DEVICE and drain in blocks: a per-step
        # device_get is a relay round trip per step (up to ~30 ms on a
        # degraded link), while a block fetch pays it once per
        # _METRIC_SYNC_STEPS and still keeps the dispatch queue well
        # under the relay's ~30-deep drain cliff (CLAUDE.md TIMING
        # PROTOCOL). Weight each batch mean by its valid-sample count so
        # a repeat-filled tail batch doesn't skew epoch means (the
        # reference pools per-sample over the epoch, loops.py:85-246;
        # count-weighted batch means match that for per-sample metrics).
        pending.append((float(valid_counts[i]), m))
        if len(pending) >= _METRIC_SYNC_STEPS:
            _drain_metrics(pending, agg)
        n_steps += 1
        n_weight += float(valid_counts[i])
        step_t += time.perf_counter() - t_step
        t_wait = time.perf_counter()

    _drain_metrics(pending, agg)
    out = {k: v / max(n_weight, 1.0) for k, v in agg.items()}
    out["n_steps"] = n_steps
    out["epoch_time_s"] = time.perf_counter() - t0
    out["wait_s"] = wait_t
    out["step_s"] = step_t
    return state_or_params, out


def train_epoch(dataset, train_step, state, **kw):
    return run_epoch(dataset, train_step, state, train=True, **kw)


def validate_epoch(dataset, eval_step, params, **kw):
    _, m = run_epoch(dataset, eval_step, params, train=False, **kw)
    return m


__all__ = ["run_epoch", "train_epoch", "validate_epoch"]
