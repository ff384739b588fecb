"""FRL train/eval step wrappers: grads, NaN containment, optimizer.

Numerical-failure containment contract (SURVEY.md §6.3): a non-finite batch
loss or gradient skips the update (params/opt state unchanged) and reports
``skipped=1`` -- the jit-safe equivalent of the reference's per-batch skip
(step.py:1057-1074).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from forest_tpu.data import wire

Array = jax.Array

# Per-replica COUNT metrics: psum'd across the data mesh so multi-chip
# reports match single-chip semantics (a global count over the global
# batch). Everything else is a mean -> pmean.
_COUNT_METRICS = frozenset({
    "samples_skipped", "n_anchors_valid", "spectral_n_anchors",
    "phase_pairs_valid",
})


def _sync_metrics(metrics: Dict[str, Array], axis_name: str
                  ) -> Dict[str, Array]:
    return {
        k: (jax.lax.psum(v, axis_name) if k in _COUNT_METRICS
            else jax.lax.pmean(v, axis_name))
        for k, v in metrics.items()
    }


class FRLTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Array


def make_optimizer(learning_rate, weight_decay: float = 1e-4,
                   grad_clip: float = 1.0) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(learning_rate, weight_decay=weight_decay))


def init_train_state(params, optimizer) -> FRLTrainState:
    return FRLTrainState(params, optimizer.init(params),
                         jnp.zeros((), jnp.int32))


def _microbatch_groups(b: int, cap: int) -> int:
    """Number of equal-size microbatches for a batch of ``b`` under ``cap``.

    Equal sizes are required by ``lax.scan`` (one compiled per-microbatch
    graph); the group count grows past ceil(b/cap) only when b is not
    divisible (prime batch sizes degrade toward per-sample groups -- use
    even batches)."""
    g = -(-b // cap)
    while b % g:
        g += 1
    return g


def default_frl_microbatch_cap() -> int | None:
    """Auto microbatch cap for the FRL train step on this backend.

    On TPU: the Pallas smoothing fault envelope (ops/smoothing), so every
    per-microbatch grad graph keeps the measured-passing B<=17 geometry and
    the fast Pallas smoothing path. Elsewhere: None (no microbatching)."""
    from forest_tpu.ops import smoothing
    from forest_tpu.ops._util import on_tpu

    return smoothing._PALLAS_MAX_BATCH if on_tpu() else None


def make_train_step(process_batch: Callable, optimizer,
                    axis_name: str | None = None,
                    microbatch_size: int | None = None) -> Callable:
    """With ``axis_name`` set (inside shard_map over the data mesh),
    gradients and metrics are pmean'd across replicas. A non-finite loss on
    ANY replica poisons the pmean'd gradients, so the finite-check below
    (taken after the pmean) yields one consistent global skip decision --
    replicas can never diverge. Cross-batch losses inside process_batch pool
    anchors over the REPLICA-local batch (the reference's per-GPU batch
    semantics scaled by adding replicas).

    ``microbatch_size`` (VERDICT r4 task #4 -- in-graph gradient
    accumulation): None auto-selects :func:`default_frl_microbatch_cap`;
    0 disables. When the (trace-time) replica batch exceeds the cap, the
    step ``lax.scan``s over equal-size microbatch grad computations -- each
    per-microbatch graph identical to the small-batch geometry (on TPU:
    inside the Pallas smoothing fault envelope, so large batches keep the
    fast Pallas path instead of the 3x-slower chunked-remat XLA fallback)
    -- sums the gradients, and applies ONE optimizer update. Semantics
    match standard gradient accumulation (and the reference's per-GPU DP
    pooling): cross-sample losses pool over each microbatch; per-microbatch
    loss/metric means are averaged with equal weight."""
    def train_step(state: FRLTrainState, batch, rng, weights, curriculum):
        batch = wire.decode_wire_batch(batch)  # no-op on plain batches
        cap = (default_frl_microbatch_cap() if microbatch_size is None
               else (microbatch_size or None))
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]

        def loss_fn(params, mbatch, mrng):
            return process_batch(params, mbatch, mrng, weights, curriculum,
                                 True)

        if cap is not None and b > cap:
            g = _microbatch_groups(b, cap)
            stacked = jax.tree.map(
                lambda x: x.reshape((g, b // g) + x.shape[1:]), batch)

            def scan_body(carry, inp):
                i, mbatch = inp
                (loss_i, metrics_i), grads_i = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, mbatch,
                                           jax.random.fold_in(rng, i))
                grad_acc, loss_acc, m_acc = carry
                m_acc = jax.tree.map(jnp.add, m_acc, metrics_i)
                return (jax.tree.map(jnp.add, grad_acc, grads_i),
                        loss_acc + loss_i, m_acc), None

            zeros_like_f32 = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            # One dry trace for the metrics STRUCTURE only (zero-cost: the
            # accumulator init just needs matching pytree/zeros).
            m_shape = jax.eval_shape(
                lambda p: loss_fn(p, jax.tree.map(lambda x: x[0], stacked),
                                  rng)[1], state.params)
            m_zero = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                  m_shape)
            (grads, loss, m_sum), _ = jax.lax.scan(
                scan_body, (zeros_like_f32, jnp.float32(0.0), m_zero),
                (jnp.arange(g), stacked))
            inv_g = 1.0 / g
            grads = jax.tree.map(lambda x: x * inv_g, grads)
            loss = loss * inv_g
            # Counts (all integer-dtype metrics) partition across the
            # microbatches, so their SUM equals the full-batch count;
            # float metrics are per-microbatch means -> equal-weight mean.
            metrics = {k: (v if k in _COUNT_METRICS
                           or not jnp.issubdtype(v.dtype, jnp.inexact)
                           else v * inv_g)
                       for k, v in m_sum.items()}
        else:
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch, rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            metrics = _sync_metrics(metrics, axis_name)
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        safe_grads = jax.tree.map(
            lambda g: jnp.where(finite, jnp.nan_to_num(g), 0.0), grads)
        updates, opt_state = optimizer.update(safe_grads, state.opt_state,
                                              state.params)
        new_params = optax.apply_updates(state.params, updates)

        def pick(new, old):
            return jax.tree.map(
                lambda a, b: jnp.where(finite, a, b), new, old)

        metrics["grad_norm"] = gnorm
        metrics["skipped"] = (~finite).astype(jnp.int32)
        return FRLTrainState(pick(new_params, state.params),
                             pick(opt_state, state.opt_state),
                             state.step + 1), metrics

    return train_step


def make_eval_step(process_batch: Callable,
                   axis_name: str | None = None) -> Callable:
    def eval_step(params, batch, rng, weights, curriculum):
        batch = wire.decode_wire_batch(batch)  # no-op on plain batches
        _, metrics = process_batch(params, batch, rng, weights, curriculum,
                                   False)
        if axis_name is not None:
            metrics = _sync_metrics(metrics, axis_name)
        return metrics

    return eval_step


__all__ = ["FRLTrainState", "make_optimizer", "init_train_state",
           "make_train_step", "make_eval_step",
           "default_frl_microbatch_cap"]
