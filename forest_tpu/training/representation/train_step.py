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


def make_train_step(process_batch: Callable, optimizer,
                    axis_name: str | None = None) -> Callable:
    """With ``axis_name`` set (inside shard_map over the data mesh),
    gradients and metrics are pmean'd across replicas. A non-finite loss on
    ANY replica poisons the pmean'd gradients, so the finite-check below
    (taken after the pmean) yields one consistent global skip decision --
    replicas can never diverge. Cross-batch losses inside process_batch pool
    anchors over the REPLICA-local batch (the reference's per-GPU batch
    semantics scaled by adding replicas)."""
    def train_step(state: FRLTrainState, batch, rng, weights, curriculum):
        batch = wire.decode_wire_batch(batch)  # no-op on plain batches

        def loss_fn(params):
            return process_batch(params, batch, rng, weights, curriculum,
                                 True)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
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
           "make_train_step", "make_eval_step"]
