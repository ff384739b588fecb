"""Data-parallel train-step builders over a 1-D ("data",) mesh.

Two implementations:

- ``impl="shard_map"`` (default): the step runs replica-local under Manual
  mesh axes with explicit collectives (gradient/metric pmean, VQ EMA
  sufficient-statistic psum) supplied by the ``axis_name`` plumbing in the
  step builders. This is the REQUIRED path when the Pallas kernels are on
  (the fused VQ and smoothing kernels): ``pallas_call`` only partitions
  under Manual mesh axes -- under GSPMD auto-sharding XLA treats the custom
  call as opaque and surrounds it with all-gathers (full replication).
- ``impl="gspmd"``: plain jit + sharding constraints; XLA derives the
  collectives. Kept for the pure-XLA path and as a cross-check -- both
  implementations are asserted equivalent in tests/test_vqvae_model.py.

Replicating the reference's semantics: the reference is single-GPU
(SURVEY.md §2.9), so scaling out keeps per-replica batch semantics and
psums only what the single-GPU update would see globally (gradients and the
codebook EMA statistics -- the BASELINE.json north-star contract).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from forest_tpu.models.vqvae import VQVAE
from forest_tpu.training import vqvae_step


def _shard_map_step(raw: Callable, mesh: Mesh, data_axis: str,
                    n_batch_args: int, n_repl_args: int,
                    donate: bool):
    """shard_map a step(state, batch..., repl...) -> (state, metrics)."""
    in_specs = (P(),) + (P(data_axis),) * n_batch_args \
        + (P(),) * n_repl_args
    sm = jax.shard_map(raw, mesh=mesh, in_specs=in_specs,
                       out_specs=(P(), P()))
    return jax.jit(sm, donate_argnums=(0,) if donate else ())


def make_dp_train_step(model: VQVAE, optimizer, mesh: Mesh,
                       class_weights: Optional[Dict] = None,
                       use_pallas: Optional[bool] = None,
                       data_axis: str = "data",
                       donate_state: bool = True,
                       impl: str = "shard_map",
                       **step_kw):
    """Returns jitted ``step(state, batch, loss_weights, rng)`` with the batch
    sharded over ``data_axis`` and everything else replicated."""
    if impl == "shard_map":
        raw = vqvae_step.make_train_step(model, optimizer, class_weights,
                                         use_pallas=use_pallas,
                                         axis_name=data_axis, **step_kw)
        return _shard_map_step(raw, mesh, data_axis, n_batch_args=1,
                               n_repl_args=2, donate=donate_state)

    if impl != "gspmd":
        raise ValueError(f"unknown impl {impl!r}")
    raw = vqvae_step.make_train_step(model, optimizer, class_weights,
                                     use_pallas=use_pallas, **step_kw)
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(data_axis))

    def step(state, batch, loss_weights, rng):
        # Enforce data-sharding IN-GRAPH: a caller passing an unsharded
        # host batch still gets true data parallelism (XLA reshards on
        # entry) instead of silent full replication.
        batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, bsh)
            if getattr(x, "ndim", 0) >= 1 else x, batch)
        return raw(state, batch, loss_weights, rng)

    return jax.jit(
        step,
        in_shardings=(repl, None, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )


def make_dp_frl_step(process_batch: Callable, optimizer, mesh: Mesh,
                     data_axis: str = "data", donate_state: bool = True):
    """Data-parallel FRL train step: ``step(state, batch, rng, weights,
    curriculum)`` with the batch dict sharded on dim 0 over ``data_axis``.

    shard_map-based (Manual axes) so the fused Pallas smoothing kernel
    partitions per-replica; gradients/metrics pmean'd inside the step."""
    from forest_tpu.training.representation import train_step as ts

    raw = ts.make_train_step(process_batch, optimizer, axis_name=data_axis)

    # arg order: (state, batch, rng, weights, curriculum)
    in_specs = (P(), P(data_axis), P(), P(), P())
    sm = jax.shard_map(raw, mesh=mesh, in_specs=in_specs,
                       out_specs=(P(), P()))
    return jax.jit(sm, donate_argnums=(0,) if donate_state else ())


def make_dp_eval_step(model: VQVAE, mesh: Mesh,
                      class_weights: Optional[Dict] = None,
                      use_pallas: Optional[bool] = None,
                      data_axis: str = "data"):
    """Data-parallel VQ-VAE eval: ``eval(params, batch, loss_weights) ->
    metrics`` with the batch dim-0-sharded. shard_map (Manual axes) for
    the same reason as the train step: the Pallas VQ kernel under GSPMD
    auto-sharding gets surrounded with all-gathers (full replication)."""
    raw = vqvae_step.make_eval_step(model, class_weights,
                                    use_pallas=use_pallas,
                                    axis_name=data_axis)
    in_specs = (P(), P(data_axis), P())
    sm = jax.shard_map(raw, mesh=mesh, in_specs=in_specs, out_specs=P())
    return jax.jit(sm)


def make_dp_frl_eval(process_batch: Callable, mesh: Mesh,
                     data_axis: str = "data"):
    """Data-parallel FRL eval step: ``eval(params, batch, rng, weights,
    curriculum) -> metrics`` with the batch sharded on dim 0; metrics
    pmean/psum'd inside (shard_map, same Manual-axes requirement as the
    train step -- the Pallas smoothing kernel must partition per-replica)."""
    from forest_tpu.training.representation import train_step as ts

    raw = ts.make_eval_step(process_batch, axis_name=data_axis)
    in_specs = (P(), P(data_axis), P(), P(), P())
    sm = jax.shard_map(raw, mesh=mesh, in_specs=in_specs, out_specs=P())
    return jax.jit(sm)


__all__ = ["make_dp_train_step", "make_dp_eval_step", "make_dp_frl_step",
           "make_dp_frl_eval"]
