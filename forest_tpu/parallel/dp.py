"""Data-parallel train-step builder (pjit over a 1-D data mesh).

Wraps :func:`forest_tpu.training.vqvae_step.make_train_step` (a pure
function) with mesh shardings: state/weights replicated, batch sharded on
axis 0. XLA inserts the gradient all-reduce and the psum of the VQ codebook
EMA sufficient statistics (counts/sums are ``jnp.sum`` over the global batch,
which under a sharded batch IS the cross-replica reduction) -- the
BASELINE.json north-star contract with zero hand-written collectives.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from forest_tpu.models.vqvae import VQVAE
from forest_tpu.training import vqvae_step


def make_dp_train_step(model: VQVAE, optimizer, mesh: Mesh,
                       class_weights: Optional[Dict] = None,
                       use_pallas: Optional[bool] = None,
                       data_axis: str = "data",
                       donate_state: bool = True):
    """Returns jitted ``step(state, batch, loss_weights, rng)`` with the batch
    sharded over ``data_axis`` and everything else replicated."""
    raw = vqvae_step.make_train_step(model, optimizer, class_weights,
                                     use_pallas=use_pallas)
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


__all__ = ["make_dp_train_step"]
