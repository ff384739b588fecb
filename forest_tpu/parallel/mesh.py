"""Mesh + sharding helpers.

The reference trains on a single GPU (SURVEY.md §2.9); forest-tpu's scaling
axis is the pixel/sample dimension, data-parallel over a 1-D ``("data",)``
mesh riding ICI (SURVEY.md §6.8). The model is <1 M params, so parameters and
optimizer state are replicated; batches are sharded on axis 0. Gradient
all-reduce and the VQ codebook EMA-statistics psum are *derived by XLA* from
these shardings -- no explicit collectives in the step code.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devs[:n]).reshape(shape), tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for host batches: dim 0 split across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(batch, mesh: Mesh, axis: str = "data"):
    """device_put a (possibly nested) host batch with dim-0 sharding."""
    sh = batch_sharding(mesh, axis)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sh)
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(put, batch)


__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch_pytree"]
