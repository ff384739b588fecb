"""Multi-host (multi-process) bring-up: jax.distributed + global-mesh DP.

SURVEY.md §6.8 contract: each host ingests a DISJOINT chunk shard
(the locality idea of /root/reference/utils/samplers.py:28-31) that feeds
one global data-parallel mesh; parameters/optimizer state are replicated;
the global update is identical to a single-process run over the
concatenated batch.

Bring-up order on every process:

    from forest_tpu.parallel import hosts
    hosts.initialize()               # no-op when single-process
    mesh = hosts.global_mesh()       # ALL devices, all processes
    n_proc, proc_id = hosts.process_shard()
    # samplers: ChunkBatchSampler(..., num_shards=n_proc, shard_id=proc_id)
    # batches:  hosts.global_batch_from_local(local_batch, mesh)

On a real TPU pod slice ``jax.distributed.initialize()`` autodetects the
coordinator from the TPU environment; on CPU/GPU (and in the 2-process CPU
CI test) the coordinator address / process count / process id come from
arguments or the ``FOREST_TPU_COORDINATOR`` / ``FOREST_TPU_NUM_PROCESSES``
/ ``FOREST_TPU_PROCESS_ID`` environment variables.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Optional, Sequence, Tuple

log = logging.getLogger("forest_tpu.hosts")

_ENV_COORD = "FOREST_TPU_COORDINATOR"
_ENV_NPROC = "FOREST_TPU_NUM_PROCESSES"
_ENV_PID = "FOREST_TPU_PROCESS_ID"

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Bring up ``jax.distributed`` when multi-process config is present.

    Resolution order: explicit args > FOREST_TPU_* env vars > TPU-pod
    autodetection (when ``coordinator_address`` stays None but the caller
    passed ``num_processes``/nothing on real pod hardware JAX detects the
    topology itself). Returns True iff the distributed runtime was (or
    already is) initialized. Single-process callers get a clean no-op.
    """
    global _initialized
    import jax

    coord = coordinator_address or os.environ.get(_ENV_COORD)
    nproc = num_processes if num_processes is not None else \
        int(os.environ.get(_ENV_NPROC, "0") or 0)
    pid = process_id if process_id is not None else \
        int(os.environ.get(_ENV_PID, "-1") or -1)

    if _initialized:
        return True
    if coord is None and nproc <= 1:
        return False  # single-process run
    kw: dict = {}
    if coord is not None:
        kw["coordinator_address"] = coord
    if nproc > 0:
        kw["num_processes"] = nproc
    if pid >= 0:
        kw["process_id"] = pid
    jax.distributed.initialize(**kw)
    _initialized = True
    log.info("jax.distributed up: process %d/%d, %d global / %d local "
             "devices", jax.process_index(), jax.process_count(),
             len(jax.devices()), len(jax.local_devices()))
    return True


def process_shard() -> Tuple[int, int]:
    """(num_shards, shard_id) for per-host disjoint ingestion: the sampler
    arguments of SURVEY §6.8 (ChunkBatchSampler num_shards/shard_id)."""
    import jax

    return jax.process_count(), jax.process_index()


def global_mesh(axis_names: Sequence[str] = ("data",)):
    """1-D (by default) mesh over ALL devices across ALL processes."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    shape = (len(jax.devices()),) + (1,) * (len(axis_names) - 1)
    return Mesh(devs.reshape(shape), tuple(axis_names))


def global_batch_from_local(batch: Any, mesh, axis: str = "data"):
    """Assemble a GLOBAL jax.Array pytree from this process's local shard.

    Every process passes its own rows (dim 0 = its slice of the global
    batch, in process-index order); arrays land dim-0-sharded over
    ``axis``, scalars/0-d leaves are replicated. Single-process meshes fall
    back to a plain device_put (identical semantics)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    bsh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def put(x):
        if getattr(x, "ndim", 0) >= 1:
            return jax.make_array_from_process_local_data(bsh, x)
        return jax.make_array_from_process_local_data(repl, x)

    return jax.tree.map(put, batch)


def replicate_pytree(tree: Any, mesh):
    """Host-identical values on every process -> replicated global arrays
    (e.g. the initial train state before the first donated step)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def put(x):
        return jax.make_array_from_process_local_data(repl, np.asarray(x))

    return jax.tree.map(put, tree)


def sync() -> None:
    """Barrier: all processes reach this point before any returns."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("forest_tpu.hosts.sync")


def is_primary() -> bool:
    """True on the process that should write host-global artifacts
    (history JSON, msgpack checkpoints, logs)."""
    import jax

    return jax.process_index() == 0


__all__ = ["initialize", "process_shard", "global_mesh",
           "global_batch_from_local", "replicate_pytree", "sync",
           "is_primary"]
