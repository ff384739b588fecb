"""Sharded checkpointing via Orbax: the multi-host / sharded-array path.

The msgpack CheckpointManager (checkpointing.py) is the reference-parity
path (/root/reference/frl/training/representation/checkpointing.py:75-217)
for single-host runs, where the whole state fits one process. This module
is the scale-out complement (SURVEY.md §6.4 + CLAUDE.md roadmap): jax.Array
shardings are recorded at save time and restores are sharding-aware --
under multi-process jax each host writes/reads only its own shards, so
checkpoint IO scales with hosts instead of gathering to one.

Same policy surface as the msgpack manager: save every epoch, keep the
best-k by a monitored metric (NaN-safe), periodic keeps, auto-resume from
the latest step.
"""
from __future__ import annotations

import math
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _abstract_like(tree: Any) -> Any:
    """Target pytree -> ShapeDtypeStruct tree carrying shardings, so
    restore places every shard on the device(s) the target prescribes."""
    def conv(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        if isinstance(x, (np.ndarray, np.generic)):
            return jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        return x
    return jax.tree.map(conv, tree)


class OrbaxCheckpointManager:
    """Best-k + periodic + auto-resume on top of orbax.CheckpointManager.

    ``monitor`` reads from the metrics dict passed to :meth:`save`;
    non-finite values never enter the best-k ranking (the NaN-safe top-k
    contract of the msgpack manager).
    """

    def __init__(self, ckpt_dir: str | Path, top_k: int = 3,
                 periodic_every: int = 5,
                 monitor: str = "val/loss_total", mode: str = "min",
                 monitor_start_epoch: int = 0):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.monitor = monitor
        self.mode = mode
        self.monitor_start_epoch = int(monitor_start_epoch)

        def best_fn(metrics: Dict[str, Any]) -> float:
            v = metrics.get("__monitor__")
            if v is None or not math.isfinite(float(v)):
                # worst possible: never ranked above a finite value
                return math.inf if mode == "min" else -math.inf
            return float(v)

        options = ocp.CheckpointManagerOptions(
            max_to_keep=int(top_k),
            keep_period=int(periodic_every) or None,
            best_fn=best_fn,
            best_mode=mode,
            create=True,
            enable_async_checkpointing=False,  # deterministic for tests
        )
        self.mgr = ocp.CheckpointManager(
            Path(ckpt_dir).absolute(), options=options)

    # ------------------------------------------------------------------

    def save(self, epoch: int, state: Any,
             metrics: Optional[Dict[str, Any]] = None) -> None:
        metrics = dict(metrics or {})
        v = metrics.get(self.monitor)
        mv = None
        if v is not None and epoch >= self.monitor_start_epoch:
            v = float(v)
            if math.isfinite(v):
                mv = v
        self.mgr.save(
            int(epoch), args=self._ocp.args.StandardSave(state),
            metrics={"__monitor__": mv,
                     **{k: _scalar(val) for k, val in metrics.items()}})
        self.mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        s = self.mgr.latest_step()
        return int(s) if s is not None else None

    def best_epoch(self) -> Optional[int]:
        s = self.mgr.best_step()
        return int(s) if s is not None else None

    def restore(self, epoch: int, target_state: Any) -> Any:
        """Sharding-aware restore: arrays come back with the shardings of
        ``target_state`` (each process reads only its shards)."""
        return self.mgr.restore(
            int(epoch),
            args=self._ocp.args.StandardRestore(_abstract_like(
                target_state)))

    def maybe_resume(self, target_state: Any
                     ) -> Optional[Tuple[Any, int]]:
        e = self.latest_epoch()
        if e is None:
            return None
        return self.restore(e, target_state), e

    def close(self) -> None:
        self.mgr.close()


def _scalar(v):
    try:
        f = float(v)
        return f if math.isfinite(f) else None
    except (TypeError, ValueError):
        return None


__all__ = ["OrbaxCheckpointManager"]
