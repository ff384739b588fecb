"""Checkpoint manager: last / periodic / NaN-safe top-k policy + auto-resume.

Policy contract from /root/reference/frl/training/representation/
checkpointing.py:75-217 (SURVEY.md §6.4): write ``*_last`` every epoch,
``*_epoch_NNN`` every ``periodic_every``, and keep the ``top_k`` best by a
monitored metric (min), only counting epochs >= ``monitor_start_epoch``;
non-finite metrics never enter the top-k; rank-encoded renames go through
temp names so a crash can't clobber a good checkpoint. Auto-resume restores
from ``*_last`` when present.

Serialization is flax msgpack (``flax.serialization``) with a JSON metadata
sidecar carrying the versioned-dict fields (model_version, model_config,
epoch, metrics) -- the TPU-native stand-in for the reference's torch ``.pt``
dicts.
"""
from __future__ import annotations

import json
import math
import os
import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import flax.serialization
import jax
import numpy as np


def save_state(path: Path, state: Any, meta: Dict[str, Any]) -> None:
    path = Path(path)
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_bytes(flax.serialization.to_bytes(state))
    os.replace(tmp, path)
    mp = path.with_suffix(path.suffix + ".json")
    tmp2 = mp.with_name(mp.name + ".tmp")
    tmp2.write_text(json.dumps(_jsonable(meta), indent=1))
    os.replace(tmp2, mp)


def load_state(path: Path, target: Any) -> Tuple[Any, Dict[str, Any]]:
    path = Path(path)
    state = flax.serialization.from_bytes(target, path.read_bytes())
    mp = path.with_suffix(path.suffix + ".json")
    meta = json.loads(mp.read_text()) if mp.exists() else {}
    return state, meta


def load_state_raw(path: Path) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Restore the raw nested dict (no target pytree) -- robust to optimizer
    tree changes; inference/export paths only need params + vq stats."""
    path = Path(path)
    state = flax.serialization.msgpack_restore(path.read_bytes())
    mp = path.with_suffix(path.suffix + ".json")
    meta = json.loads(mp.read_text()) if mp.exists() else {}
    return state, meta


def _jsonable(x):
    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, (np.generic,)):
        return x.item()
    if isinstance(x, (np.ndarray, jax.Array)):
        return np.asarray(x).tolist()
    return x


class CheckpointManager:
    def __init__(self, ckpt_dir: str | Path, prefix: str = "encoder",
                 top_k: int = 3, periodic_every: int = 5,
                 monitor: str = "val/loss_total",
                 monitor_start_epoch: int = 0, mode: str = "min"):
        self.dir = Path(ckpt_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.prefix = prefix
        self.top_k = int(top_k)
        self.periodic_every = int(periodic_every)
        self.monitor = monitor
        self.monitor_start_epoch = int(monitor_start_epoch)
        self.mode = mode
        # [(metric_value, epoch)] best-first
        self.best: List[Tuple[float, int]] = []
        self.restore_top_k()

    # ---- paths -----------------------------------------------------------

    def last_path(self) -> Path:
        return self.dir / f"{self.prefix}_last.msgpack"

    def epoch_path(self, epoch: int) -> Path:
        return self.dir / f"{self.prefix}_epoch_{epoch:03d}.msgpack"

    def rank_path(self, rank: int) -> Path:
        return self.dir / f"{self.prefix}_best_{rank}.msgpack"

    # ---- top-k bookkeeping ----------------------------------------------

    def restore_top_k(self) -> None:
        """Rebuild the best-list from metadata sidecars on disk (the
        crash-recovery path, checkpointing.py:58-73 contract)."""
        self.best = []
        for p in sorted(self.dir.glob(f"{self.prefix}_best_*.msgpack.json")):
            try:
                meta = json.loads(p.read_text())
                v = float(meta.get("monitor_value", math.nan))
                e = int(meta.get("epoch", -1))
                if math.isfinite(v):
                    self.best.append((v, e))
            except Exception:
                continue
        self.best.sort(key=lambda t: t[0],
                       reverse=(self.mode == "max"))

    def _better(self, a: float, b: float) -> bool:
        return a < b if self.mode == "min" else a > b

    # ---- saving ----------------------------------------------------------

    def save(self, epoch: int, state: Any, metrics: Dict[str, Any],
             extra_meta: Optional[Dict[str, Any]] = None) -> None:
        meta = {"epoch": epoch, "metrics": _jsonable(metrics),
                **(extra_meta or {})}
        save_state(self.last_path(), state, meta)
        if self.periodic_every and epoch % self.periodic_every == 0:
            save_state(self.epoch_path(epoch), state, meta)

        if epoch < self.monitor_start_epoch:
            return
        v = metrics.get(self.monitor)
        if v is None:
            return
        v = float(v)
        if not math.isfinite(v):  # NaN-safe: never enters top-k
            return
        if len(self.best) < self.top_k or self._better(v, self.best[-1][0]):
            cand = self.best + [(v, epoch)]
            cand.sort(key=lambda t: t[0], reverse=(self.mode == "max"))
            dropped = cand[self.top_k:]
            self.best = cand[:self.top_k]
            new_rank = self.best.index((v, epoch))
            # Shift existing rank files via temp names (crash-safe).
            tmp_names = {}
            for r in range(len(self.best)):
                val, ep = self.best[r]
                if (val, ep) == (v, epoch):
                    continue
                old_rank = None
                # find its current file by scanning metas
                for p in self.dir.glob(f"{self.prefix}_best_*.msgpack.json"):
                    try:
                        m = json.loads(p.read_text())
                        if int(m.get("epoch", -1)) == ep and math.isclose(
                                float(m.get("monitor_value", math.nan)), val):
                            old_rank = int(
                                re.search(r"_best_(\d+)", p.name).group(1))
                            break
                    except Exception:
                        continue
                if old_rank is not None and old_rank != r:
                    tmp_names[old_rank] = r
            # two-phase rename
            for old_rank in tmp_names:
                for suf in (".msgpack", ".msgpack.json"):
                    src = self.dir / f"{self.prefix}_best_{old_rank}{suf}"
                    if src.exists():
                        os.replace(src, self.dir /
                                   f".tmp_best_{old_rank}{suf}")
            for old_rank, r in tmp_names.items():
                for suf in (".msgpack", ".msgpack.json"):
                    src = self.dir / f".tmp_best_{old_rank}{suf}"
                    if src.exists():
                        os.replace(src, self.dir /
                                   f"{self.prefix}_best_{r}{suf}")
            meta_best = dict(meta, monitor_value=v)
            save_state(self.rank_path(new_rank), state, meta_best)
            # prune files beyond top_k
            for p in self.dir.glob(f"{self.prefix}_best_*.msgpack"):
                r = int(re.search(r"_best_(\d+)", p.name).group(1))
                if r >= self.top_k:
                    p.unlink(missing_ok=True)
                    Path(str(p) + ".json").unlink(missing_ok=True)

    # ---- resume ----------------------------------------------------------

    def maybe_resume(self, target_state: Any
                     ) -> Optional[Tuple[Any, Dict[str, Any]]]:
        p = self.last_path()
        if not p.exists():
            return None
        return load_state(p, target_state)


__all__ = ["CheckpointManager", "save_state", "load_state"]
