"""Opt-in profiling: global flag + wait/step timers + jax.profiler hook.

Contract from /root/reference/frl/training/representation/profiling.py and
SURVEY.md §6.1: a module-global ``--profile`` flag; when on, the loops
record dataloader-wait vs step time and can capture a jax.profiler trace.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

_PROFILE = False


def set_profile(on: bool) -> None:
    global _PROFILE
    _PROFILE = bool(on)


def is_profiling() -> bool:
    return _PROFILE


@contextlib.contextmanager
def maybe_trace(logdir: Optional[str]):
    """jax.profiler trace when profiling is on and a logdir is given."""
    if _PROFILE and logdir:
        import jax
        with jax.profiler.trace(logdir):
            yield
    else:
        yield


class StepTimers:
    """mark_* timers (the legacy vqvae.train_debug_utils contract,
    SURVEY.md §3)."""

    def __init__(self):
        self.t: Dict[str, float] = {}
        self._last = time.perf_counter()

    def mark(self, name: str) -> None:
        now = time.perf_counter()
        self.t[name] = self.t.get(name, 0.0) + (now - self._last)
        self._last = now

    mark_load = lambda self: self.mark("load")          # noqa: E731
    mark_fwd = lambda self: self.mark("fwd")            # noqa: E731
    mark_bwd = lambda self: self.mark("bwd")            # noqa: E731
    mark_opt = lambda self: self.mark("opt")            # noqa: E731

    def consume(self) -> Dict[str, float]:
        out, self.t = self.t, {}
        self._last = time.perf_counter()
        return out


def print_device_summary() -> str:
    """Device/memory summary (the legacy vqvae.train_debug_utils
    ``print_device_summary`` contract, SURVEY.md §3)."""
    import jax

    lines = [f"backend: {jax.default_backend()}  "
             f"devices: {len(jax.devices())}"]
    for d in jax.devices():
        line = f"  {d}"
        try:
            s = d.memory_stats()
            if s:
                line += (f"  mem {s.get('bytes_in_use', 0)/2**30:.2f}/"
                         f"{s.get('bytes_limit', 0)/2**30:.2f} GiB")
        except Exception:
            pass
        lines.append(line)
    out = "\n".join(lines)
    print(out)
    return out


__all__ = ["set_profile", "is_profiling", "maybe_trace", "StepTimers",
           "print_device_summary"]
