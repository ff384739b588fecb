"""Persistent XLA compilation cache (axon-relay compile insurance).

The relay compiles erratically: identical graphs take 1-10 s or 5+ minutes
depending on relay state (CLAUDE.md), and a degraded-state compile is
uninterruptible. The persistent cache is keyed by HLO + compile options +
backend version, so once a graph has compiled ANYWHERE in this container,
later processes (including the driver's scored bench) load the executable
instead of re-compiling -- verified working through the axon backend.

Call :func:`enable_persistent_cache` BEFORE the first device use.
"""
from __future__ import annotations

import os
from pathlib import Path


def enable_persistent_cache(cache_dir: str | os.PathLike | None = None
                            ) -> Path:
    """Point JAX at a persistent compilation cache directory.

    Default: ``$FOREST_TPU_JAX_CACHE`` or ``<repo>/.jax_cache``. Returns
    the directory. Safe to call repeatedly."""
    import jax

    d = Path(cache_dir or os.environ.get("FOREST_TPU_JAX_CACHE")
             or Path(__file__).resolve().parents[2] / ".jax_cache")
    d.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(d))
    # Cache everything that takes non-trivial time: relay compiles of even
    # small graphs can blow up in degraded states.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return d


__all__ = ["enable_persistent_cache"]
