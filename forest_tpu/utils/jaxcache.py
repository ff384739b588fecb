"""Persistent XLA compilation cache (axon-relay compile insurance).

The relay compiles erratically: identical graphs take 1-10 s or 5+ minutes
depending on relay state (CLAUDE.md), and a degraded-state compile is
uninterruptible. The persistent cache is keyed by HLO + compile options +
backend version, so once a graph has compiled ANYWHERE in this container,
later processes (including the driver's scored bench) load the executable
instead of re-compiling -- verified working through the axon backend.

CPU-backend hazard (VERDICT r4 weak #5): the cache key does NOT include the
host's CPU feature set, so CPU AOT executables compiled on one container
host can be loaded on another with different ISA extensions -- XLA warns
"could lead to execution errors such as SIGILL". For CPU backends the cache
directory is therefore scoped by a fingerprint of this host's CPU feature
flags: a host rotation lands in a fresh (cold but safe) directory instead
of loading foreign-feature executables. TPU entries are relay-side and
unaffected; they stay in the shared root so the scored bench keeps its
warm cache.

Call :func:`enable_persistent_cache` BEFORE the first device use. Set
``FOREST_TPU_JAX_CACHE_DISABLE=1`` to skip enabling entirely (used by the
dryrun's retry-without-cache safety net).
"""
from __future__ import annotations

import hashlib
import os
from pathlib import Path


def cpu_host_fingerprint() -> str:
    """Stable 12-hex fingerprint of this host's CPU feature flags.

    Reads the ``flags`` line of ``/proc/cpuinfo`` (the exact feature set
    XLA's CPU AOT pipeline targets). Falls back to ``platform`` info when
    /proc is unavailable (macOS, restricted mounts)."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    # Order-insensitive: kernels may reorder flag lists.
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    if not flags:
        import platform

        flags = f"{platform.machine()}|{platform.processor()}"
    return hashlib.sha1(flags.encode()).hexdigest()[:12]


def _platform_hint() -> str:
    """Best-effort intended platform WITHOUT initializing a backend
    (initializing can hang forever on a dead axon relay)."""
    import jax

    return str(jax.config.jax_platforms
               or os.environ.get("JAX_PLATFORMS", "") or "")


def enable_persistent_cache(cache_dir: str | os.PathLike | None = None
                            ) -> Path | None:
    """Point JAX at a persistent compilation cache directory.

    Default root: ``$FOREST_TPU_JAX_CACHE`` or ``<repo>/.jax_cache``. When
    the process is pinned to the CPU backend (decided from jax config/env
    only -- never by backend init), entries go to a per-host subdirectory
    ``cpu-<fingerprint>`` so executables AOT-compiled on a different
    container host can never be loaded here (SIGILL guard). Returns the
    directory, or None when ``FOREST_TPU_JAX_CACHE_DISABLE=1``. Safe to
    call repeatedly."""
    if os.environ.get("FOREST_TPU_JAX_CACHE_DISABLE") == "1":
        return None
    import jax

    d = Path(cache_dir or os.environ.get("FOREST_TPU_JAX_CACHE")
             or Path(__file__).resolve().parents[2] / ".jax_cache")
    if _platform_hint() == "cpu":
        d = d / f"cpu-{cpu_host_fingerprint()}"
    d.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(d))
    # Cache everything that takes non-trivial time: relay compiles of even
    # small graphs can blow up in degraded states.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return d


__all__ = ["enable_persistent_cache", "cpu_host_fingerprint"]
