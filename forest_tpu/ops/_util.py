"""Shared helpers for the Pallas op modules (single source of truth for
backend detection and TPU tiling constants -- previously duplicated
between ops/vq.py and ops/smoothing.py)."""
from __future__ import annotations

import jax

LANE = 128


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


__all__ = ["LANE", "round_up", "on_tpu"]
