"""Pre-normalization transforms (log/sqrt/...) with validation + inverse.

Behavioral contract from /root/reference/frl/data/loaders/transforms.py
(SURVEY.md §2.3): a registry of named elementwise transforms applied before
normalization, each with a domain validity check and an inverse for
de-normalization paths. Pure numpy/jnp-polymorphic functions.
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import numpy as np


class Transform(NamedTuple):
    name: str
    forward: Callable
    inverse: Callable
    domain_check: Callable  # x -> bool array (valid input domain)


def _xp(x):
    import jax.numpy as jnp
    return jnp if not isinstance(x, np.ndarray) else np


_REGISTRY: Dict[str, Transform] = {}


def register(t: Transform) -> None:
    _REGISTRY[t.name] = t


register(Transform("none", lambda x: x, lambda x: x,
                   lambda x: _xp(x).isfinite(x)))
register(Transform("identity", lambda x: x, lambda x: x,
                   lambda x: _xp(x).isfinite(x)))
register(Transform(
    "log", lambda x: _xp(x).log(x), lambda x: _xp(x).exp(x),
    lambda x: _xp(x).isfinite(x) & (x > 0)))
register(Transform(
    "log1p", lambda x: _xp(x).log1p(x), lambda x: _xp(x).expm1(x),
    lambda x: _xp(x).isfinite(x) & (x > -1)))
register(Transform(
    "sqrt", lambda x: _xp(x).sqrt(x), lambda x: x * x,
    lambda x: _xp(x).isfinite(x) & (x >= 0)))
register(Transform(
    "neg", lambda x: -x, lambda x: -x, lambda x: _xp(x).isfinite(x)))


def get_transform(name: str) -> Transform:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown transform {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def apply_transform(name: str, x, mask_invalid: bool = True):
    """Apply transform; out-of-domain inputs become NaN (masked later)."""
    t = get_transform(name)
    xp = _xp(x)
    if mask_invalid:
        ok = t.domain_check(x)
        safe = xp.where(ok, x, xp.ones_like(x))
        return xp.where(ok, t.forward(safe), xp.nan)
    return t.forward(x)


__all__ = ["Transform", "register", "get_transform", "apply_transform"]
