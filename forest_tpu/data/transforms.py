"""Pre-normalization transforms (log/sqrt/...) with validation + inverse.

Behavioral contract from /root/reference/frl/data/loaders/transforms.py
(SURVEY.md §2.3): a registry of named elementwise transforms applied before
normalization — the same transform runs at stats time and at feature-build
time so the stats match the transformed distribution. A spec is a plain
string name OR a parameterized dict ``{name: ..., **params}`` (the
production ``frl_binding_v1.yaml`` ships ``{name: log, epsilon: 0.001}``).
Reference semantics: ``log`` computes ``log(x + epsilon)`` with default
epsilon 1.0 (transforms.py:90-205); log1p/log10/sqrt/cbrt are
non-parameterized. Out-of-domain inputs produce NaN (masked downstream).
Pure numpy/jnp-polymorphic functions.
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Union

import numpy as np

TransformSpec = Optional[Union[str, Dict]]

#: Reference default for the parameterized ``log`` (transforms.py:92).
LOG_DEFAULT_EPSILON: float = 1.0


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
    "log1p", lambda x: _xp(x).log1p(x), lambda x: _xp(x).expm1(x),
    lambda x: _xp(x).isfinite(x) & (x > -1)))
register(Transform(
    "log10", lambda x: _xp(x).log10(x),
    lambda x: _xp(x).power(10.0, x),
    lambda x: _xp(x).isfinite(x) & (x > 0)))
register(Transform(
    "sqrt", lambda x: _xp(x).sqrt(x), lambda x: x * x,
    lambda x: _xp(x).isfinite(x) & (x >= 0)))
register(Transform(
    "cbrt", lambda x: _xp(x).cbrt(x), lambda x: x * x * x,
    lambda x: _xp(x).isfinite(x)))
register(Transform(
    "neg", lambda x: -x, lambda x: -x, lambda x: _xp(x).isfinite(x)))


def parse_transform_spec(spec: TransformSpec):
    """String / dict / None spec -> (name, params) per the reference
    contract (transforms.py:110-139)."""
    if spec is None:
        return None, {}
    if isinstance(spec, str):
        return spec, {}
    if isinstance(spec, dict):
        d = dict(spec)
        name = d.pop("name", None)
        if name is None:
            raise ValueError("parameterized transform dict must include a "
                             f"'name' key, got {spec}")
        return name, d
    raise TypeError(f"transform spec must be str, dict, or None -- got "
                    f"{type(spec).__name__}")


def get_transform(spec: TransformSpec) -> Transform:
    name, params = parse_transform_spec(spec)
    if name is None:
        return _REGISTRY["none"]
    if name == "log":
        # reference: log(x + epsilon), default epsilon 1.0
        eps = float(params.get("epsilon", LOG_DEFAULT_EPSILON))
        return Transform(
            "log",
            lambda x: _xp(x).log(x + eps),
            lambda x: _xp(x).exp(x) - eps,
            lambda x: _xp(x).isfinite(x) & (x > -eps))
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown transform {name!r}; have {sorted(_REGISTRY) + ['log']}")
    if params:
        # reference contract: only 'log' takes parameters
        # (PARAMETERIZED_TRANSFORMS, transforms.py:95) -- silently dropping
        # them would build stats/features with a different transform than
        # the config states.
        raise ValueError(f"transform {name!r} takes no parameters, "
                         f"got {params}")
    return _REGISTRY[name]


def apply_transform(spec: TransformSpec, x, mask_invalid: bool = True):
    """Apply transform; out-of-domain inputs become NaN (masked later)."""
    t = get_transform(spec)
    xp = _xp(x)
    if mask_invalid:
        ok = t.domain_check(x)
        safe = xp.where(ok, x, xp.ones_like(x))
        return xp.where(ok, t.forward(safe), xp.nan)
    return t.forward(x)


__all__ = ["Transform", "TransformSpec", "register", "get_transform",
           "apply_transform", "parse_transform_spec",
           "LOG_DEFAULT_EPSILON"]
