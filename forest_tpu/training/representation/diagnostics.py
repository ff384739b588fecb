"""In-graph training diagnostics (reference-depth epoch stats).

Contracts from /root/reference/frl/training/representation/step.py:150-159
(distribution accumulators + tau sweep lists), :770-785 (spectral neg tau
sweep: mean/q25/q50 of clip(1-exp(-d/tau), min_w, 1)), and :1140-1171
(pre-FiLM type-leakage: cross-covariance Frobenius norm + closed-form ridge
regression R-squared of z_type from demeaned pooled h, lambda=1e-3).

All functions are jit-safe (static shapes, masked reductions): the reference
accumulates raw values per epoch on the host; TPU-native we compute per-step
summaries in-graph and average them across the epoch (documented divergence:
mean-of-step-quantiles instead of quantile-of-pooled-values).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

TAU_SWEEP: Tuple[float, ...] = (0.5, 1.0, 2.0, 5.0, 10.0, 20.0, 50.0)


def masked_stats(x: Array, valid: Array, prefix: str) -> Dict[str, Array]:
    """mean/std/p05/p50/p95 over ``x[valid]`` (jit-safe; NaN-quantile based).

    The reference logs fmt_stats(mean/std/quantiles) of pooled epoch values
    (epoch_logging.py:100-150); keys here are ``{prefix}_{stat}``.
    """
    x = x.astype(jnp.float32)
    v = valid.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(v), 1.0)
    mean = jnp.sum(x * v) / cnt
    var = jnp.sum((x - mean) ** 2 * v) / cnt
    xq = jnp.where(valid, x, jnp.nan)
    p05, p50, p95 = (jnp.nanquantile(xq, q) for q in (0.05, 0.5, 0.95))
    return {f"{prefix}_mean": mean, f"{prefix}_std": jnp.sqrt(var),
            f"{prefix}_p05": p05, f"{prefix}_p50": p50, f"{prefix}_p95": p95}


def tau_sweep_stats(d: Array, valid: Array, min_w: float, prefix: str,
                    negate: bool, taus: Sequence[float] = TAU_SWEEP
                    ) -> Dict[str, Array]:
    """Weight distributions under alternative kernel temperatures.

    For each tau: w = clip(exp(-d/tau), min_w, 1) (positives) or
    clip(1 - exp(-d/tau), min_w, 1) (``negate``, negatives); reports
    mean/q25/q50 over valid entries (reference step.py:157-159, 774-785).
    """
    out: Dict[str, Array] = {}
    v = valid.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(v), 1.0)
    for tau in taus:
        e = jnp.exp(-d.astype(jnp.float32) / tau)
        w = jnp.clip(1.0 - e if negate else e, min_w, 1.0)
        wq = jnp.where(valid, w, jnp.nan)
        out[f"{prefix}_{tau:g}_mean"] = jnp.sum(w * v) / cnt
        out[f"{prefix}_{tau:g}_q25"] = jnp.nanquantile(wq, 0.25)
        out[f"{prefix}_{tau:g}_q50"] = jnp.nanquantile(wq, 0.50)
    return out


def type_leakage_ridge(h_mean: Array, z_type: Array, valid: Array,
                       lam: float = 1e-3) -> Dict[str, Array]:
    """Pre-FiLM type-leakage diagnostics (reference step.py:1140-1171).

    h_mean: [N, zp] time-pooled pre-FiLM hidden; z_type: [N, zt] (stop-grad);
    valid: [N]. Returns cross-covariance Frobenius norm and closed-form ridge
    R-squared (mean/max over z_type dims) of z_type predicted from h.
    """
    v = valid.astype(jnp.float32)[:, None]
    cnt = jnp.maximum(jnp.sum(v), 2.0)
    h = h_mean.astype(jnp.float32)
    z = z_type.astype(jnp.float32)
    h_c = (h - jnp.sum(h * v, axis=0) / cnt) * v
    z_c = (z - jnp.sum(z * v, axis=0) / cnt) * v
    cross = jnp.dot(h_c.T, z_c, preferred_element_type=jnp.float32) \
        / (cnt - 1.0)
    frob = jnp.sqrt(jnp.sum(cross * cross))
    zp = h_c.shape[1]
    a = jnp.dot(h_c.T, h_c, preferred_element_type=jnp.float32) \
        + lam * jnp.eye(zp, dtype=jnp.float32)
    b = jnp.dot(h_c.T, z_c, preferred_element_type=jnp.float32)
    w = jnp.linalg.solve(a, b)                          # [zp, zt]
    pred = jnp.dot(h_c, w, preferred_element_type=jnp.float32)
    ss_res = jnp.sum((z_c - pred) ** 2, axis=0)
    ss_tot = jnp.maximum(jnp.sum(z_c ** 2, axis=0), 1e-8)
    r2 = 1.0 - ss_res / ss_tot
    return {"leak_cross_cov_frob": frob, "leak_r2_mean": jnp.mean(r2),
            "leak_r2_max": jnp.max(r2)}


__all__ = ["TAU_SWEEP", "masked_stats", "tau_sweep_stats",
           "type_leakage_ridge"]
