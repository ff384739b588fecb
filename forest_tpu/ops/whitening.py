"""Mahalanobis whitening, fused into the XLA graph.

Behavioral contract from /root/reference/frl/data/loaders/builders/
feature_builder.py:550-682 (SURVEY.md §2.3): W = chol((Sigma + eps*I)^-1),
x <- clip(W @ (x - mu), +/-clip); NaNs are zeroed before the matmul and the
validity mask re-applied after. The reference runs this as numpy on 46 CPU
workers -- here the [C, C] x [C, N] matmul + clamp lives in the jitted step
(SURVEY.md §2.10 item 2), with only the tiny W factor computed host-side
once per stats file.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def whitening_matrix(cov: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """Host-side (once per stats file): W such that W x has identity cov.

    With precision Sigma^-1 = L L^T (L lower Cholesky), W = L^T satisfies
    W Sigma W^T = L^T (L^-T L^-1) L = I. Applied as x @ W.T.
    """
    cov = np.asarray(cov, np.float64)
    c = cov.shape[0]
    prec = np.linalg.inv(cov + eps * np.eye(c))
    return np.linalg.cholesky(prec).T.astype(np.float32)


def apply_whitening(x: Array, w: Array, mean: Array,
                    mask: Optional[Array] = None,
                    clip: float = 5.0) -> Array:
    """x [..., C] -> whitened, clipped, NaN-safe; jit/XLA-fused.

    Invalid entries (NaN or mask==0) are zeroed before the matmul (so they
    contribute nothing to other channels) and zeroed again after.
    """
    finite = jnp.isfinite(x)
    if mask is not None:
        finite = finite & (mask > 0)
    xc = jnp.where(finite, x - mean, 0.0)
    out = jnp.einsum("...c,dc->...d", xc, w)
    out = jnp.clip(out, -clip, clip)
    return jnp.where(finite, out, 0.0)


__all__ = ["whitening_matrix", "apply_whitening"]
