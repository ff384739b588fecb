"""Weighted anchor-grouped InfoNCE via segment ops.

Contract from /root/reference/frl/losses/contrastive.py:29-212 (SURVEY.md
§2.5): pairs (anchor, other) arrive as flat lists grouped by an anchor id;
similarities are l2 (-||a-b||^2 / D), cosine, or dot; pair weights act in log
space; the loss is the per-anchor -log( sum_pos w e^{s/t} / sum_all w e^{s/t} ),
averaged over anchors that have at least one valid positive.

TPU-native formulation: the reference's torch ``scatter``/``index_add`` become
``jax.ops.segment_sum``-based segment-logsumexp with a static ``num_anchors``
(SURVEY.md §2.10 item 3). All shapes static; validity flows through masks.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG = -1e30


def pair_similarity(a: Array, b: Array, kind: str = "l2",
                    eps: float = 1e-8) -> Array:
    """Similarity per pair row: a, b are [P, D]."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if kind == "l2":
        d2 = jnp.sum((a - b) ** 2, axis=-1)
        return -d2 / a.shape[-1]
    if kind == "cosine":
        na = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + eps)
        nb = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + eps)
        return jnp.sum(na * nb, axis=-1)
    if kind == "dot":
        return jnp.sum(a * b, axis=-1)
    raise ValueError(f"unknown similarity {kind!r}")


# eps added INSIDE the per-anchor log, in the shared-max shifted space
# (reference contrastive.py:203-206): saturates a hard anchor's loss near
# log_all - log(eps) ~ 18.4 nats and zeroes the vanished positive's
# gradient, instead of growing unboundedly (~87 nats at the f32 floor).
_LSE_EPS = 1e-8


def segment_logsumexp(logits: Array, segment_ids: Array, num_segments: int,
                      valid: Array,
                      shift: Optional[Array] = None
                      ) -> Tuple[Array, Array]:
    """Masked per-segment logsumexp with the reference's in-log eps.

    ``shift``: optional per-segment max to use (so the positive-subset sum
    shares the ALL-pairs shift, reference :178-206). Returns
    (lse [S], has_any [S] bool)."""
    logits = jnp.where(valid, logits, _NEG)
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments) \
        if shift is None else shift
    has_any = jax.ops.segment_max(
        valid.astype(jnp.int32), segment_ids, num_segments) > 0
    seg_max_safe = jnp.where(seg_max > _NEG / 2, seg_max, 0.0)
    shifted = jnp.exp(jnp.where(valid, logits - seg_max_safe[segment_ids],
                                _NEG))
    shifted = jnp.where(valid, shifted, 0.0)
    seg_sum = jax.ops.segment_sum(shifted, segment_ids, num_segments)
    lse = jnp.log(seg_sum + _LSE_EPS) + seg_max_safe
    return lse, has_any


def contrastive_loss(z_anchor: Array, z_other: Array, anchor_ids: Array,
                     is_positive: Array, num_anchors: int,
                     weights: Optional[Array] = None,
                     pair_valid: Optional[Array] = None,
                     similarity: str = "l2", temperature: float = 0.07
                     ) -> Tuple[Array, dict]:
    """Weighted anchor-grouped InfoNCE.

    z_anchor, z_other: [P, D] embeddings for each pair row.
    anchor_ids: [P] int32 in [0, num_anchors).
    is_positive: [P] bool -- positive vs negative pair.
    weights: [P] nonnegative pair weights (log-space contribution).
    pair_valid: [P] bool mask for padded rows.
    Returns (scalar loss, aux dict with per-anchor stats).
    """
    p = z_anchor.shape[0]
    if pair_valid is None:
        pair_valid = jnp.ones((p,), bool)
    if weights is None:
        weights = jnp.ones((p,), jnp.float32)
    sim = pair_similarity(z_anchor, z_other, similarity)
    logw = jnp.log(jnp.maximum(weights.astype(jnp.float32), 1e-12))
    logits = sim / temperature + logw

    pos_valid = pair_valid & is_positive
    # positives share the ALL-pairs per-anchor max (reference :178-206),
    # so the in-log eps saturates hard anchors consistently
    all_max = jax.ops.segment_max(jnp.where(pair_valid, logits, _NEG),
                                  anchor_ids, num_anchors)
    lse_all, has_all = segment_logsumexp(logits, anchor_ids, num_anchors,
                                         pair_valid, shift=all_max)
    lse_pos, has_pos = segment_logsumexp(logits, anchor_ids, num_anchors,
                                         pos_valid, shift=all_max)
    per_anchor = lse_all - lse_pos
    anchor_ok = has_pos & has_all
    denom = jnp.maximum(jnp.sum(anchor_ok.astype(jnp.float32)), 1.0)
    loss = jnp.sum(jnp.where(anchor_ok, per_anchor, 0.0)) / denom

    aux = {
        "n_anchors_used": jnp.sum(anchor_ok.astype(jnp.int32)),
        "mean_pos_sim": (jnp.sum(jnp.where(pos_valid, sim, 0.0))
                         / jnp.maximum(jnp.sum(pos_valid), 1)),
        "mean_neg_sim": (jnp.sum(jnp.where(pair_valid & ~is_positive, sim, 0.0))
                         / jnp.maximum(jnp.sum(pair_valid & ~is_positive), 1)),
    }
    return loss, aux


def contrastive_loss_grouped(z_anchor: Array, z_other: Array,
                             is_positive: Array,
                             weights: Optional[Array] = None,
                             pair_valid: Optional[Array] = None,
                             similarity: str = "l2", temperature: float = 0.07
                             ) -> Tuple[Array, dict]:
    """Anchor-grouped InfoNCE over a REGULAR [S, K] pair layout.

    Identical math to :func:`contrastive_loss` with
    ``anchor_ids = repeat(arange(S), K)`` but expressed as dense masked
    logsumexps over the K axis: the segment-sum/scatter-add formulation
    profiled at ~10 ms/step on v5e (TPU scatters serialize) while this
    form is pure vector reductions.

    z_anchor: [S, D]; z_other: [S, K, D]; is_positive/weights/pair_valid:
    [S, K]. Returns (scalar loss, aux dict) matching contrastive_loss.
    """
    s, k = z_other.shape[:2]
    if pair_valid is None:
        pair_valid = jnp.ones((s, k), bool)
    if weights is None:
        weights = jnp.ones((s, k), jnp.float32)
    sim = pair_similarity(
        jnp.broadcast_to(z_anchor[:, None, :], z_other.shape), z_other,
        similarity)                                          # [S, K]
    logw = jnp.log(jnp.maximum(weights.astype(jnp.float32), 1e-12))
    logits = sim / temperature + logw

    # shared ALL-pairs shift + in-log eps (reference :178-206; see
    # segment_logsumexp)
    all_max = jnp.max(jnp.where(pair_valid, logits, _NEG), axis=1)  # [S]
    m_safe = jnp.where(all_max > _NEG / 2, all_max, 0.0)

    def masked_lse(valid):
        # pre-mask BEFORE exp: exp of a raw invalid logit can overflow
        # when the shared shift is large-negative, and where() does not
        # stop inf/NaN from poisoning the backward pass
        x = jnp.where(valid, logits, _NEG)
        e = jnp.where(valid, jnp.exp(x - m_safe[:, None]), 0.0)
        lse = jnp.log(jnp.sum(e, axis=1) + _LSE_EPS) + m_safe
        return lse, valid.any(axis=1)

    pos_valid = pair_valid & is_positive
    lse_all, has_all = masked_lse(pair_valid)
    lse_pos, has_pos = masked_lse(pos_valid)
    per_anchor = lse_all - lse_pos
    anchor_ok = has_pos & has_all
    denom = jnp.maximum(jnp.sum(anchor_ok.astype(jnp.float32)), 1.0)
    loss = jnp.sum(jnp.where(anchor_ok, per_anchor, 0.0)) / denom

    neg_valid = pair_valid & ~is_positive
    aux = {
        "n_anchors_used": jnp.sum(anchor_ok.astype(jnp.int32)),
        "mean_pos_sim": (jnp.sum(jnp.where(pos_valid, sim, 0.0))
                         / jnp.maximum(jnp.sum(pos_valid), 1)),
        "mean_neg_sim": (jnp.sum(jnp.where(neg_valid, sim, 0.0))
                         / jnp.maximum(jnp.sum(neg_valid), 1)),
    }
    return loss, aux


__all__ = ["contrastive_loss", "contrastive_loss_grouped",
           "pair_similarity", "segment_logsumexp"]
