"""Pair construction: kNN / mutual-kNN / quantile / radius / chunked.

Behavioral contracts from /root/reference/frl/losses/pairs.py (SURVEY.md
§2.5). The torch versions return variable-length [P, 2] index lists; under
jit that is a dynamic shape, so every builder here returns FIXED-size padded
outputs with validity masks (SURVEY.md §8.3 "padded/masked formulations"):

- ``pairs_knn``: [N*k, 2] pairs + valid mask (top-k smallest distances per
  row; self and invalid/inf entries excluded);
- ``pairs_mutual_knn``: [N*k, 2] + valid where valid additionally requires
  mutual kNN membership -- both (i, j) and (j, i) appear, matching the
  reference's symmetric output;
- ``pairs_quantile`` / ``pairs_radius``: boolean adjacency [N, M] selecting
  the GLOBAL quantile band ``[low, q)`` over all valid distances /
  the distance band ``[min_dist, radius)`` (reference pairs.py:291-420
  band semantics, both half-open), plus ``mask_to_pairs`` to sample a
  fixed number of index pairs from an adjacency mask;
- ``pairs_mutual_knn_chunked``: O(chunk x N) memory mutual-kNN over pooled
  anchors with the within-patch spatial constraint
  (pairs.py:531-611) -- implemented with ``lax.map`` over query chunks.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

INF = jnp.inf


def _sanitize(distances: Array, valid_mask: Optional[Array],
              exclude_self: bool = True) -> Array:
    d = jnp.where(jnp.isfinite(distances), distances, INF)
    n, m = d.shape
    if valid_mask is not None:
        vm = valid_mask.astype(bool)
        d = jnp.where(vm[None, :], d, INF)
        if vm.shape[0] == n:
            d = jnp.where(vm[:, None], d, INF)
    if exclude_self and n == m:
        d = jnp.where(jnp.eye(n, dtype=bool), INF, d)
    return d


def pairs_knn(distances: Array, k: int,
              valid_mask: Optional[Array] = None,
              symmetric: bool = False) -> Tuple[Array, Array]:
    """Top-k per row. Returns (pairs [N*k(*2 if symmetric), 2], valid)."""
    n, m = distances.shape
    d = _sanitize(distances, valid_mask)
    k = min(k, m)
    neg, idx = jax.lax.top_k(-d, k)                # [N, k]
    valid = jnp.isfinite(-neg)
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k))
    pairs = jnp.stack([rows.reshape(-1), idx.reshape(-1)],
                      axis=1).astype(jnp.int32)
    vflat = valid.reshape(-1)
    if symmetric:
        pairs = jnp.concatenate([pairs, pairs[:, ::-1]], axis=0)
        vflat = jnp.concatenate([vflat, vflat], axis=0)
    return pairs, vflat


def _knn_membership_parts(distances: Array, k: int,
                          valid_mask: Optional[Array]
                          ) -> Tuple[Array, Array, Array]:
    """Shared core: (member [N, N] bool, idx [N, k], valid [N, k])."""
    n = distances.shape[0]
    d = _sanitize(distances, valid_mask)
    k = min(k, n)
    neg, idx = jax.lax.top_k(-d, k)
    valid = jnp.isfinite(-neg)
    member = jnp.zeros((n, n), bool)
    member = member.at[jnp.arange(n)[:, None], idx].set(valid)
    return member, idx, valid


def knn_membership(distances: Array, k: int,
                   valid_mask: Optional[Array] = None) -> Array:
    """Boolean [N, N]: member[i, j] = j in i's (valid) kNN."""
    return _knn_membership_parts(distances, k, valid_mask)[0]


def pairs_mutual_knn(distances: Array, k: int,
                     valid_mask: Optional[Array] = None
                     ) -> Tuple[Array, Array]:
    """Mutual kNN: valid pairs where each is in the other's top-k."""
    n = distances.shape[0]
    if distances.shape[0] != distances.shape[1]:
        raise ValueError("mutual kNN requires a square distance matrix")
    member, idx, valid = _knn_membership_parts(distances, k, valid_mask)
    k = idx.shape[1]
    mutual = member & member.T
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k))
    pairs = jnp.stack([rows.reshape(-1), idx.reshape(-1)],
                      axis=1).astype(jnp.int32)
    vflat = valid.reshape(-1) & mutual[rows.reshape(-1), idx.reshape(-1)]
    return pairs, vflat


def pairs_quantile(distances: Array, q: float,
                   valid_mask: Optional[Array] = None,
                   low: float = 0.0) -> Array:
    """Adjacency [N, M]: entries in the GLOBAL quantile band [low, q) of
    valid distances (pairs.py:291-360 contract: one quantile over ALL
    valid entries -- not per-row -- selecting ``q_low <= d < q_high``)."""
    d = _sanitize(distances, valid_mask)
    finite = jnp.isfinite(d)
    # Global quantiles over VALID entries only: invalid -> NaN so
    # nanquantile ignores them (padding must not skew the thresholds).
    dq = jnp.where(finite, d, jnp.nan)
    q_low = jnp.nanquantile(dq, low)
    q_high = jnp.nanquantile(dq, q)
    return finite & (d >= q_low) & (d < q_high)


def pairs_radius(distances: Array, radius: float,
                 valid_mask: Optional[Array] = None,
                 min_dist: float = 0.0) -> Array:
    """Adjacency [N, M]: valid entries in the band [min_dist, radius)
    (pairs.py:368-420 contract: ``min_dist <= d < max_dist``)."""
    d = _sanitize(distances, valid_mask)
    return jnp.isfinite(d) & (d >= min_dist) & (d < radius)


def mask_to_pairs(adj: Array, max_pairs: int,
                  key: Optional[Array] = None) -> Tuple[Array, Array]:
    """Sample up to ``max_pairs`` (i, j) index pairs from an adjacency mask.

    Deterministic top-of-permutation when ``key`` given, else first-come row
    order. Returns (pairs [max_pairs, 2], valid [max_pairs]).
    """
    n, m = adj.shape
    flat = adj.reshape(-1)
    score = flat.astype(jnp.float32)
    if key is not None:
        score = score * (1.0 + jax.random.uniform(key, flat.shape))
    _, idx = jax.lax.top_k(score, min(max_pairs, n * m))
    chosen_valid = flat[idx]
    pairs = jnp.stack([idx // m, idx % m], axis=1).astype(jnp.int32)
    if pairs.shape[0] < max_pairs:
        pad = max_pairs - pairs.shape[0]
        pairs = jnp.concatenate([pairs, jnp.zeros((pad, 2), jnp.int32)])
        chosen_valid = jnp.concatenate([chosen_valid,
                                        jnp.zeros((pad,), bool)])
    return pairs, chosen_valid


def apply_spatial_constraint(distances: Array, coords: Array,
                             min_spatial: float) -> Array:
    """Mask FEATURE distances to +inf where pixel coordinates are closer
    than ``min_spatial`` (pairs.py:434-456 contract). The constraint runs
    BEFORE pair selection, so kNN falls through to the next-nearest
    spatially-admissible neighbor and quantile thresholds are computed
    over the post-constraint distribution. coords: [N, 2]."""
    c = coords.astype(jnp.float32)
    d2 = jnp.sum((c[:, None, :] - c[None, :, :]) ** 2, axis=-1)
    return jnp.where(d2 < min_spatial ** 2, INF, distances)


def pairs_with_spatial_constraint(distances: Array, coords: Array,
                                  strategy: str = "knn", k: int = 8,
                                  q: float = 0.1, radius: float = 1.0,
                                  min_spatial: float = 4.0,
                                  valid_mask: Optional[Array] = None,
                                  q_low: float = 0.0
                                  ) -> Tuple[Array, Array]:
    """Strategy + spatial-exclusion combo (pairs.py:458-528 contract):
    mask spatially-close candidates OUT OF the feature-distance matrix
    first (trivial spatial neighbors must not occupy neighbor slots or
    skew quantile thresholds -- reference order of operations), then build
    pairs by the named strategy.

    Returns fixed-size (pairs, valid). For quantile/radius strategies the
    adjacency is converted via :func:`mask_to_pairs` with max_pairs = N*k.
    """
    n = distances.shape[0]
    d = apply_spatial_constraint(distances, coords, min_spatial)
    if strategy == "knn":
        return pairs_knn(d, k, valid_mask)
    if strategy == "mutual_knn":
        return pairs_mutual_knn(d, k, valid_mask)
    if strategy in ("quantile", "radius"):
        adj = (pairs_quantile(d, q, valid_mask, low=q_low)
               if strategy == "quantile"
               else pairs_radius(d, radius, valid_mask))
        return mask_to_pairs(adj, max_pairs=n * k)
    raise ValueError(f"unknown pair strategy {strategy!r}")


def _chunked_knn_idx(features: Array, k: int, chunk_size: int,
                     patch_ids: Optional[Array],
                     coords: Optional[Array],
                     pos_min_spatial: float) -> Tuple[Array, Array]:
    """kNN indices [N, k] + validity without materializing [N, N]."""
    n, c = features.shape
    pad = (-n) % chunk_size
    npad = n + pad
    # Pad queries to the chunk multiple: dynamic_slice CLAMPS out-of-bounds
    # starts, which would silently misalign the last chunk's row indices.
    fpad = jnp.concatenate([features,
                            jnp.zeros((pad, c), features.dtype)], axis=0)
    f2 = jnp.sum(features * features, axis=1)
    f2pad = jnp.concatenate([f2, jnp.zeros((pad,), f2.dtype)])

    def one_chunk(start):
        q = jax.lax.dynamic_slice(fpad, (start, 0), (chunk_size, c))
        q2 = jax.lax.dynamic_slice(f2pad, (start,), (chunk_size,))
        d = (q2[:, None] - 2.0 * q @ features.T + f2[None, :])
        rows = start + jnp.arange(chunk_size)
        d = jnp.where(rows[:, None] == jnp.arange(n)[None, :], INF, d)
        d = jnp.where(rows[:, None] >= n, INF, d)  # padded queries
        if patch_ids is not None and coords is not None:
            same_patch = patch_ids[jnp.clip(rows, 0, n - 1), None] \
                == patch_ids[None, :]
            qc = coords[jnp.clip(rows, 0, n - 1)].astype(jnp.float32)
            sp2 = jnp.sum((qc[:, None] - coords[None].astype(jnp.float32))
                          ** 2, axis=-1)
            d = jnp.where(same_patch & (sp2 < pos_min_spatial ** 2), INF, d)
        neg, idx = jax.lax.top_k(-d, min(k, n - 1))
        return idx, jnp.isfinite(-neg)

    starts = jnp.arange(0, npad, chunk_size)
    idxs, valids = jax.lax.map(one_chunk, starts)
    kk = idxs.shape[-1]
    return (idxs.reshape(npad, kk)[:n], valids.reshape(npad, kk)[:n])


def pairs_mutual_knn_chunked(features: Array, k: int,
                             patch_ids: Optional[Array] = None,
                             coords: Optional[Array] = None,
                             pos_min_spatial: float = 4.0,
                             chunk_size: int = 128
                             ) -> Tuple[Array, Array]:
    """Chunked mutual-kNN over pooled anchors (pairs.py:531-611 contract).

    features: [N, C] whitened features; patch_ids/coords implement the
    within-patch spatial exclusion. Returns (pairs [N*k', 2], valid).
    """
    n = features.shape[0]
    knn_idx, valid = mutual_knn_grouped(features, k, patch_ids, coords,
                                        pos_min_spatial, chunk_size)
    kk = knn_idx.shape[1]
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, kk)).reshape(-1)
    pairs = jnp.stack([rows, knn_idx.reshape(-1)], axis=1).astype(jnp.int32)
    return pairs, valid.reshape(-1)


def mutual_knn_grouped(features: Array, k: int,
                       patch_ids: Optional[Array] = None,
                       coords: Optional[Array] = None,
                       pos_min_spatial: float = 4.0,
                       chunk_size: int = 128) -> Tuple[Array, Array]:
    """Mutual-kNN in anchor-major grouped form: (knn_idx [N, k'],
    valid [N, k'] with the mutuality filter applied). The grouped layout
    feeds contrastive_loss_grouped without any segment scatters."""
    n = features.shape[0]
    knn_idx, knn_valid = _chunked_knn_idx(features, k, chunk_size,
                                          patch_ids, coords,
                                          pos_min_spatial)
    member = jnp.zeros((n, n), bool)
    member = member.at[jnp.arange(n)[:, None], knn_idx].set(knn_valid)
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], knn_idx.shape)
    valid = knn_valid & member[knn_idx, rows]
    return knn_idx, valid


__all__ = ["pairs_knn", "pairs_mutual_knn", "pairs_quantile", "pairs_radius",
           "pairs_with_spatial_constraint",
           "mask_to_pairs", "apply_spatial_constraint", "knn_membership",
           "pairs_mutual_knn_chunked", "mutual_knn_grouped"]
