"""Spatial extraction + pair sampling at pixel coordinates (jit-safe).

Behavioral contracts from /root/reference/frl/utils/spatial.py (SURVEY.md
§2.3), reformulated with static shapes (channel-last layout; pair lists are
fixed-size with validity masks):

- ``extract_at_locations``: [H, W, C] + [N, 2] -> [N, C]
- ``extract_temporal_at_locations``: [T, H, W, C] + [N, 2] -> [N, T, C]
- ``spatial_knn_pairs``: offset-grid k nearest spatial neighbors per anchor
  (no full distance matrix; the k closest fixed offsets applied to every
  anchor, bounds- and mask-checked) -> (anchor_idx [N*k], neighbor_coords
  [N*k, 2], valid [N*k])
- ``spatial_negative_pairs``: ``n_per_anchor`` random valid pixels within a
  [min, max] distance ring per anchor -> fixed-size sampled pairs + valid.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def extract_at_locations(grid: Array, coords: Array) -> Array:
    """grid [H, W, C], coords [N, 2] (row, col) -> [N, C]."""
    return grid[coords[:, 0], coords[:, 1]]


def extract_temporal_at_locations(grid: Array, coords: Array) -> Array:
    """grid [T, H, W, C], coords [N, 2] -> [N, T, C]."""
    out = grid[:, coords[:, 0], coords[:, 1]]  # [T, N, C]
    return jnp.transpose(out, (1, 0, 2))


def _knn_offsets(k: int, max_radius: int) -> np.ndarray:
    """The k closest nonzero (dr, dc) offsets within max_radius (static)."""
    r = max_radius
    dr, dc = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1),
                         indexing="ij")
    off = np.stack([dr.ravel(), dc.ravel()], 1)
    d = np.sqrt((off ** 2).sum(1))
    keep = (d > 0) & (d <= max_radius)
    off, d = off[keep], d[keep]
    order = np.argsort(d, kind="stable")
    return off[order[:min(k, len(order))]].astype(np.int32)


def spatial_knn_pairs(anchor_coords: Array, mask: Array, k: int = 4,
                      max_radius: int = 8
                      ) -> Tuple[Array, Array, Array]:
    """Returns (anchor_idx [N*k'], neighbor_coords [N*k', 2], valid)."""
    n = anchor_coords.shape[0]
    h, w = mask.shape
    offsets = jnp.asarray(_knn_offsets(k, max_radius))      # [k', 2]
    kk = offsets.shape[0]
    nbr = anchor_coords[:, None, :] + offsets[None, :, :]    # [N, k', 2]
    in_bounds = ((nbr[..., 0] >= 0) & (nbr[..., 0] < h)
                 & (nbr[..., 1] >= 0) & (nbr[..., 1] < w))
    rr = jnp.clip(nbr[..., 0], 0, h - 1)
    cc = jnp.clip(nbr[..., 1], 0, w - 1)
    # Gather from an f32 view: boolean gathers hit a byte-packed layout
    # path on TPU (profiled ~3 ms/step at production pair counts).
    valid = (mask.astype(jnp.float32)[rr, cc] > 0) & in_bounds  # [N, k']
    anchor_idx = jnp.broadcast_to(jnp.arange(n)[:, None], (n, kk))
    return (anchor_idx.reshape(-1),
            jnp.stack([rr, cc], -1).reshape(-1, 2).astype(jnp.int32),
            valid.reshape(-1))


def spatial_negative_pairs(anchor_coords: Array, mask: Array,
                           key: Array, min_distance: float = 16.0,
                           max_distance: Optional[float] = None,
                           n_per_anchor: int = 4, n_candidates: int = 64
                           ) -> Tuple[Array, Array, Array]:
    """Random ring-sampled negatives, static shapes.

    Strategy (vs the reference's per-anchor python loop): draw
    ``n_candidates`` uniform pixel coords per anchor, keep those that land in
    the distance ring AND on valid mask, and take the first ``n_per_anchor``
    survivors per anchor (validity-masked when fewer survive).
    """
    n = anchor_coords.shape[0]
    h, w = mask.shape
    kr, kc = jax.random.split(key)
    rows = jax.random.randint(kr, (n, n_candidates), 0, h)
    cols = jax.random.randint(kc, (n, n_candidates), 0, w)
    cand = jnp.stack([rows, cols], -1)                       # [N, C, 2]
    d = jnp.sqrt(jnp.sum(
        (cand.astype(jnp.float32)
         - anchor_coords[:, None, :].astype(jnp.float32)) ** 2, -1))
    ok = (d >= min_distance) & (mask.astype(jnp.float32)[rows, cols] > 0)
    if max_distance is not None:
        ok = ok & (d <= max_distance)
    # Order survivors first, take n_per_anchor.
    score = ok.astype(jnp.float32)
    _, sel = jax.lax.top_k(score, n_per_anchor)              # [N, k]
    picked = jnp.take_along_axis(cand, sel[..., None], axis=1)
    picked_ok = jnp.take_along_axis(ok, sel, axis=1)
    anchor_idx = jnp.broadcast_to(jnp.arange(n)[:, None],
                                  (n, n_per_anchor))
    return (anchor_idx.reshape(-1),
            picked.reshape(-1, 2).astype(jnp.int32),
            picked_ok.reshape(-1))


__all__ = ["extract_at_locations", "extract_temporal_at_locations",
           "spatial_knn_pairs", "spatial_negative_pairs"]
