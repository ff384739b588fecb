"""Anchor pixel sampling: jittered grid + weighted supplement (jit-safe).

Behavioral contracts from /root/reference/frl/data/sampling/
anchor_sampling.py (SURVEY.md §2.3):

- ``sample_anchors_grid``: regular stride grid inside an ``exclude_border``
  margin, with the grid origin jittered by +/- ``jitter_radius``
  (anchor_sampling.py:69-113);
- ``sample_anchors_grid_plus_supplement``: the grid plus ``n_supplement``
  weighted-multinomial draws from the weight map (:116-188);
- ``resolve_weights``: product of mask maps, then an optional
  ``inverse-frequency`` transform over a values map with an optional
  valid-values whitelist (:195-333);
- ``AnchorSampler``: callable bundling a strategy config (:340-556).

TPU-native: anchor counts are STATIC (grid size from stride/border; fixed
``n_supplement``); randomness is explicit ``jax.random`` keys; invalid
supplements (zero total weight) are flagged in the validity mask.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from forest_tpu.ops.topk import gumbel_weighted_topk

Array = jax.Array


def grid_anchor_count(h: int, w: int, stride: int,
                      exclude_border: int) -> Tuple[int, int]:
    ny = max((h - 2 * exclude_border + stride - 1) // stride, 0)
    nx = max((w - 2 * exclude_border + stride - 1) // stride, 0)
    return ny, nx


def sample_anchors_grid(key: Array, h: int, w: int, stride: int = 16,
                        exclude_border: int = 16, jitter_radius: int = 4
                        ) -> Array:
    """[ny*nx, 2] jittered grid coordinates (row, col), clipped in-border."""
    ny, nx = grid_anchor_count(h, w, stride, exclude_border)
    ky, kx = jax.random.split(key)
    jy = jax.random.randint(ky, (), -jitter_radius, jitter_radius + 1)
    jx = jax.random.randint(kx, (), -jitter_radius, jitter_radius + 1)
    rows = exclude_border + jnp.arange(ny) * stride + jy
    cols = exclude_border + jnp.arange(nx) * stride + jx
    rows = jnp.clip(rows, exclude_border, h - 1 - exclude_border)
    cols = jnp.clip(cols, exclude_border, w - 1 - exclude_border)
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")
    return jnp.stack([rr.reshape(-1), cc.reshape(-1)],
                     axis=1).astype(jnp.int32)


def resolve_weights(masks: Sequence[Array],
                    values: Optional[Array] = None,
                    transform: Optional[str] = None,
                    valid_values: Optional[Sequence[float]] = None) -> Array:
    """Product of mask maps [H, W]; optional inverse-frequency reweighting
    over a categorical ``values`` map restricted to ``valid_values``."""
    w = None
    for m in masks:
        mf = m.astype(jnp.float32)
        w = mf if w is None else w * mf
    if w is None:
        raise ValueError("at least one mask required")
    if transform == "inverse-frequency":
        if values is None:
            raise ValueError("inverse-frequency needs a values map")
        v = values
        if valid_values is not None:
            whitelist = jnp.asarray(list(valid_values), v.dtype)
            in_list = jnp.any(v[..., None] == whitelist[None, None, :],
                              axis=-1)
            w = w * in_list.astype(jnp.float32)
        # frequency of each value among weighted pixels
        vi = v.astype(jnp.int32).reshape(-1)
        wf = w.reshape(-1)
        vmax = 4096
        vi = jnp.clip(vi, 0, vmax - 1)
        counts = jax.ops.segment_sum(wf, vi, vmax)
        freq = counts[vi].reshape(w.shape)
        w = jnp.where(w > 0, w / jnp.maximum(freq, 1.0), 0.0)
    return w


def sample_anchors_supplement(key: Array, weights: Array, n: int
                              ) -> Tuple[Array, Array]:
    """Weighted multinomial draw WITHOUT replacement of n pixel coords
    (reference anchor_sampling.py:166 ``torch.multinomial(probs,
    n_supplement, replacement=False)``), via the Gumbel-top-k identity:
    top-n of ``log w + Gumbel`` is an exact weighted sample without
    replacement.

    Perf: the previous ``jax.random.categorical(shape=(n,))`` lowered to a
    2.5 ms/step fused reduce over the flat [65536] grid at production
    scale (profile fusion.89); a single Gumbel + TPU ``approx_max_k``
    (95% recall, still a valid weighted draw) is ~an order of magnitude
    cheaper. Small grids keep the exact ``top_k``.

    Returns (coords [n, 2], valid [n]); rows beyond the number of
    positive-weight pixels (or all rows when total weight is 0) are
    invalid.
    """
    h, w = weights.shape
    idx, valid = gumbel_weighted_topk(key, weights, n)
    coords = jnp.stack([idx // w, idx % w], axis=1).astype(jnp.int32)
    return coords, valid


def sample_anchors_grid_plus_supplement(
        key: Array, h: int, w: int, weights: Array, stride: int = 16,
        exclude_border: int = 16, jitter_radius: int = 4,
        n_supplement: int = 104) -> Tuple[Array, Array]:
    """Grid + supplement; returns (coords [G+S, 2], valid [G+S])."""
    kg, ks = jax.random.split(key)
    grid = sample_anchors_grid(kg, h, w, stride, exclude_border,
                               jitter_radius)
    gvalid = weights[grid[:, 0], grid[:, 1]] > 0
    supp, svalid = sample_anchors_supplement(ks, weights, n_supplement)
    return (jnp.concatenate([grid, supp], axis=0),
            jnp.concatenate([gvalid, svalid], axis=0))


@dataclass
class AnchorSamplerConfig:
    strategy: str = "grid-plus-supplement"   # 'grid' | 'grid-plus-supplement'
    stride: int = 16
    exclude_border: int = 16
    jitter_radius: int = 4
    n_supplement: int = 104
    weight_masks: Sequence[str] = field(default_factory=list)
    weight_transform: Optional[str] = None
    weight_values: Optional[str] = None
    valid_values: Optional[Sequence[float]] = None


class AnchorSampler:
    """Callable bundling the strategy; resolves weight maps from a dict of
    named mask/value grids (the bindings-driven path)."""

    def __init__(self, cfg: AnchorSamplerConfig):
        self.cfg = cfg

    def n_anchors(self, h: int, w: int) -> int:
        ny, nx = grid_anchor_count(h, w, self.cfg.stride,
                                   self.cfg.exclude_border)
        n = ny * nx
        if self.cfg.strategy == "grid-plus-supplement":
            n += self.cfg.n_supplement
        return n

    def __call__(self, key: Array, grids: Dict[str, Array],
                 h: int, w: int) -> Tuple[Array, Array]:
        c = self.cfg
        masks = [grids[name] for name in c.weight_masks] or \
            [jnp.ones((h, w), jnp.float32)]
        values = grids.get(c.weight_values) if c.weight_values else None
        weights = resolve_weights(masks, values, c.weight_transform,
                                  c.valid_values)
        if c.strategy == "grid":
            coords = sample_anchors_grid(key, h, w, c.stride,
                                         c.exclude_border, c.jitter_radius)
            return coords, weights[coords[:, 0], coords[:, 1]] > 0
        if c.strategy == "grid-plus-supplement":
            return sample_anchors_grid_plus_supplement(
                key, h, w, weights, c.stride, c.exclude_border,
                c.jitter_radius, c.n_supplement)
        raise ValueError(f"unknown strategy {c.strategy!r}")


def build_anchor_sampler(spec: Dict) -> AnchorSampler:
    """From a bindings ``sampling-strategy`` YAML entry (SURVEY.md §2.3)."""
    if "grid" in spec and "supplement" in spec:
        g = spec["grid"]
        s = spec["supplement"]
        samp = s.get("sampling", {})
        return AnchorSampler(AnchorSamplerConfig(
            strategy="grid-plus-supplement",
            stride=g.get("stride", 16),
            exclude_border=g.get("exclude_border", 16),
            jitter_radius=(g.get("jitter") or {}).get("radius", 0),
            n_supplement=s.get("n", 104),
            weight_masks=samp.get("weight_by", []),
            weight_transform=samp.get("transform"),
            weight_values=samp.get("values"),
            valid_values=samp.get("valid_values")))
    return AnchorSampler(AnchorSamplerConfig(
        strategy="grid",
        stride=spec.get("stride", 16),
        exclude_border=spec.get("exclude_border", 16),
        jitter_radius=(spec.get("jitter") or {}).get("radius", 0)))


__all__ = ["sample_anchors_grid", "sample_anchors_supplement",
           "sample_anchors_grid_plus_supplement", "resolve_weights",
           "AnchorSampler", "AnchorSamplerConfig", "build_anchor_sampler",
           "grid_anchor_count"]
