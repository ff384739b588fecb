"""Normalizer class family + zarr-attr stats loading.

Behavioral contracts from /root/reference/frl/data/normalization/
normalization.py:36-430 and zarr_stats_loader.py:33-376 (SURVEY.md §2.3):
the class-based implementation of the same presets the FeatureBuilder
applies inline -- ZScore / RobustIQR / MinMax / LinearRescale / Clamp /
Identity with forward + inverse, a factory, a manager applying a plan of
normalizers per channel, and a stats loader that reads the per-band
``statistics`` attrs the cube builder embeds (zarr_builder sidecar path).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from forest_tpu.data import zarrlite as zl


class Normalizer:
    name = "identity"

    def __init__(self, stats: Optional[Dict[str, float]] = None, **kw):
        self.stats = stats or {}
        self.params = kw

    def forward(self, x):
        return x

    def inverse(self, y):
        return y

    def __call__(self, x):
        return self.forward(x)


class Identity(Normalizer):
    name = "identity"


class ZScore(Normalizer):
    name = "zscore"

    def forward(self, x):
        sd = self.stats.get("sd", 1.0) or 1.0
        return (x - self.stats.get("mean", 0.0)) / max(sd, 1e-8)

    def inverse(self, y):
        sd = self.stats.get("sd", 1.0) or 1.0
        return y * max(sd, 1e-8) + self.stats.get("mean", 0.0)


class RobustIQR(Normalizer):
    name = "robust_iqr"

    def _iqr(self):
        iqr = self.stats.get("q75", 1.0) - self.stats.get("q25", 0.0)
        return iqr if iqr > 1e-8 else 1.0

    def forward(self, x):
        return (x - self.stats.get("q50", 0.0)) / self._iqr()

    def inverse(self, y):
        return y * self._iqr() + self.stats.get("q50", 0.0)


class MinMax(Normalizer):
    name = "minmax"

    def _rng(self):
        r = self.stats.get("max", 1.0) - self.stats.get("min", 0.0)
        return r if r > 1e-8 else 1.0

    def forward(self, x):
        return (x - self.stats.get("min", 0.0)) / self._rng()

    def inverse(self, y):
        return y * self._rng() + self.stats.get("min", 0.0)


class LinearRescale(Normalizer):
    name = "linear_rescale"

    def forward(self, x):
        p = self.params
        in_min = p.get("in_min", self.stats.get("min", 0.0))
        in_max = p.get("in_max", self.stats.get("max", 1.0))
        out_min = p.get("out_min", 0.0)
        out_max = p.get("out_max", 1.0)
        rng = max(in_max - in_min, 1e-8)
        return (x - in_min) / rng * (out_max - out_min) + out_min

    def inverse(self, y):
        p = self.params
        in_min = p.get("in_min", self.stats.get("min", 0.0))
        in_max = p.get("in_max", self.stats.get("max", 1.0))
        out_min = p.get("out_min", 0.0)
        out_max = p.get("out_max", 1.0)
        rng = max(in_max - in_min, 1e-8)
        orng = max(out_max - out_min, 1e-8)
        return (y - out_min) / orng * rng + in_min


class Clamp(Normalizer):
    name = "clamp"

    def forward(self, x):
        lo = self.params.get("min", self.stats.get("q02"))
        hi = self.params.get("max", self.stats.get("q98"))
        return np.clip(x, lo, hi)

    def inverse(self, y):
        return y  # clamping is not invertible; identity is the convention


_REGISTRY = {c.name: c for c in
             (Identity, ZScore, RobustIQR, MinMax, LinearRescale, Clamp)}
_REGISTRY["none"] = Identity


def make_normalizer(kind: str, stats: Optional[Dict] = None,
                    **kw) -> Normalizer:
    if kind not in _REGISTRY:
        raise KeyError(f"unknown normalizer {kind!r}; have "
                       f"{sorted(_REGISTRY)}")
    return _REGISTRY[kind](stats, **kw)


class ZarrStatsLoader:
    """Read per-band ``statistics`` attrs from a hierarchical cube (the
    zarr-attr-stats-based preset implementation, SURVEY.md §2.3)."""

    def __init__(self, cube_path: str):
        self.root = zl.open_zarr(cube_path)

    def band_stats(self, band_path: str) -> Dict[str, float]:
        arr = self.root[band_path]
        return dict(arr.attrs.get("statistics", {}))

    def normalizer_for(self, band_path: str, kind: str = "zscore",
                       **kw) -> Normalizer:
        return make_normalizer(kind, self.band_stats(band_path), **kw)


class NormalizationManager:
    """Apply a plan {channel_name: (kind, stats)} across a channel-last
    array, vectorized per channel."""

    def __init__(self, plan: Dict[str, Normalizer]):
        self.plan = plan

    def forward(self, x: np.ndarray, channel_names) -> np.ndarray:
        out = np.array(x, copy=True)
        for i, name in enumerate(channel_names):
            n = self.plan.get(name)
            if n is not None:
                out[..., i] = n.forward(out[..., i])
        return out

    def inverse(self, y: np.ndarray, channel_names) -> np.ndarray:
        out = np.array(y, copy=True)
        for i, name in enumerate(channel_names):
            n = self.plan.get(name)
            if n is not None:
                out[..., i] = n.inverse(out[..., i])
        return out


__all__ = ["Normalizer", "Identity", "ZScore", "RobustIQR", "MinMax",
           "LinearRescale", "Clamp", "make_normalizer", "ZarrStatsLoader",
           "NormalizationManager"]
