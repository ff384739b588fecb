"""FeatureBuilder: stats-driven feature assembly with fused whitening.

Behavioral contracts from /root/reference/frl/data/loaders/builders/
feature_builder.py (SURVEY.md §2.3):

- channel extraction/stack from named dataset groups ("group.channel");
- combined mask = global masks AND per-channel mask AND finiteness, with
  spatial->temporal broadcast (:287-400);
- per-channel pre-transform + normalization presets zscore / robust_iqr /
  linear_rescale / clamp / identity with stats from the JSON sidecar
  (:402-548);
- Mahalanobis whitening W = chol((Sigma + 1e-6 I)^-1), x <- clip(W(x - mu),
  +/-5), NaNs zeroed before the matmul (:550-682);
- masked values zeroed in the output (:709-737);
- ``build_feature_at_locations``: anchor-only build, pointwise-identical to
  the full-grid build (~H*W/N cheaper) (:180-233).

TPU-native: all math is jnp so the whole builder can be traced inside the
jitted train step (SURVEY.md §2.10 item 2) -- the host loader only hands
over raw group arrays. Channel-last layout throughout.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from forest_tpu.data.bindings import (BindingsConfig, FeatureConfig,
                                      NormalizationPresetConfig)
from forest_tpu.data.transforms import apply_transform
from forest_tpu.ops.whitening import whitening_matrix

Array = jax.Array


class FeatureBuilder:
    def __init__(self, bindings: BindingsConfig,
                 stats: Optional[Dict] = None,
                 whiten_clip: float = 5.0, whiten_eps: float = 1e-6):
        self.bindings = bindings
        if stats is None and bindings.stats.file and \
                Path(bindings.stats.file).exists():
            stats = json.loads(Path(bindings.stats.file).read_text())
        self.stats = stats or {}
        self.whiten_clip = whiten_clip
        self.whiten_eps = whiten_eps
        self._w_cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}

    # ------------------------------------------------------------------

    def _group_channel(self, group_data: Dict[str, Array], ref: str):
        gname, cname = ref.split(".")
        g = self.bindings.dataset[gname]
        ci = g.channel_index(cname)
        return group_data[gname][..., ci]

    def channel_stats(self, feature_name: str, channel_ref: str
                      ) -> Dict[str, float]:
        return self.stats.get(feature_name, {}).get(channel_ref, {}) or \
            self.stats.get("channels", {}).get(channel_ref, {})

    def _normalize(self, x: Array, preset: NormalizationPresetConfig,
                   st: Dict[str, float]) -> Array:
        t = preset.type
        if t == "zscore":
            sd = st.get("sd", 1.0)
            sd = sd if sd and sd > 1e-8 else 1.0
            x = (x - st.get("mean", 0.0)) / sd
        elif t == "robust_iqr":
            iqr = st.get("q75", 1.0) - st.get("q25", 0.0)
            iqr = iqr if iqr > 1e-8 else 1.0
            x = (x - st.get("q50", 0.0)) / iqr
        elif t == "linear_rescale":
            in_min = preset.in_min if preset.in_min is not None \
                else st.get("min", 0.0)
            in_max = preset.in_max if preset.in_max is not None \
                else st.get("max", 1.0)
            rng = in_max - in_min
            rng = rng if rng > 1e-8 else 1.0
            out_min = preset.out_min if preset.out_min is not None else 0.0
            out_max = preset.out_max if preset.out_max is not None else 1.0
            x = (x - in_min) / rng * (out_max - out_min) + out_min
        elif t in ("clamp", "none", "identity"):
            pass
        else:
            raise ValueError(f"unknown normalization type {t!r}")
        if preset.clamp and preset.clamp.get("enabled", False):
            x = jnp.clip(x, preset.clamp.get("min"), preset.clamp.get("max"))
        return x

    def _whitening_for(self, feature_name: str, fc: FeatureConfig
                       ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        if not fc.covariance.calculate:
            return None
        if feature_name in self._w_cache:
            return self._w_cache[feature_name]
        cov_entry = self.stats.get(feature_name, {}).get("__covariance__")
        if cov_entry is None:
            return None
        cov = np.asarray(cov_entry["matrix"], np.float64)
        mean = np.asarray(cov_entry.get("mean",
                                        np.zeros(cov.shape[0])), np.float32)
        w = whitening_matrix(cov, self.whiten_eps)
        self._w_cache[feature_name] = (w, mean)
        return w, mean

    # ------------------------------------------------------------------

    def build_feature(self, feature_name: str,
                      group_data: Dict[str, Array]
                      ) -> Tuple[Array, Array]:
        """-> (x [.., H, W, C] (or [.., T, H, W, C]), mask same shape bool).

        ``group_data`` values may carry leading batch dims; channel refs are
        resolved on the trailing axes.
        """
        fc = self.bindings.get_feature(feature_name)
        temporal = fc.temporal
        chans, masks = [], []
        for ref, spec in fc.channels.items():
            x = jnp.asarray(self._group_channel(group_data, ref),
                            jnp.float32)
            valid = jnp.isfinite(x)
            if spec.mask:
                m = jnp.asarray(self._group_channel(group_data, spec.mask),
                                jnp.float32)
                # spatial -> temporal broadcast when needed
                if temporal and m.ndim == x.ndim - 1:
                    m = jnp.broadcast_to(m[..., None, :, :], x.shape)
                elif temporal and m.ndim == x.ndim and \
                        m.shape != x.shape:
                    m = jnp.broadcast_to(m, x.shape)
                valid = valid & (m > 0)
            if spec.transform:
                x = apply_transform(spec.transform, x)
                valid = valid & jnp.isfinite(x)
            preset = self.bindings.get_normalization_preset(spec.norm)
            st = self.channel_stats(feature_name, ref)
            x = self._normalize(jnp.where(valid, x, 0.0), preset, st)
            chans.append(jnp.where(valid, x, 0.0))
            masks.append(valid)
        x = jnp.stack(chans, axis=-1)
        mask = jnp.stack(masks, axis=-1)

        wm = self._whitening_for(feature_name, fc)
        if wm is not None:
            from forest_tpu.ops.whitening import apply_whitening
            w, mean = wm
            x = apply_whitening(x, jnp.asarray(w), jnp.asarray(mean),
                                mask, clip=self.whiten_clip)
        return x, mask

    def build_feature_at_locations(self, feature_name: str,
                                   group_data: Dict[str, Array],
                                   coords: Array) -> Tuple[Array, Array]:
        """Anchor-only build: gather pixels first, then identical math.

        group_data values are unbatched ([H, W, C] / [T, H, W, C]); coords
        [N, 2]. Returns ([N, C], mask) or ([N, T, C], mask) for temporal
        features -- bit-identical to indexing the full-grid build
        (feature_builder.py:180-233 contract).
        """
        sub = {}
        for gname, arr in group_data.items():
            if gname.startswith("__"):
                continue
            a = jnp.asarray(arr)
            if a.ndim == 3:     # [H, W, C] -> [N, 1, C] fake grid
                sub[gname] = a[coords[:, 0], coords[:, 1]][:, None, :]
            else:               # [T, H, W, C] -> [T, N, 1, C]
                sub[gname] = a[:, coords[:, 0], coords[:, 1]][:, :, None, :]
        x, mask = self.build_feature(feature_name, sub)
        fc = self.bindings.get_feature(feature_name)
        if fc.temporal:  # [T, N, 1, C] -> [N, T, C]
            return (jnp.transpose(x[:, :, 0, :], (1, 0, 2)),
                    jnp.transpose(mask[:, :, 0, :], (1, 0, 2)))
        return x[:, 0, :], mask[:, 0, :]


__all__ = ["FeatureBuilder"]
