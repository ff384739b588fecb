"""StatsCalculator: per-channel stats + per-feature covariance -> JSON sidecar.

Behavioral contracts from /root/reference/frl/data/stats/
stats_calculator.py (SURVEY.md §2.3, §4.6):

- sample N patches (bindings ``stats.samples.n``), maintain a per-channel
  reservoir (vectorized Algorithm R) over valid masked pixels;
- univariate stats [mean, sd, min, max, q02..q98] per channel (:363-450);
- categorical counts for integer channels (:451-500);
- per-feature covariance of the NORMALIZED channels (whitening consumes it),
  patch-centered (subtract each patch's own channel means before
  accumulating) or global-centered (:501-563);
- writes the JSON consumed by FeatureBuilder (:564-576).

OnlineCovarianceComputer is the Welford/Chan single-pass merge used for the
global-centered path (/root/reference/frl/data/stats/
online_covariance_computer.py:21-540).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from forest_tpu.data.bindings import BindingsConfig
from forest_tpu.data.samplers import ReservoirSampler


class OnlineCovarianceComputer:
    """NaN-safe streaming mean/covariance (Chan parallel merge)."""

    def __init__(self, dim: int):
        self.n = 0.0
        self.mean = np.zeros(dim)
        self.m2 = np.zeros((dim, dim))

    def update(self, x: np.ndarray) -> None:
        """x [N, C]; rows with any NaN are dropped."""
        x = np.asarray(x, np.float64)
        x = x[np.isfinite(x).all(axis=1)]
        nb = len(x)
        if nb == 0:
            return
        mb = x.mean(0)
        xc = x - mb
        m2b = xc.T @ xc
        if self.n == 0:
            self.n, self.mean, self.m2 = float(nb), mb, m2b
            return
        delta = mb - self.mean
        tot = self.n + nb
        self.m2 = self.m2 + m2b + np.outer(delta, delta) * self.n * nb / tot
        self.mean = self.mean + delta * nb / tot
        self.n = tot

    def covariance(self, regularize: float = 0.0) -> np.ndarray:
        if self.n < 2:
            return np.eye(len(self.mean))
        c = self.m2 / (self.n - 1)
        if regularize:
            c = c + regularize * np.eye(len(self.mean))
        return c


_QS = {"q02": 2, "q05": 5, "q25": 25, "q50": 50, "q75": 75, "q95": 95,
       "q98": 98}


class StatsCalculator:
    def __init__(self, bindings: BindingsConfig, dataset,
                 feature_builder_cls=None, seed: int = 0):
        self.bindings = bindings
        self.dataset = dataset
        self.rng = np.random.default_rng(seed)
        from forest_tpu.data.feature_builder import FeatureBuilder
        self._fb_cls = feature_builder_cls or FeatureBuilder

    def _global_mask(self, patch: Dict[str, np.ndarray]) -> np.ndarray:
        """Product of the bindings stats.mask references -> [H, W]."""
        m = None
        for ref in self.bindings.stats.mask:
            gname, cname = ref.split(".")
            g = self.bindings.dataset[gname]
            x = patch[gname][..., g.channel_index(cname)]
            mm = np.nan_to_num(np.asarray(x, np.float32)) > 0
            m = mm if m is None else (m & mm)
        if m is None:
            any_g = next(k for k in patch if not k.startswith("__"))
            shape = patch[any_g].shape
            hw = shape[-3:-1] if len(shape) >= 3 else shape[:2]
            m = np.ones(hw, bool)
        return m

    def compute(self, n_patches: Optional[int] = None) -> Dict:
        cfg = self.bindings.stats
        n_patches = n_patches or cfg.n_samples
        n_avail = len(self.dataset)
        picks = self.rng.choice(n_avail, min(n_patches, n_avail),
                                replace=False)
        patches = [self.dataset.get_patch(int(i)) for i in picks]

        stats: Dict[str, Dict] = {}
        # --- pass 1: univariate per (feature, channel) over reservoirs ----
        for fname, fc in self.bindings.features.items():
            stats[fname] = {}
            for ref, spec in fc.channels.items():
                res = ReservoirSampler(cfg.reservoir_size,
                                       seed=int(self.rng.integers(2**31)))
                counts: Dict[int, int] = {}
                gname, cname = ref.split(".")
                gcfg = self.bindings.dataset[gname]
                is_cat = gcfg.dtype.startswith("int")
                for patch in patches:
                    x = np.asarray(
                        patch[gname][..., gcfg.channel_index(cname)],
                        np.float32)
                    gm = self._global_mask(patch)
                    if x.ndim == gm.ndim + 1:   # temporal
                        gm = np.broadcast_to(gm[None], x.shape)
                    vals = x[gm & np.isfinite(x)]
                    # Stats must live in the SAME domain FeatureBuilder
                    # normalizes in: apply the channel's pre-transform
                    # before sampling (log-normalized channels etc.).
                    if spec.transform:
                        from forest_tpu.data.transforms import \
                            apply_transform
                        vals = np.asarray(apply_transform(spec.transform,
                                                          vals))
                        vals = vals[np.isfinite(vals)]
                    if is_cat:
                        u, c = np.unique(vals.astype(np.int64),
                                         return_counts=True)
                        for uu, cc in zip(u, c):
                            counts[int(uu)] = counts.get(int(uu), 0) \
                                + int(cc)
                    if vals.size:
                        res.add(vals[:, None])
                buf = res.sample().ravel() if res.n_seen else \
                    np.zeros(1, np.float32)
                entry: Dict = {}
                for s in cfg.stats:
                    if s == "mean":
                        entry["mean"] = float(buf.mean())
                    elif s == "sd":
                        entry["sd"] = float(buf.std())
                    elif s == "min":
                        entry["min"] = float(buf.min())
                    elif s == "max":
                        entry["max"] = float(buf.max())
                    elif s in _QS:
                        entry[s] = float(np.percentile(buf, _QS[s]))
                entry["n_seen"] = int(res.n_seen)
                if is_cat:
                    entry["counts"] = {str(k): v
                                       for k, v in sorted(counts.items())}
                stats[fname][ref] = entry

        # --- pass 2: covariance of normalized channels --------------------
        if cfg.covariance:
            fb = self._fb_cls(self.bindings, stats)
            for fname, fc in self.bindings.features.items():
                if not fc.covariance.calculate:
                    continue
                dim = len(fc.channels)
                occ = OnlineCovarianceComputer(dim)
                patch_centered = fc.covariance.stat_domain == "patch"
                for patch in patches:
                    x, mask = fb.build_feature(fname, patch)
                    x = np.asarray(x, np.float64)
                    mask = np.asarray(mask)
                    rows = x.reshape(-1, dim)
                    ok = mask.reshape(-1, dim).all(axis=1)
                    rows = rows[ok]
                    if len(rows) < 2:
                        continue
                    if patch_centered:
                        rows = rows - rows.mean(0)
                    occ.update(rows)
                stats[fname]["__covariance__"] = {
                    "matrix": occ.covariance(1e-8).tolist(),
                    "mean": (np.zeros(dim) if patch_centered
                             else occ.mean).tolist(),
                    "n": occ.n,
                    "stat_domain": fc.covariance.stat_domain,
                }
        return stats

    def compute_and_save(self, n_patches: Optional[int] = None) -> Path:
        stats = self.compute(n_patches)
        out = Path(self.bindings.stats.file)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(stats, indent=1))
        return out


def compute_stats_from_config(bindings: BindingsConfig, dataset=None,
                              **kw) -> Path:
    """The example_compute_stats pipeline step (SURVEY.md §2.8, §4.6)."""
    if dataset is None:
        from forest_tpu.data.frl_dataset import ForestDatasetV2
        dataset = ForestDatasetV2(bindings, split=None, **kw)
    return StatsCalculator(bindings, dataset).compute_and_save()


# ---------------------------------------------------------------------------
# Derived-feature statistics pipeline
# ---------------------------------------------------------------------------


class DerivedStatsComputer:
    """Single-pass statistics for DERIVED feature channels, stored in the
    cube's zarr attrs for use during training.

    The standalone pipeline role of /root/reference/frl/data/stats/
    derived_statistics_computer.py:47-760 (sample patches once; compute
    per-channel stats and optional covariance for derived features --
    temporal deltas / Sobel gradients / rolling means of source channels --
    and persist into the zarr dataset) with
    derived_statistics_loader.py:1-414's read-back as
    :func:`load_derived_stats`.

    ``specs``: list of dicts {"name", "source" ("group.channel"),
    "kind" ("delta"|"sobel"|"rolling"), **op kwargs}.
    """

    def __init__(self, bindings: BindingsConfig, dataset, specs,
                 seed: int = 0, reservoir_size: int = 100_000,
                 covariance: bool = True):
        self.bindings = bindings
        self.dataset = dataset
        self.specs = list(specs)
        self.rng = np.random.default_rng(seed)
        self.reservoir_size = reservoir_size
        self.covariance = covariance

    def _derive(self, spec, patch: Dict[str, np.ndarray]) -> np.ndarray:
        from forest_tpu.data import derived_features as df
        gname, cname = spec["source"].split(".")
        gcfg = self.bindings.dataset[gname]
        x = np.asarray(patch[gname][..., gcfg.channel_index(cname)],
                       np.float32)
        kind = spec["kind"]
        if kind == "delta":
            return np.asarray(df.temporal_deltas(
                x[..., None], order=int(spec.get("order", 1))))[..., 0]
        if kind == "sobel":
            g2d = x if x.ndim == 2 else x.reshape(-1, *x.shape[-2:])
            out = np.asarray(df.sobel_channels(
                np.nan_to_num(g2d)[..., None]))[..., 0]
            return out.reshape(x.shape)
        if kind == "rolling":
            # rolling_mean expects [.., T, H, W, C]; x is [T, H, W]
            return np.asarray(df.rolling_mean(
                x[..., None], window=int(spec.get("window", 3))))[..., 0]
        raise ValueError(f"unknown derived kind {kind!r}")

    def compute(self, n_patches: int = 16) -> Dict:
        n_avail = len(self.dataset)
        picks = self.rng.choice(n_avail, min(n_patches, n_avail),
                                replace=False)
        patches = [self.dataset.get_patch(int(i)) for i in picks]
        out: Dict[str, Dict] = {}
        reservoirs = {}
        for spec in self.specs:
            res = ReservoirSampler(self.reservoir_size,
                                   seed=int(self.rng.integers(2 ** 31)))
            for patch in patches:
                v = self._derive(spec, patch).ravel()
                v = v[np.isfinite(v)]
                if v.size:
                    res.add(v[:, None])
            buf = res.sample().ravel() if res.n_seen else \
                np.zeros(1, np.float32)
            out[spec["name"]] = {
                "mean": float(buf.mean()), "sd": float(buf.std()),
                "min": float(buf.min()), "max": float(buf.max()),
                **{q: float(np.percentile(buf, p))
                   for q, p in _QS.items()},
                "n_seen": int(res.n_seen), "kind": spec["kind"],
                "source": spec["source"],
            }
            reservoirs[spec["name"]] = res
        if self.covariance and len(self.specs) > 1 and patches:
            # Covariance pairs values positionally after ravel, which is
            # only meaningful when every channel has the same shape per
            # patch (e.g. all [H,W] deriveds). Group specs by derived
            # shape and emit one covariance block per group rather than
            # silently truncating mismatched sources to a common prefix.
            shape_of = {s["name"]: self._derive(s, patches[0]).shape
                        for s in self.specs}
            groups: Dict[tuple, list] = {}
            for s in self.specs:
                groups.setdefault(shape_of[s["name"]], []).append(s)
            specs_cov = max(groups.values(), key=len)
            skipped = [s["name"] for s in self.specs
                       if s not in specs_cov]
            if skipped:
                import warnings
                warnings.warn(
                    "derived-stats covariance: skipping channels with "
                    f"mismatched shapes {skipped} (positional pairing "
                    "would misalign values)", stacklevel=2)
            if len(specs_cov) > 1:
                occ = OnlineCovarianceComputer(len(specs_cov))
                for patch in patches:
                    cols = [self._derive(s, patch).ravel()
                            for s in specs_cov]
                    rows = np.stack(cols, axis=1)
                    rows = rows[np.isfinite(rows).all(axis=1)]
                    if len(rows) >= 2:
                        occ.update(rows)
                out["__covariance__"] = {
                    "matrix": occ.covariance(1e-8).tolist(),
                    "mean": occ.mean.tolist(), "n": occ.n,
                    "channels": [s["name"] for s in specs_cov],
                    "skipped": skipped,
                }
        return out

    def compute_and_save(self, zarr_path=None, n_patches: int = 16) -> Dict:
        """Persist into the cube root attrs under ``derived_statistics``
        (the reference writes into the zarr dataset, :709-760)."""
        from forest_tpu.data import zarrlite as zl
        stats = self.compute(n_patches)
        path = zarr_path or self.bindings.zarr_path
        root = zl.open_zarr(path)
        root.attrs["derived_statistics"] = stats
        root.write_attrs()
        return stats


def load_derived_stats(zarr_path) -> Dict:
    """Loader counterpart (derived_statistics_loader.py role): read the
    persisted derived statistics back; returns {} when absent."""
    from forest_tpu.data import zarrlite as zl
    root = zl.open_zarr(zarr_path)
    return dict(root.attrs.get("derived_statistics", {}))


def derived_normalizer(stats_entry: Dict, kind: str = "zscore"):
    """Build a Normalizer from one derived-stats entry (loader role)."""
    from forest_tpu.data.normalization import make_normalizer
    return make_normalizer(kind, stats_entry)


__all__ = ["StatsCalculator", "OnlineCovarianceComputer",
           "compute_stats_from_config", "DerivedStatsComputer",
           "load_derived_stats", "derived_normalizer"]
