"""Reference-depth phase linear probe (whitened targets, per-metric reports).

Contracts from /root/reference/frl/training/fit_phase_linear_probe.py:

- design matrices (:239-289): ``full`` ([z_type, z_phase, z_type (x)
  z_phase]), ``additive``, ``type-only``, ``phase-only``;
- ProbePreprocessor (:291-401): per-column standardization + top-k PCA
  compression of the interaction block, fitted from streamed sufficient
  statistics (pass 1, :403-571);
- fit_phase_probe (:573-697): two-pass streaming ridge regression, normal
  equations accumulated in float64;
- inverse normalization (:698-785): un-whiten -> un-normalize (the preset
  affine) -> inverse per-channel transform, mapping predictions back to the
  original data scale;
- evaluate_phase_probe (:787-1076): per-channel and total MSE / R^2 /
  Spearman rho^2 in BOTH normalized and original scales, the temporal
  (within-pixel) R^2 decomposition, and the fraction of target variance
  that is within-pixel; Spearman over a bounded uniform subsample
  (:781-786).

TPU-native shape: the encoders run jitted on device; all probe algebra is
small host linear algebra over streamed anchor rows (static [B, A, T, .]
blocks from strided anchor grids with a halo exclusion, matching the
reference's _halo_mask :87-98).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from forest_tpu.data.transforms import get_transform
from forest_tpu.eval.linear_probe import StreamingRidge

DESIGN_CHOICES = ("full", "additive", "type-only", "phase-only")

_SPEARMAN_CAP = 200_000  # rows kept per split for rho^2


def build_design_matrix(zt: np.ndarray, zp: np.ndarray,
                        design: str) -> np.ndarray:
    """[N, dt], [N, dp] -> [N, D_raw] per the design choice (:239-270)."""
    if design == "type-only":
        return zt
    if design == "phase-only":
        return zp
    if design == "additive":
        return np.concatenate([zt, zp], axis=1)
    if design == "full":
        inter = (zt[:, :, None] * zp[:, None, :]).reshape(zt.shape[0], -1)
        return np.concatenate([zt, zp, inter], axis=1)
    raise ValueError(f"unknown design {design!r} (choices {DESIGN_CHOICES})")


def design_dim(design: str, d_type: int, d_phase: int) -> int:
    return {"type-only": d_type, "phase-only": d_phase,
            "additive": d_type + d_phase,
            "full": d_type + d_phase + d_type * d_phase}[design]


@dataclass
class PhaseProbePreprocessor:
    """Column standardization + optional interaction-block PCA (:291-401)."""
    design: str
    d_type: int
    d_phase: int
    mean: np.ndarray                    # [D_raw]
    std: np.ndarray                     # [D_raw]
    pca_components: Optional[np.ndarray] = None   # [d_int, k]

    @property
    def output_dim(self) -> int:
        d_main = design_dim(self.design, self.d_type, self.d_phase)
        if self.design == "full" and self.pca_components is not None:
            return (self.d_type + self.d_phase
                    + self.pca_components.shape[1])
        return d_main

    def transform(self, x_raw: np.ndarray) -> np.ndarray:
        z = (x_raw - self.mean) / self.std
        if self.design == "full" and self.pca_components is not None:
            d_main = self.d_type + self.d_phase
            return np.concatenate(
                [z[:, :d_main], z[:, d_main:] @ self.pca_components], axis=1)
        return z

    def to_dict(self) -> dict:
        return {"design": self.design, "d_type": self.d_type,
                "d_phase": self.d_phase, "mean": self.mean.tolist(),
                "std": self.std.tolist(),
                "pca_components": (self.pca_components.tolist()
                                   if self.pca_components is not None
                                   else None)}

    @classmethod
    def from_dict(cls, d: dict) -> "PhaseProbePreprocessor":
        pca = d.get("pca_components")
        return cls(d["design"], d["d_type"], d["d_phase"],
                   np.asarray(d["mean"]), np.asarray(d["std"]),
                   np.asarray(pca) if pca is not None else None)


def make_probe_mask_fn(fb, type_feature: str = "type_encoder_input",
                       phase_feature: str = "phase_ccdc",
                       static_masks: Tuple[str, ...] = ("static_mask.aoi",
                                                        "static_mask.forest")
                       ):
    """Per-anchor validity beyond the target mask: the reference probe
    ANDs the encoder-input mask, the phase-input mask (all T), and the
    aoi/forest masks (fit_phase_linear_probe.py:146-165) so the ridge
    never fits on out-of-AOI, non-forest, or masked-input pixels (whose
    feature-builder outputs are zero-filled garbage). Missing mask
    channels are skipped."""
    refs = []
    for ref in static_masks:
        g, c = ref.split(".")
        if g in fb.bindings.dataset:
            try:
                refs.append((g, fb.bindings.dataset[g].channel_index(c)))
            except (KeyError, ValueError):
                pass

    @jax.jit
    def mask(batch, coords):
        def one(groups):
            ok = jnp.ones((coords.shape[0],), bool)
            for g, ci in refs:
                grid = groups[g][..., ci]
                ok = ok & (grid[coords[:, 0], coords[:, 1]] > 0)
            _, mt = fb.build_feature_at_locations(type_feature, groups,
                                                  coords)
            ok = ok & mt.reshape(coords.shape[0], -1).all(-1)
            _, mp = fb.build_feature_at_locations(phase_feature, groups,
                                                  coords)
            return ok & mp.reshape(coords.shape[0], -1).all(-1)

        return jax.vmap(one, in_axes=({k: 0 for k in batch},))(
            {k: v for k, v in batch.items()})

    return mask


def iter_phase_blocks(encode_type_fn: Callable, encode_phase_fn: Callable,
                      ds, anchor_stride: int, halo: int, batch_size: int,
                      max_batches: Optional[int],
                      mask_fn: Optional[Callable] = None,
                      keep_groups: Optional[set] = None
                      ) -> Iterator[Tuple[np.ndarray, np.ndarray,
                                          np.ndarray, np.ndarray]]:
    """Yield (zt [B,A,dt], zp [B,A,T,dp], y [B,A,T,C], valid [B,A,T]).

    Anchors on a strided grid excluding a ``halo`` border (the reference's
    _halo_mask :87-98 keeps probe pixels away from boundary padding).
    ``mask_fn(batch, coords) -> [B, A] bool`` ANDs into the target-mask
    validity (see :func:`make_probe_mask_fn`); ``keep_groups`` restricts
    the device transfer to the groups the probe needs (the relay H2D link
    is the documented bottleneck).
    """
    n = len(ds)
    count = 0
    for i in range(0, n, batch_size):
        idx = list(range(i, min(i + batch_size, n)))
        batch = {k: jnp.asarray(v) for k, v in ds.load_batch(idx).items()
                 if not k.startswith("__")
                 and (keep_groups is None or k in keep_groups)}
        zt = encode_type_fn(batch)                      # [B, H, W, dt]
        h, w = zt.shape[1:3]
        rr, cc = jnp.meshgrid(
            jnp.arange(halo, h - halo, anchor_stride),
            jnp.arange(halo, w - halo, anchor_stride), indexing="ij")
        coords = jnp.stack([rr.reshape(-1), cc.reshape(-1)], 1)
        zp, ta, tm = encode_phase_fn(batch, coords)     # [B,A,T,dp], tgt
        zt_a = jax.vmap(lambda z, c: z[c[:, 0], c[:, 1]],
                        in_axes=(0, None))(zt, coords)  # [B, A, dt]
        valid = np.asarray(tm).all(-1)
        if mask_fn is not None:
            anchor_ok = np.asarray(mask_fn(batch, coords))   # [B, A]
            valid = valid & anchor_ok[:, :, None]
        yield (np.asarray(zt_a), np.asarray(zp), np.asarray(ta), valid)
        count += 1
        if max_batches and count >= max_batches:
            break


def _flatten_rows(zt, zp, valid):
    """Blocks -> masked flat rows (zt repeated over T)."""
    b, a, t, dp = zp.shape
    dt = zt.shape[-1]
    zt_rep = np.broadcast_to(zt[:, :, None, :], (b, a, t, dt))
    m = valid.reshape(-1)
    return (zt_rep.reshape(-1, dt)[m], zp.reshape(-1, dp)[m], m)


def fit_phase_probe(encode_type_fn: Callable, encode_phase_fn: Callable,
                    ds_train, *, design: str = "full",
                    interaction_pca_k: int = 20,
                    ridge_lambda: float = 1e-3, anchor_stride: int = 4,
                    halo: int = 8, batch_size: int = 2,
                    max_batches: Optional[int] = None,
                    mask_fn: Optional[Callable] = None,
                    keep_groups: Optional[set] = None
                    ) -> Tuple[np.ndarray, PhaseProbePreprocessor]:
    """Two-pass streaming ridge (:573-697). Returns (W [D_out+1, C],
    preprocessor); W's last row is the bias. Normal equations accumulate
    in float64 on the host (the reference's f64 Gram contract)."""

    def blocks():
        return iter_phase_blocks(encode_type_fn, encode_phase_fn, ds_train,
                                 anchor_stride, halo, batch_size,
                                 max_batches, mask_fn=mask_fn,
                                 keep_groups=keep_groups)

    # ---- pass 1: column stats + interaction PCA (:403-571) --------------
    sum_x = sum_x2 = sum_ii = None
    d_type = d_phase = d_raw = d_int = 0
    need_pca = False
    n_obs = 0
    for zt, zp, y, valid in blocks():
        if sum_x is None:  # dims from the first block -- no extra pass
            d_type = zt.shape[-1]
            d_phase = zp.shape[-1]
            d_raw = design_dim(design, d_type, d_phase)
            d_int = d_type * d_phase
            need_pca = design == "full" and 0 < interaction_pca_k < d_int
            sum_x = np.zeros(d_raw, np.float64)
            sum_x2 = np.zeros(d_raw, np.float64)
            sum_ii = (np.zeros((d_int, d_int), np.float64)
                      if need_pca else None)
        zt_f, zp_f, _ = _flatten_rows(zt, zp, valid)
        if zt_f.shape[0] == 0:
            continue
        x_raw = build_design_matrix(zt_f, zp_f, design).astype(np.float64)
        sum_x += x_raw.sum(0)
        sum_x2 += (x_raw ** 2).sum(0)
        if need_pca:
            xi = x_raw[:, d_type + d_phase:]
            sum_ii += xi.T @ xi
        n_obs += x_raw.shape[0]
    if n_obs == 0:
        raise ValueError("no valid probe observations (check halo/stride)")
    mean = sum_x / n_obs
    std = np.sqrt(np.maximum(sum_x2 / n_obs - mean ** 2, 1e-12))
    pca = None
    if need_pca:
        mi = mean[d_type + d_phase:]
        si = std[d_type + d_phase:]
        cov = (sum_ii / n_obs - np.outer(mi, mi)) / np.outer(si, si)
        evals, evecs = np.linalg.eigh(cov)
        pca = evecs[:, ::-1][:, :interaction_pca_k]   # [d_int, k], desc
    pre = PhaseProbePreprocessor(design, d_type, d_phase, mean, std, pca)

    # ---- pass 2: ridge on preprocessed features (:630-697) --------------
    ridge = None
    for zt, zp, y, valid in blocks():
        zt_f, zp_f, _ = _flatten_rows(zt, zp, valid)
        if zt_f.shape[0] == 0:
            continue
        x = pre.transform(build_design_matrix(zt_f, zp_f, design))
        y_f = y.reshape(-1, y.shape[-1])[valid.reshape(-1)]
        if ridge is None:
            ridge = StreamingRidge(x.shape[1], y_f.shape[1],
                                   f64_blocks=True)
        ridge.update(x, y_f)
    w = ridge.solve(ridge_lambda)
    return w, pre


def inverse_normalization_fn(fb, feature_name: str) -> Callable:
    """Map normalized-space values [N, C] back to the original data scale
    (:698-785): un-whiten, invert the preset affine, invert the transform."""
    fc = fb.bindings.get_feature(feature_name)
    wm = fb._whitening_for(feature_name, fc)
    inv_w = None
    w_mean = None
    if wm is not None:
        w, w_mean = wm
        inv_w = np.linalg.inv(np.asarray(w, np.float64))
    scales, offsets, tnames = [], [], []
    for ref, spec in fc.channels.items():
        preset = fb.bindings.get_normalization_preset(spec.norm)
        st = fb.channel_stats(feature_name, ref)
        t = preset.type
        if t == "zscore":
            sd = st.get("sd", 1.0)
            scale, off = (sd if sd and sd > 1e-8 else 1.0), st.get("mean", 0.0)
        elif t == "robust_iqr":
            iqr = st.get("q75", 1.0) - st.get("q25", 0.0)
            scale, off = (iqr if iqr > 1e-8 else 1.0), st.get("q50", 0.0)
        elif t == "linear_rescale":
            in_min = preset.in_min if preset.in_min is not None \
                else st.get("min", 0.0)
            in_max = preset.in_max if preset.in_max is not None \
                else st.get("max", 1.0)
            rng = in_max - in_min
            rng = rng if rng > 1e-8 else 1.0
            out_min = preset.out_min if preset.out_min is not None else 0.0
            out_max = preset.out_max if preset.out_max is not None else 1.0
            orng = (out_max - out_min) or 1.0
            scale, off = rng / orng, in_min - out_min * rng / orng
        else:
            scale, off = 1.0, 0.0
        scales.append(scale)
        offsets.append(off)
        tnames.append(spec.transform)
    scales = np.asarray(scales, np.float64)
    offsets = np.asarray(offsets, np.float64)

    def inverse(y_norm: np.ndarray) -> np.ndarray:
        p = np.asarray(y_norm, np.float64)
        if inv_w is not None:
            p = p @ inv_w.T + np.asarray(w_mean, np.float64)
        p = p * scales + offsets
        cols = []
        for c, tn in enumerate(tnames):
            col = p[:, c]
            if tn:
                col = np.asarray(get_transform(tn).inverse(col))
            cols.append(col)
        return np.stack(cols, axis=1)

    return inverse


def _spearman_rho2(pred: np.ndarray, y: np.ndarray) -> float:
    """Squared Spearman rank correlation (:182-198)."""
    n = pred.shape[0]
    if n < 3:
        return float("nan")

    def rank(v):
        order = np.argsort(v, kind="stable")
        r = np.empty(n, np.float64)
        r[order] = np.arange(n, dtype=np.float64)
        return r

    rp, ry = rank(pred), rank(y)
    rp -= rp.mean()
    ry -= ry.mean()
    denom = np.sqrt((rp ** 2).sum() * (ry ** 2).sum())
    if denom < 1e-12:
        return float("nan")
    rho = float((rp * ry).sum() / denom)
    return rho * rho


def _nanmean(d: Dict[str, float]) -> float:
    vals = np.asarray(list(d.values()), np.float64)
    return float(np.nanmean(vals)) if vals.size else float("nan")


def _scale_metrics(sse, sum_y, sum_y2, n, names, suffix=""):
    out_mse, out_r2 = {}, {}
    for c, name in enumerate(names):
        if n[c] < 2:
            out_mse[name] = out_r2[name] = float("nan")
            continue
        ss_tot = max(sum_y2[c] - sum_y[c] ** 2 / n[c], 1e-12)
        out_mse[name] = sse[c] / n[c]
        out_r2[name] = 1.0 - sse[c] / ss_tot
    tot_n = float(n.sum())
    # Totals are the MEAN OF PER-CHANNEL values (the reference's
    # definition, fit_phase_linear_probe.py:1054-1069), not pooled sums --
    # pooled totals let a high-variance channel dominate arbitrarily.
    return {f"mse_per_channel{suffix}": out_mse,
            f"r2_per_channel{suffix}": out_r2,
            f"mse_total{suffix}": float(sse.sum()) / max(tot_n, 1.0),
            f"r2_total{suffix}": _nanmean(out_r2)}


def evaluate_phase_probe(encode_type_fn: Callable,
                         encode_phase_fn: Callable, ds, w: np.ndarray,
                         pre: PhaseProbePreprocessor, fb,
                         target_feature: str, *, anchor_stride: int = 4,
                         halo: int = 8, batch_size: int = 2,
                         max_batches: Optional[int] = None,
                         rng_seed: int = 0,
                         mask_fn: Optional[Callable] = None,
                         keep_groups: Optional[set] = None) -> Dict:
    """Streamed evaluation (:787-1076): per-channel + total MSE / R^2 /
    Spearman rho^2 in normalized and original scales, temporal
    (within-pixel) R^2, and the within-pixel variance fraction."""
    fc = fb.bindings.get_feature(target_feature)
    names: List[str] = list(fc.channels.keys())
    c_dim = len(names)
    inverse = inverse_normalization_fn(fb, target_feature)
    rng = np.random.default_rng(rng_seed)

    from forest_tpu.data.samplers import ReservoirSampler

    z = np.zeros(c_dim, np.float64)
    acc = {k: z.copy() for k in
           ("sse", "sum_y", "sum_y2", "sse_o", "sum_yo", "sum_yo2",
            "sse_t", "ss_t", "sse_to", "ss_to")}
    n_obs = np.zeros(c_dim, np.float64)
    n_pixels = 0
    # Uniform (pred, y) pair reservoirs per channel x scale -- the
    # reference's ReservoirSampler contract (:781-786); a sliding tail
    # would bias rho^2 toward the spatially-last batches.
    reservoirs = [ReservoirSampler(_SPEARMAN_CAP, seed=rng_seed + j)
                  for j in range(2 * c_dim)]

    for zt, zp, y, valid in iter_phase_blocks(
            encode_type_fn, encode_phase_fn, ds, anchor_stride, halo,
            batch_size, max_batches, mask_fn=mask_fn,
            keep_groups=keep_groups):
        b, a, t, _ = zp.shape
        zt_f, zp_f, m = _flatten_rows(zt, zp, valid)
        if zt_f.shape[0] == 0:
            continue
        x = pre.transform(build_design_matrix(zt_f, zp_f, pre.design))
        pred_f = x @ w[:-1] + w[-1]                       # [M, C]
        pred = np.zeros((b * a * t, c_dim))
        pred[m] = pred_f
        pred = pred.reshape(b, a, t, c_dim)
        yo = np.zeros((b * a * t, c_dim))
        yo[m] = inverse(y.reshape(-1, c_dim)[m])
        yo = yo.reshape(b, a, t, c_dim)
        po = np.zeros((b * a * t, c_dim))
        po[m] = inverse(pred_f)
        po = po.reshape(b, a, t, c_dim)

        v = valid[..., None].astype(np.float64)           # [B,A,T,1]
        n_obs += v.sum((0, 1, 2))
        for sse_k, sy_k, sy2_k, p_, y_ in (
                ("sse", "sum_y", "sum_y2", pred, y),
                ("sse_o", "sum_yo", "sum_yo2", po, yo)):
            acc[sse_k] += ((p_ - y_) ** 2 * v).sum((0, 1, 2))
            acc[sy_k] += (y_ * v).sum((0, 1, 2))
            acc[sy2_k] += (y_ ** 2 * v).sum((0, 1, 2))

        # temporal decomposition: demean each pixel's valid time series
        cnt_px = np.maximum(v.sum(2), 1.0)                # [B,A,1]
        px_valid = v.sum(2)[..., 0] >= 2                  # [B,A]
        n_pixels += int(px_valid.sum())
        for sse_k, ss_k, p_, y_ in (("sse_t", "ss_t", pred, y),
                                    ("sse_to", "ss_to", po, yo)):
            y_mu = (y_ * v).sum(2, keepdims=True) / cnt_px[:, :, None]
            p_mu = (p_ * v).sum(2, keepdims=True) / cnt_px[:, :, None]
            vv = v * px_valid[..., None, None]
            acc[sse_k] += (((p_ - p_mu) - (y_ - y_mu)) ** 2
                           * vv).sum((0, 1, 2))
            # ss_t doubles as the within-pixel variance accumulator for
            # variance_fraction_temporal below.
            acc[ss_k] += ((y_ - y_mu) ** 2 * vv).sum((0, 1, 2))

        # bounded uniform subsample for Spearman (:781-786)
        mm = np.flatnonzero(m)
        take = min(len(mm), 4096)
        sel = rng.choice(mm, size=take, replace=False) if take else mm
        if len(sel):
            for c in range(c_dim):
                for off, (p_, y_) in enumerate(
                        ((pred.reshape(-1, c_dim), y.reshape(-1, c_dim)),
                         (po.reshape(-1, c_dim), yo.reshape(-1, c_dim)))):
                    reservoirs[off * c_dim + c].add(
                        np.stack([p_[sel, c], y_[sel, c]], axis=1))

    out: Dict = {"n_observations": int(n_obs.max(initial=0)),
                 "n_pixels": n_pixels, "channels": names}
    out.update(_scale_metrics(acc["sse"], acc["sum_y"], acc["sum_y2"],
                              n_obs, names))
    out.update(_scale_metrics(acc["sse_o"], acc["sum_yo"], acc["sum_yo2"],
                              n_obs, names, suffix="_original"))
    for suffix, sse_t, ss_t in (("", acc["sse_t"], acc["ss_t"]),
                                ("_original", acc["sse_to"], acc["ss_to"])):
        per = {nm: (1.0 - sse_t[c] / max(ss_t[c], 1e-12)) if ss_t[c] > 0
               else float("nan") for c, nm in enumerate(names)}
        out[f"r2_temporal_per_channel{suffix}"] = per
        out[f"r2_temporal_total{suffix}"] = _nanmean(per)
    ss_tot = np.maximum(acc["sum_y2"] - acc["sum_y"] ** 2
                        / np.maximum(n_obs, 1.0), 1e-12)
    out["variance_fraction_temporal"] = {
        nm: float(acc["ss_t"][c] / ss_tot[c])
        for c, nm in enumerate(names)}
    out["variance_fraction_temporal_total"] = \
        _nanmean(out["variance_fraction_temporal"])
    for suffix, off in (("", 0), ("_original", 1)):
        per = {}
        for c, nm in enumerate(names):
            r = reservoirs[off * c_dim + c]
            buf = r.sample() if r.n_seen else np.zeros((0, 2))
            per[nm] = _spearman_rho2(buf[:, 0], buf[:, 1])
        out[f"spearman_rho2_per_channel{suffix}"] = per
        out[f"spearman_rho2_total{suffix}"] = _nanmean(per)
    return out


def format_phase_probe_report(m: Dict, prefix: str = "") -> str:
    """Per-metric table block (reference log_metrics :1363-1436)."""
    names = m["channels"]
    lines = [f"===== phase probe {prefix} "
             f"(n_obs={m['n_observations']:,}, n_pixels={m['n_pixels']:,}) "
             "=====",
             f"  {'channel':<22s} {'R2':>8} {'R2 orig':>8} {'R2 temp':>8} "
             f"{'rho2':>8} {'MSE':>10} {'var_t%':>7}"]
    for nm in names:
        lines.append(
            f"  {nm:<22s} {m['r2_per_channel'][nm]:>8.4f} "
            f"{m['r2_per_channel_original'][nm]:>8.4f} "
            f"{m['r2_temporal_per_channel'][nm]:>8.4f} "
            f"{m['spearman_rho2_per_channel'][nm]:>8.4f} "
            f"{m['mse_per_channel'][nm]:>10.4g} "
            f"{100 * m['variance_fraction_temporal'][nm]:>6.1f}%")
    lines.append(
        f"  {'TOTAL':<22s} {m['r2_total']:>8.4f} "
        f"{m['r2_total_original']:>8.4f} {m['r2_temporal_total']:>8.4f} "
        f"{m.get('spearman_rho2_total', float('nan')):>8.4f} "
        f"{m['mse_total']:>10.4g} "
        f"{100 * m['variance_fraction_temporal_total']:>6.1f}%")
    return "\n".join(lines)


def main(argv=None):
    """CLI (reference fit_phase_linear_probe.py:1438-1556): fit the phase
    probe from a trained checkpoint, report train/val metrics, optionally
    save the fitted probe (weights + preprocessor) as JSON.

    python -m forest_tpu.eval.phase_probe --checkpoint CKPT --bindings
        B.yaml [--design full] [--interaction-pca-k 20] [--halo 16] ...
    """
    import argparse
    import json
    from pathlib import Path

    from forest_tpu.data.bindings import parse_bindings
    from forest_tpu.data.feature_builder import FeatureBuilder
    from forest_tpu.data.frl_dataset import ForestDatasetV2
    from forest_tpu.eval import frozen

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--bindings", required=True)
    ap.add_argument("--target-feature", default=None,
                    help="defaults to the phase loss's neighborhood_target "
                         "feature from the bindings (the reference's "
                         "PHASE_TARGET_FEATURE contract); falls back to "
                         "the phase INPUT feature with a warning, which "
                         "measures reconstruction, not prediction")
    ap.add_argument("--patch-size", type=int, default=256)
    ap.add_argument("--split-block-size", type=int, nargs=2, default=(4, 4))
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--ridge-lambda", type=float, default=1e-3)
    ap.add_argument("--halo", type=int, default=16)
    ap.add_argument("--anchor-stride", type=int, default=4)
    ap.add_argument("--max-batches", type=int, default=0)
    ap.add_argument("--design", default="full", choices=DESIGN_CHOICES)
    ap.add_argument("--interaction-pca-k", type=int, default=20)
    ap.add_argument("--output", default=None,
                    help="save fitted probe (weights+preprocessor) JSON")
    a = ap.parse_args(argv)

    bindings = parse_bindings(a.bindings)
    fb = FeatureBuilder(bindings)
    model, params = frozen.load_frozen_model(a.checkpoint)
    enc_t, enc_p, _ = frozen.make_encode_fns(model, params, fb)
    type_feature = getattr(model, "type_feature", "type_encoder_input")
    phase_feature = getattr(model, "phase_feature", "phase_ccdc")
    target_feature = a.target_feature
    if target_feature is None:
        ph = (bindings.losses or {}).get("phase_neighborhood") or {}
        nt = ph.get("neighborhood_target")
        if isinstance(nt, str):
            target_feature = nt.split(".", 1)[1] \
                if nt.startswith("features.") else nt
        if target_feature is None or target_feature not in bindings.features:
            target_feature = phase_feature
            import sys
            print(f"[phase_probe] warning: no phase neighborhood_target in "
                  f"the bindings; probing against the phase INPUT feature "
                  f"{target_feature!r} measures reconstruction, not "
                  "prediction (pass --target-feature to override)",
                  file=sys.stderr)
    a.target_feature = target_feature
    targets = frozen.make_phase_target_fn(fb, a.target_feature)
    mask_fn = make_probe_mask_fn(fb, type_feature, phase_feature)
    keep = set(bindings.groups_for_features(
        [type_feature, phase_feature, a.target_feature])) | {"static_mask"}

    def enc_phase_fn(batch, coords):
        zp = enc_p(batch, coords)
        ta, tm = targets(batch, coords)
        return zp, ta, tm

    mb = a.max_batches or None
    ds = {split: ForestDatasetV2(
        bindings, split=split, patch_size=a.patch_size,
        split_block_size=tuple(a.split_block_size))
        for split in ("train", "val")}
    for split, d in ds.items():
        frozen.require_patches(d, split, a.patch_size, a.split_block_size)
    w, pre = fit_phase_probe(
        enc_t, enc_phase_fn, ds["train"], design=a.design,
        interaction_pca_k=a.interaction_pca_k,
        ridge_lambda=a.ridge_lambda, anchor_stride=a.anchor_stride,
        halo=a.halo, batch_size=a.batch_size, max_batches=mb,
        mask_fn=mask_fn, keep_groups=keep)
    for split in ("train", "val"):
        metrics = evaluate_phase_probe(
            enc_t, enc_phase_fn, ds[split], w, pre, fb, a.target_feature,
            anchor_stride=a.anchor_stride, halo=a.halo,
            batch_size=a.batch_size, max_batches=mb,
            mask_fn=mask_fn, keep_groups=keep)
        print(format_phase_probe_report(metrics, split))
    if a.output:
        Path(a.output).write_text(json.dumps(
            {"weights": w.tolist(), "preprocessor": pre.to_dict(),
             "target_feature": a.target_feature}))
        print(f"saved probe to {a.output}")


if __name__ == "__main__":
    main()


__all__ = ["DESIGN_CHOICES", "PhaseProbePreprocessor",
           "build_design_matrix", "design_dim", "fit_phase_probe",
           "evaluate_phase_probe", "inverse_normalization_fn",
           "iter_phase_blocks", "format_phase_probe_report", "main"]
