"""EVT-confusion diffusion metric + soft neighborhood loss.

Behavioral contract from /root/reference/frl/losses/evt_soft_neighborhood.py
(SURVEY.md §2.5):

- metric construction (host-side numpy/pandas, done once): LANDFIRE EVT
  confusion CSV -> drop summary rows/cols -> filter codes by regional pixel
  count (``min_count``) and confusion row samples (``min_confusion_samples``)
  -> symmetrize, optional Laplace smoothing, row-normalize to stochastic P
  (zero rows -> uniform) -> P^k diffusion -> optional binary threshold with
  re-normalization -> similarity S, distance d = 1 - S; inverse-frequency
  anchor weights = clip(median_freq / freq, max_weight);
- loss (jit-safe): per-anchor KL between softmax(-d_ref/tau) and
  softmax(-d_learned/tau) over OFF-DIAGONAL, DIFFERENT-code pairs only, rows
  weighted by inverse code frequency. Unknown-code anchors carry weight 0
  and all-masked rows (mask-based -- no dynamic filtering).
"""
from __future__ import annotations

import csv as _csv
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_SUMMARY_TOKENS = {"total", "sum", "all", "overall", "user", "producer",
                   "users", "producers", "accuracy", "commission",
                   "omission", ""}


def _load_confusion_csv(path: str | Path) -> Tuple[np.ndarray, list]:
    """Read a labeled square confusion CSV, dropping summary rows/cols."""
    with open(path, newline="") as f:
        rows = list(_csv.reader(f))
    header = rows[0][1:]

    def keep(lbl: str) -> bool:
        s = str(lbl).strip().lower()
        if s in _SUMMARY_TOKENS:
            return False
        try:
            int(float(s))
            return True
        except ValueError:
            return False

    col_ok = [i for i, h in enumerate(header) if keep(h)]
    codes_c = [int(float(header[i])) for i in col_ok]
    mat_rows, codes_r = [], []
    for r in rows[1:]:
        if not r or not keep(r[0]):
            continue
        codes_r.append(int(float(r[0])))
        mat_rows.append([float(r[1 + i] or 0) for i in col_ok])
    m = np.asarray(mat_rows, np.float64)
    # Align to common codes in row order.
    common = [c for c in codes_r if c in codes_c]
    ri = [codes_r.index(c) for c in common]
    ci = [codes_c.index(c) for c in common]
    return m[np.ix_(ri, ci)], common


class EvtDiffusionMetric:
    def __init__(self, confusion_csv: str | Path, code_counts: Dict,
                 min_count: int = 100, min_confusion_samples: int = 30,
                 diffusion_steps: int = 2, laplace_smoothing: float = 0.0,
                 binary_threshold: float = 0.0, max_weight: float = 10.0):
        conf, codes = _load_confusion_csv(confusion_csv)
        int_counts = {int(k): float(v) for k, v in code_counts.items()}
        keep = [i for i, c in enumerate(codes)
                if int_counts.get(c, 0.0) >= min_count]
        conf = conf[np.ix_(keep, keep)]
        codes = [codes[i] for i in keep]
        if min_confusion_samples > 0:
            rs = conf.sum(axis=1)
            keep2 = [i for i in range(len(codes))
                     if rs[i] >= min_confusion_samples]
            conf = conf[np.ix_(keep2, keep2)]
            codes = [codes[i] for i in keep2]
        if len(codes) < 2:
            raise ValueError(
                "fewer than 2 EVT codes survive filtering -- lower the "
                "thresholds or check the stats coverage")

        c_sym = (conf + conf.T) / 2.0
        if laplace_smoothing > 0.0:
            c_sym = c_sym + laplace_smoothing
        rs = c_sym.sum(axis=1, keepdims=True)
        uniform = np.full_like(c_sym, 1.0 / c_sym.shape[0])
        p = np.where(rs > 0, c_sym / np.where(rs > 0, rs, 1.0), uniform)
        pk = np.linalg.matrix_power(p, diffusion_steps)
        if binary_threshold > 0.0:
            pb = (pk > binary_threshold).astype(float)
            np.fill_diagonal(pb, 0.0)
            rsb = pb.sum(axis=1, keepdims=True)
            pk = np.where(rsb > 0, pb / np.where(rsb > 0, rsb, 1.0), uniform)

        self.similarity = pk.astype(np.float32)           # [K, K]
        self.codes = np.asarray(codes, np.int64)
        self.code_to_idx = {c: i for i, c in enumerate(codes)}

        counts = np.array([int_counts.get(c, 0.0) for c in codes])
        total = counts.sum()
        freqs = counts / total if total > 0 else \
            np.ones_like(counts) / len(counts)
        pos = freqs[freqs > 0]
        med = float(np.median(pos)) if pos.size else 1.0
        w = np.where(freqs > 0, med / np.maximum(freqs, 1e-12), 0.0)
        self.freq_weights = np.clip(w, 0.0, max_weight).astype(np.float32)

    @property
    def n_codes(self) -> int:
        return len(self.codes)

    def lookup(self, evt_codes: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Host-side: raw codes [N] -> (metric idx [N], valid [N], w [N])."""
        codes = np.asarray(evt_codes)
        idx = np.array([self.code_to_idx.get(int(c), 0) for c in codes],
                       np.int32)
        valid = np.array([int(c) in self.code_to_idx for c in codes], bool)
        w = np.where(valid, self.freq_weights[idx], 0.0).astype(np.float32)
        return idx, valid, w


def evt_soft_neighborhood_loss(
        embeddings: Array, metric_idx: Array, anchor_valid: Array,
        anchor_weights: Array, similarity: Array, evt_codes: Array,
        tau_ref: float = 0.5, tau_learned: float = 0.5,
        min_valid_anchors: int = 4) -> Tuple[Array, Dict[str, Array]]:
    """jit-safe KL loss.

    embeddings [N, D]; metric_idx/valid/weights from
    :meth:`EvtDiffusionMetric.lookup`; ``similarity`` the metric's [K, K]
    table; ``evt_codes`` raw codes (for the same-code exclusion).
    """
    from forest_tpu.losses.soft_neighborhood import pairwise_sq_distances

    n = embeddings.shape[0]
    # Pair->table hop as one-hot MXU matmuls, not an [N, N] 2-level int
    # gather (TPU lowers those to serial loops -- CLAUDE.md perf rule;
    # this sits inside the jitted FRL step when EVT is enabled).
    k_codes = similarity.shape[0]
    onehot = jax.nn.one_hot(metric_idx, k_codes, dtype=jnp.float32)  # [N,K]
    sim = onehot @ (similarity.astype(jnp.float32) @ onehot.T)       # [N,N]
    vv = anchor_valid[:, None] & anchor_valid[None, :]
    sim = jnp.where(vv, sim, 0.0)
    d_ref = 1.0 - sim

    d2 = pairwise_sq_distances(embeddings.astype(jnp.float32))
    d_learned = jnp.sqrt(d2 + 1e-12)

    same_code = evt_codes[:, None] == evt_codes[None, :]
    mask = vv & ~jnp.eye(n, dtype=bool) & ~same_code

    logits_ref = jnp.where(mask, -d_ref / tau_ref, -1e9)
    logits_lrn = jnp.where(mask, -d_learned / tau_learned, -1e9)
    row_active = jnp.sum(mask, axis=1) >= 2

    log_p = jax.nn.log_softmax(logits_ref, axis=1)
    log_q = jax.nn.log_softmax(logits_lrn, axis=1)
    p = jnp.exp(log_p)
    kl = jnp.sum(jnp.where(mask, p * (log_p - log_q), 0.0), axis=1)
    kl = jnp.where(row_active, kl, 0.0)

    rw = anchor_weights * row_active.astype(jnp.float32) \
        * anchor_valid.astype(jnp.float32)
    total_w = jnp.sum(rw)
    n_valid = jnp.sum(anchor_valid.astype(jnp.int32))
    enough = (n_valid >= min_valid_anchors) & (total_w > 0)
    loss = jnp.where(enough, jnp.sum(rw * kl) / jnp.maximum(total_w, 1e-12),
                     0.0)

    q = jnp.exp(log_q)
    act = row_active.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(act), 1.0)
    stats = {
        "n_anchors_in": jnp.int32(n),
        "n_anchors_valid": n_valid,
        "n_rows_active": jnp.sum(row_active.astype(jnp.int32)),
        "mean_kl": loss,
        "mean_entropy_ref": jnp.sum(
            -jnp.sum(jnp.where(mask, p * log_p, 0.0), axis=1) * act) / denom,
        "mean_entropy_learned": jnp.sum(
            -jnp.sum(jnp.where(mask, q * log_q, 0.0), axis=1) * act) / denom,
    }
    return loss, stats


__all__ = ["EvtDiffusionMetric", "evt_soft_neighborhood_loss"]
