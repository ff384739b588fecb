"""GMM clustering tools over embeddings.

Behavioral contracts (SURVEY.md §2.7):
- fit_gmm_clusters (/root/reference/frl/training/fit_gmm_clusters.py): GMM
  on reservoir-sampled z_type with BIC/AIC model selection over a component
  range;
- compare_gmm_evt (compare_gmm_evt.py): cluster x EVT contingency table,
  NMI and purity;
- fit_landscape_categories (fit_landscape_categories.py): hierarchical
  categories -- type clusters, then per-type phase clusters split into
  disturbed/recovered centroids.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
from sklearn.metrics import normalized_mutual_info_score
from sklearn.mixture import GaussianMixture

from forest_tpu.data.samplers import ReservoirSampler


def reservoir_sample_embeddings(batches, capacity: int = 100_000,
                                seed: int = 0) -> np.ndarray:
    """batches: iterable of ([N, D] array, valid [N]) -> [<=cap, D]."""
    rs = ReservoirSampler(capacity, seed=seed)
    for z, valid in batches:
        z = np.asarray(z)
        rs.add(z[np.asarray(valid, bool)])
    return rs.sample()


def fit_gmm_clusters(z: np.ndarray,
                     n_components_range: Sequence[int] = (4, 8, 16, 24, 32),
                     covariance_type: str = "diag", seed: int = 0
                     ) -> Dict:
    """Fit GMMs across a component range; select by BIC."""
    results = []
    best = None
    for k in n_components_range:
        gm = GaussianMixture(n_components=k,
                             covariance_type=covariance_type,
                             random_state=seed, max_iter=200)
        gm.fit(z)
        entry = {"k": k, "bic": float(gm.bic(z)), "aic": float(gm.aic(z)),
                 "model": gm}
        results.append(entry)
        if best is None or entry["bic"] < best["bic"]:
            best = entry
    return {"results": results, "best": best, "n_samples": len(z)}


def cluster_evt_contingency(labels: np.ndarray, evt: np.ndarray
                            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (table [n_clusters, n_codes], cluster ids, evt codes)."""
    cl = np.unique(labels)
    codes = np.unique(evt)
    table = np.zeros((len(cl), len(codes)), np.int64)
    ci = np.searchsorted(cl, labels)
    ei = np.searchsorted(codes, evt)
    np.add.at(table, (ci, ei), 1)
    return table, cl, codes


def compare_gmm_evt(labels: np.ndarray, evt: np.ndarray) -> Dict:
    """NMI + purity of GMM clusters against EVT codes."""
    valid = evt >= 0
    labels, evt = labels[valid], evt[valid]
    table, cl, codes = cluster_evt_contingency(labels, evt)
    purity = float(table.max(axis=1).sum() / max(table.sum(), 1))
    nmi = float(normalized_mutual_info_score(evt, labels))
    return {"nmi": nmi, "purity": purity, "contingency": table,
            "cluster_ids": cl, "evt_codes": codes}


def fit_landscape_categories(z_type: np.ndarray, z_phase: np.ndarray,
                             ysfc: np.ndarray, n_type_clusters: int = 8,
                             n_phase_clusters: int = 2,
                             disturbed_max: float = 5.0, seed: int = 0
                             ) -> Dict:
    """Hierarchical categories: GMM on z_type; within each type cluster,
    GMM on z_phase with disturbed (ysfc <= disturbed_max) vs recovered
    centroids (fit_landscape_categories.py contract).

    z_type [N, zt]; z_phase [N, zp] (a representative timestep per pixel);
    ysfc [N] the matching ysfc value.
    """
    gm_type = GaussianMixture(n_components=n_type_clusters,
                              covariance_type="diag", random_state=seed)
    type_labels = gm_type.fit_predict(z_type)

    per_type = {}
    for t in range(n_type_clusters):
        sel = type_labels == t
        entry = {"n": int(sel.sum())}
        if sel.sum() >= 2 * n_phase_clusters:
            gm_p = GaussianMixture(n_components=n_phase_clusters,
                                   covariance_type="diag",
                                   random_state=seed)
            pl = gm_p.fit_predict(z_phase[sel])
            entry["phase_labels"] = pl
            entry["phase_means"] = gm_p.means_
        dist = sel & np.asarray(ysfc <= disturbed_max)
        rec = sel & np.asarray(ysfc > disturbed_max)
        entry["disturbed_centroid"] = (z_phase[dist].mean(0)
                                       if dist.any() else None)
        entry["recovered_centroid"] = (z_phase[rec].mean(0)
                                       if rec.any() else None)
        per_type[t] = entry
    return {"type_model": gm_type, "type_labels": type_labels,
            "per_type": per_type}


__all__ = ["reservoir_sample_embeddings", "fit_gmm_clusters",
           "compare_gmm_evt", "cluster_evt_contingency",
           "fit_landscape_categories"]
