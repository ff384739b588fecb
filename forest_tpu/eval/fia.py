"""FIA small-area estimation utilities: post-stratification + kNN models.

The reference's downstream science lives in R notebooks
(/root/reference/frl/analysis/*.Rmd -- FIA post-stratification variance,
kNN imputation models, embedding-derived strata; SURVEY.md §2.7 L7). This
module provides the same estimators in Python so the full workflow runs
inside forest-tpu:

- ``post_stratified_estimate``: the standard FIA post-stratified mean and
  variance estimator (Cochran 1977 / Bechtold & Patterson 2005):
      ybar_ps = sum_h W_h * ybar_h
      var     = (1/n) sum_h W_h s_h^2 + (1/n^2) sum_h (1 - W_h) s_h^2
  where W_h are population stratum weights (e.g. pixel-count shares of
  embedding-derived strata) and (ybar_h, s_h^2, n_h) come from plot data;
- ``embedding_strata``: derive strata labels for plots + population from a
  fitted cluster model (GMM over z_type, eval/gmm.py);
- ``knn_impute``: k-nearest-neighbor imputation of a plot attribute over
  embedding space (the kNN models notebook).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def post_stratified_estimate(y: np.ndarray, strata: np.ndarray,
                             stratum_weights: Dict[int, float]
                             ) -> Dict[str, float]:
    """Post-stratified mean/variance of plot attribute ``y``.

    y [n]: plot responses; strata [n]: stratum label per plot;
    stratum_weights: population share W_h per label (sums to ~1). Strata
    with < 2 plots contribute their mean but zero variance (flagged in the
    output); labels missing from the plot sample are dropped with their
    weight renormalized.
    """
    y = np.asarray(y, np.float64)
    strata = np.asarray(strata)
    n = len(y)
    labels = [h for h in stratum_weights if (strata == h).any()]
    w_total = sum(stratum_weights[h] for h in labels)
    if not labels or w_total <= 0:
        raise ValueError("no plot data in any weighted stratum")

    mean = 0.0
    v1 = 0.0
    v2 = 0.0
    small = []
    per_stratum = {}
    for h in labels:
        sel = strata == h
        n_h = int(sel.sum())
        w_h = stratum_weights[h] / w_total
        ybar_h = float(y[sel].mean())
        s2_h = float(y[sel].var(ddof=1)) if n_h > 1 else 0.0
        if n_h < 2:
            small.append(int(h))
        mean += w_h * ybar_h
        v1 += w_h * s2_h
        v2 += (1.0 - w_h) * s2_h
        per_stratum[int(h)] = {"n": n_h, "W": w_h, "mean": ybar_h,
                               "s2": s2_h}
    variance = v1 / n + v2 / (n * n)
    return {"mean": mean, "variance": variance,
            "se": float(np.sqrt(variance)), "n_plots": n,
            "n_strata": len(labels), "small_strata": small,
            "per_stratum": per_stratum}


def simple_random_estimate(y: np.ndarray) -> Dict[str, float]:
    """Unstratified baseline (for relative-efficiency comparisons)."""
    y = np.asarray(y, np.float64)
    n = len(y)
    var = float(y.var(ddof=1)) / n if n > 1 else 0.0
    return {"mean": float(y.mean()), "variance": var,
            "se": float(np.sqrt(var)), "n_plots": n}


def relative_efficiency(y: np.ndarray, strata: np.ndarray,
                        stratum_weights: Dict[int, float]) -> float:
    """Var(SRS) / Var(post-stratified): > 1 means the strata help."""
    ps = post_stratified_estimate(y, strata, stratum_weights)
    srs = simple_random_estimate(y)
    return srs["variance"] / max(ps["variance"], 1e-30)


def embedding_strata(cluster_model, z_plots: np.ndarray,
                     z_population: Optional[np.ndarray] = None,
                     population_counts: Optional[np.ndarray] = None
                     ) -> Tuple[np.ndarray, Dict[int, float]]:
    """Strata labels for plots + population weights from a cluster model.

    cluster_model: fitted sklearn-style model with ``predict`` (e.g. the
    GMM from eval/gmm.fit_gmm_clusters). Population weights come from
    labeling ``z_population`` (a large pixel sample) or directly from
    ``population_counts`` per label.
    """
    plot_labels = np.asarray(cluster_model.predict(z_plots))
    if population_counts is not None:
        counts = np.asarray(population_counts, np.float64)
        weights = {int(i): float(c / counts.sum())
                   for i, c in enumerate(counts)}
    elif z_population is not None:
        pop = np.asarray(cluster_model.predict(z_population))
        labels, counts = np.unique(pop, return_counts=True)
        weights = {int(l): float(c / counts.sum())
                   for l, c in zip(labels, counts)}
    else:
        raise ValueError("need z_population or population_counts")
    return plot_labels, weights


def knn_impute(z_train: np.ndarray, y_train: np.ndarray,
               z_query: np.ndarray, k: int = 7,
               weighted: bool = True) -> np.ndarray:
    """kNN imputation of plot attributes over embedding space
    (the kNN-models notebook contract). Distance-weighted mean of the k
    nearest training plots per query point."""
    from sklearn.neighbors import KNeighborsRegressor

    reg = KNeighborsRegressor(
        n_neighbors=min(k, len(z_train)),
        weights="distance" if weighted else "uniform")
    reg.fit(np.asarray(z_train), np.asarray(y_train))
    return reg.predict(np.asarray(z_query))


__all__ = ["post_stratified_estimate", "simple_random_estimate",
           "relative_efficiency", "embedding_strata", "knn_impute"]
