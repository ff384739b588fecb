"""Phase neighborhood: ysfc-aligned trajectory matching losses.

Behavioral contracts from /root/reference/frl/losses/phase_neighborhood.py
(SURVEY.md §2.5):

- shared-ysfc-value alignment between pixel pairs: for each ysfc value
  present at both pixels, select ONE representative timestep per pixel --
  the one in the longest recovery sequence (a sequence restarts at t=0 or
  whenever ysfc decreases), ties broken by most-recent timestep
  (phase_neighborhood.py:106-182);
- aligned self-similarity and cross-pixel distance matrices over the shared
  values (:183-261, vectorized :268-456);
- ``phase_neighborhood_loss``: self-similarity KL (embedding self-distances
  at i match spectral self-distances at j) + cross-pixel KL (:458-636);
- ``compute_phase_spread_ranking``: soft-margin ranking -- the more
  spectrally dynamic pixel of a pair must have larger phase-embedding spread
  (:637-740).

TPU-native: everything is static-shape. The distinct-value axis V is a
static ``num_classes`` bound; the aligned axis M equals T (a pixel has at
most T distinct ysfc values); invalid pairs keep all-False masks instead of
being filtered, which deactivates them inside the mask-based KL.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from forest_tpu.losses.soft_neighborhood import soft_neighborhood_matching_loss
from forest_tpu.ops.topk import topk_maybe_approx

Array = jax.Array


def seq_lengths_per_t(ysfc: Array) -> Array:
    """[N, T] -> [N, T]: length of the recovery sequence containing each
    timestep (new sequence at t=0 or when ysfc decreases)."""
    n, t = ysfc.shape
    y = ysfc.astype(jnp.float32)
    prev = jnp.concatenate([y[:, :1] + 1.0, y[:, :-1]], axis=1)
    seq_id = jnp.cumsum((y < prev).astype(jnp.int32), axis=1) - 1  # [N, T]
    onehot = jax.nn.one_hot(seq_id, t, dtype=jnp.float32)          # [N, T, S]
    lengths = jnp.sum(onehot, axis=1)                              # [N, S]
    return jnp.take_along_axis(lengths, seq_id, axis=1)            # [N, T]


def _presence_and_best_t(ysfc: Array, num_classes: int
                         ) -> Tuple[Array, Array]:
    """presence [N, V] bool; best_t [N, V] -- representative timestep per
    (pixel, ysfc value): longest sequence, tie-break most recent."""
    n, t = ysfc.shape
    y = jnp.clip(ysfc.astype(jnp.int32), 0, num_classes - 1)
    ok = (ysfc >= 0) & (ysfc < num_classes)
    ind = jax.nn.one_hot(y, num_classes, dtype=jnp.float32, axis=1)  # [N,V,T]
    ind = ind * ok[:, None, :].astype(jnp.float32)
    presence = jnp.sum(ind, axis=2) > 0                              # [N, V]

    sl = seq_lengths_per_t(ysfc)                                     # [N, T]
    score = sl * (t + 1) + jnp.arange(t, dtype=jnp.float32)[None, :]
    masked = jnp.where(ind > 0, score[:, None, :], -jnp.inf)
    best_t = jnp.argmax(masked, axis=2)                              # [N, V]
    return presence, best_t


def build_phase_neighborhood_batch(
        spectral_features: Array, phase_embeddings: Array, ysfc: Array,
        pair_indices: Array, pair_valid: Optional[Array] = None,
        min_overlap: int = 3, num_classes: int = 64) -> Dict[str, Array]:
    """Vectorized aligned-distance construction, all shapes static.

    spectral_features [N, T, C]; phase_embeddings [N, T, D]; ysfc [N, T];
    pair_indices [B, 2]. Returns dict with d_* [B, M, M] (M = T), masks,
    and ``valid_pair_mask`` [B].
    """
    n, t, _ = spectral_features.shape
    b = pair_indices.shape[0]
    m = t

    presence, best_t = _presence_and_best_t(ysfc, num_classes)
    n_idx = jnp.arange(n)[:, None]

    # Per-pixel COMPRESSED tables: a pixel has at most T distinct ysfc
    # values, so gather the V-wide (num_classes) best_t selection down to
    # [N, M] once. All later per-pair gathers then run M-wide instead of
    # V-wide -- the V-wide [B, V, C] gathers and their [N, V, D] backward
    # scatters were ~12 ms/step of the FRL step on v5e.
    varange = jnp.arange(num_classes, dtype=jnp.float32)
    score_px = jnp.where(presence, -varange[None, :], -jnp.inf)
    _, vals_px = jax.lax.top_k(score_px, m)          # [N, M] ascending v
    best_t_c = best_t[n_idx, vals_px]                # [N, M]
    sel_spec = spectral_features[n_idx, best_t_c]    # [N, M, C]
    sel_phase = phase_embeddings[n_idx, best_t_c]    # [N, M, D]
    # Position of value v inside its pixel's compressed (ascending-v) list.
    pos_px = jnp.cumsum(presence.astype(jnp.int32), axis=1) - 1   # [N, V]

    idx_i = pair_indices[:, 0]
    idx_j = pair_indices[:, 1]
    shared = presence[idx_i] & presence[idx_j]       # [B, V]
    k_per_pair = jnp.sum(shared, axis=1)             # [B]
    valid_pair = k_per_pair >= min_overlap
    if pair_valid is not None:
        valid_pair = valid_pair & pair_valid.astype(bool)

    # Shared values in ascending-v order (the same alignment as the
    # cumsum-position mapping): slot s holds the s-th smallest shared v.
    score_sh = jnp.where(shared, -varange[None, :], -jnp.inf)
    _, inv_v = jax.lax.top_k(score_sh, m)            # [B, M]
    slot_ok = (jnp.arange(m)[None, :]
               < k_per_pair[:, None])                # [B, M]
    pos_i = pos_px[idx_i[:, None], inv_v]            # [B, M]
    pos_j = pos_px[idx_j[:, None], inv_v]

    def align(sel, idx, pos):
        g = sel[idx[:, None], jnp.clip(pos, 0, m - 1)]   # [B, M, C]
        return jnp.where(slot_ok[..., None], g, 0.0)

    ai_spec = align(sel_spec, idx_i, pos_i)
    aj_spec = align(sel_spec, idx_j, pos_j)
    ai_phase = align(sel_phase, idx_i, pos_i)
    aj_phase = align(sel_phase, idx_j, pos_j)

    def cdist(a, bb):
        d2 = (jnp.sum(a * a, -1)[:, :, None] - 2.0 *
              jnp.einsum("bmc,bnc->bmn", a, bb)
              + jnp.sum(bb * bb, -1)[:, None, :])
        return jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12)

    valid_pos = (jnp.arange(m)[None, :] < k_per_pair[:, None])  # [B, M]
    mask_cross = (valid_pos[:, :, None] & valid_pos[:, None, :]
                  & valid_pair[:, None, None])
    diag = jnp.eye(m, dtype=bool)[None]
    mask_self = mask_cross & ~diag

    return {
        "d_ref_self": cdist(aj_spec, aj_spec),
        "d_learned_self": cdist(ai_phase, ai_phase),
        "d_learned_self_j": cdist(aj_phase, aj_phase),
        "mask_self": mask_self,
        "d_ref_cross": cdist(ai_spec, aj_spec),
        "d_learned_cross": cdist(ai_phase, aj_phase),
        "mask_cross": mask_cross,
        "valid_pair_mask": valid_pair,
        "M": m,
    }


def build_phase_neighborhood_batch_grouped(
        spectral_features: Array, phase_embeddings: Array, ysfc: Array,
        pairs: Array, pair_valid: Optional[Array] = None,
        min_overlap: int = 3, num_classes: int = 64,
        layout: str = "bmn") -> Dict[str, Array]:
    """Sample-grouped variant of :func:`build_phase_neighborhood_batch`.

    Identical math, TPU-friendly data movement: the flat builder's
    pair->anchor gathers backprop as scatter-adds into the shared
    [N, M, D] phase table (measured ~26 ms/step of the production FRL step
    -- TPU scatters serialize on duplicate indices), plus ~14 ms of
    serialized int gathers. Here the pair->anchor hop is a per-sample
    one-hot einsum (backward = another matmul, on the MXU) and only the
    uncontended per-pair slot selection stays a take_along_axis.

    spectral_features [S, A, T, C]; phase_embeddings [S, A, T, D];
    ysfc [S, A, T]; pairs [S, P, 2] (anchor indices LOCAL to each sample).
    Returns the same dict as the flat builder with leading dim S*P.
    """
    s, a, t, c_dim = spectral_features.shape
    d_dim = phase_embeddings.shape[-1]
    p = pairs.shape[1]
    m = t
    hp = jax.lax.Precision.HIGHEST

    # Per-pixel compressed tables, computed flat (cheap, uncontended).
    ysfc_f = ysfc.reshape(s * a, t)
    presence, best_t = _presence_and_best_t(ysfc_f, num_classes)
    n_idx = jnp.arange(s * a)[:, None]
    varange = jnp.arange(num_classes, dtype=jnp.float32)
    score_px = jnp.where(presence, -varange[None, :], -jnp.inf)
    _, vals_px = jax.lax.top_k(score_px, m)                    # [N, M]
    best_t_c = best_t[n_idx, vals_px]                          # [N, M]
    sel_spec = jnp.take_along_axis(
        spectral_features.reshape(s * a, t, c_dim),
        best_t_c[:, :, None], axis=1)                          # [N, M, C]
    sel_phase = jnp.take_along_axis(
        phase_embeddings.reshape(s * a, t, d_dim),
        best_t_c[:, :, None], axis=1)                          # [N, M, D]

    presence_g = presence.reshape(s, a, num_classes)
    n_present = jnp.sum(presence_g.astype(jnp.float32), axis=-1)  # [S, A]
    vals_g = vals_px.reshape(s, a, m).astype(jnp.float32)
    sel_cat = jnp.concatenate([sel_spec, sel_phase],
                              axis=-1).reshape(s, a, m, c_dim + d_dim)

    # pair -> anchor hop as one-hot einsums (backward = matmuls on the
    # MXU). Values crossing f32 matmuls are one-hot-selected features
    # (HIGHEST precision keeps them f32-exact) or small integers (exact in
    # any precision: ysfc classes < 64, slot counts <= M).
    oh_i = jax.nn.one_hot(pairs[..., 0], a, dtype=jnp.float32)  # [S, P, A]
    oh_j = jax.nn.one_hot(pairs[..., 1], a, dtype=jnp.float32)

    pres_i = jnp.einsum("spa,sav->spv", oh_i,
                        presence_g.astype(jnp.float32)) > 0.5
    pres_j = jnp.einsum("spa,sav->spv", oh_j,
                        presence_g.astype(jnp.float32)) > 0.5
    shared = pres_i & pres_j                                    # [S, P, V]
    k_per_pair = jnp.sum(shared, axis=-1)                       # [S, P]
    valid_pair = k_per_pair >= min_overlap
    if pair_valid is not None:
        valid_pair = valid_pair & pair_valid.astype(bool)

    score_sh = jnp.where(shared, -varange[None, None, :], -jnp.inf)
    _, inv_v = jax.lax.top_k(score_sh, m)                       # [S, P, M]
    slot_ok = jnp.arange(m)[None, None, :] < k_per_pair[..., None]

    # Slot permutation WITHOUT gathers: pair-slot m holds shared value
    # inv_v[m]; pixel-slot n holds value vals[n]; the permutation matrix is
    # the value-equality compare (valid pixel slots only), applied as one
    # more einsum. take_along_axis here backprops as ~50 ms/step of
    # serialized scatters -- measured, hence the matmul form.
    inv_v_f = inv_v.astype(jnp.float32)

    def align(oh):
        vals = jnp.einsum("spa,sam->spm", oh, vals_g)           # [S, P, M]
        nval = jnp.einsum("spa,sa->sp", oh, n_present)          # [S, P]
        perm = ((inv_v_f[..., :, None] == vals[..., None, :])
                & (jnp.arange(m)[None, None, None, :]
                   < nval[..., None, None])
                & slot_ok[..., :, None]).astype(jnp.float32)    # [S,P,M,N]
        row = jnp.einsum("spa,samc->spmc", oh, sel_cat,
                         precision=hp)                          # [S,P,N,C+D]
        return jnp.einsum("spmn,spnc->spmc", perm, row, precision=hp)

    if layout == "mnsp":
        # Pair axis MINOR from birth: every einsum is ordered so the big
        # P axis lands in rhs-free position (dot_general emits batch,
        # lhs-free, rhs-free -- no transpose), and the slot permutation
        # contracts as a fused broadcast-reduce on the VPU instead of
        # 32400 batched 15x15 matmuls. The mnb path's [S, P, M, C]
        # intermediates pad BOTH tiny minor dims ((15, 11) -> (16, 128),
        # ~8x physical, ~5 ms/step of copy/fusion traffic in the v5e
        # profile); [S, M, C, P] keeps P packed in lanes.
        inv_v_t = jnp.transpose(inv_v_f, (0, 2, 1))         # [S, M, P]
        slot_ok_t = jnp.transpose(slot_ok, (0, 2, 1))       # [S, M, P]
        n_iota = jnp.arange(m)[None, None, :, None]

        def align_t(oh):
            vals_t = jnp.einsum("sam,spa->smp", vals_g, oh)  # [S, N, P]
            nval_t = jnp.einsum("sa,spa->sp", n_present, oh)  # [S, P]
            row_t = jnp.einsum("samc,spa->smcp", sel_cat, oh,
                               precision=hp)                # [S, N, C, P]
            perm = ((inv_v_t[:, :, None, :] == vals_t[:, None, :, :])
                    & (n_iota < nval_t[:, None, None, :])
                    & slot_ok_t[:, :, None, :]).astype(jnp.float32)
            # out[s,m,c,p] = sum_n perm[s,m,n,p] * row[s,n,c,p]: fused
            # multiply-reduce keeps f32 exactly (no MXU truncation).
            return jnp.sum(perm[:, :, :, None, :]
                           * row_t[:, None, :, :, :], axis=2)

        gi_t = align_t(oh_i)                                # [S, M, C, P]
        gj_t = align_t(oh_j)
        ai_spec = gi_t[:, :, :c_dim]
        ai_phase = gi_t[:, :, c_dim:]
        aj_spec = gj_t[:, :, :c_dim]
        aj_phase = gj_t[:, :, c_dim:]

        def cdist(x, y):                              # [S, M, C, P] x2
            d2 = jnp.sum((x[:, :, None] - y[:, None]) ** 2, axis=3)
            return jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12)  # [S,M,N,P]

        valid_pos = (jnp.arange(m)[None, :, None]
                     < k_per_pair[:, None, :])              # [S, M, P]
        mask_cross = (valid_pos[:, :, None, :] & valid_pos[:, None, :, :]
                      & valid_pair[:, None, None, :])
        mask_self = mask_cross & ~jnp.eye(m, dtype=bool)[None, :, :, None]
        return {
            "d_ref_self": cdist(aj_spec, aj_spec),
            "d_learned_self": cdist(ai_phase, ai_phase),
            "d_learned_self_j": cdist(aj_phase, aj_phase),
            "mask_self": mask_self,
            "d_ref_cross": cdist(ai_spec, aj_spec),
            "d_learned_cross": cdist(ai_phase, aj_phase),
            "mask_cross": mask_cross,
            "valid_pair_mask": valid_pair,              # [S, P]
            "M": m,
            "layout": layout,
        }

    gi = align(oh_i)
    gj = align(oh_j)
    bsz = s * p
    valid_pair = valid_pair.reshape(bsz)
    k_flat = k_per_pair.reshape(bsz)

    if layout == "mnb":
        # Pair axis MINOR: [M, C, B] features, [M, M, B] distance tensors.
        # Keeps the big axis in TPU lanes -- the [B, 15, 15] form pads its
        # 15-wide minor axis to 128 lanes (8.5x physical blowup, measured
        # ~12 ms/step of padded elementwise/softmax traffic). Distances via
        # fused broadcast square-diff (a batched 15x15 matmul would force
        # the padded layout right back).
        gi_t = jnp.transpose(gi, (2, 3, 0, 1)).reshape(m, c_dim + d_dim,
                                                       bsz)
        gj_t = jnp.transpose(gj, (2, 3, 0, 1)).reshape(m, c_dim + d_dim,
                                                       bsz)
        ai_spec = gi_t[:, :c_dim]
        ai_phase = gi_t[:, c_dim:]
        aj_spec = gj_t[:, :c_dim]
        aj_phase = gj_t[:, c_dim:]

        def cdist(x, y):                                 # [M, C, B] x2
            d2 = jnp.sum((x[:, None] - y[None, :]) ** 2, axis=2)
            return jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12)  # [M, M, B]

        valid_pos = (jnp.arange(m)[:, None]
                     < k_flat[None, :])                  # [M, B]
        mask_cross = (valid_pos[:, None, :] & valid_pos[None, :, :]
                      & valid_pair[None, None, :])
        mask_self = mask_cross & ~jnp.eye(m, dtype=bool)[:, :, None]
    elif layout == "bmn":
        ai_spec = gi[..., :c_dim].reshape(bsz, m, c_dim)
        ai_phase = gi[..., c_dim:].reshape(bsz, m, d_dim)
        aj_spec = gj[..., :c_dim].reshape(bsz, m, c_dim)
        aj_phase = gj[..., c_dim:].reshape(bsz, m, d_dim)

        def cdist(x, y):
            d2 = (jnp.sum(x * x, -1)[:, :, None] - 2.0 *
                  jnp.einsum("bmc,bnc->bmn", x, y)
                  + jnp.sum(y * y, -1)[:, None, :])
            return jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12)

        valid_pos = jnp.arange(m)[None, :] < k_flat[:, None]    # [B, M]
        mask_cross = (valid_pos[:, :, None] & valid_pos[:, None, :]
                      & valid_pair[:, None, None])
        mask_self = mask_cross & ~jnp.eye(m, dtype=bool)[None]
    else:
        raise ValueError(f"unknown layout {layout!r}")

    return {
        "d_ref_self": cdist(aj_spec, aj_spec),
        "d_learned_self": cdist(ai_phase, ai_phase),
        "d_learned_self_j": cdist(aj_phase, aj_phase),
        "mask_self": mask_self,
        "d_ref_cross": cdist(ai_spec, aj_spec),
        "d_learned_cross": cdist(ai_phase, aj_phase),
        "mask_cross": mask_cross,
        "valid_pair_mask": valid_pair,
        "M": m,
        "layout": layout,
    }


def phase_neighborhood_loss(
        spectral_features: Array, phase_embeddings: Array, ysfc: Array,
        pair_indices: Array, pair_weights: Optional[Array] = None,
        pair_valid: Optional[Array] = None,
        tau_ref: float = 0.1, tau_learned: float = 0.1,
        min_overlap: int = 3, min_valid_per_row: int = 2,
        self_similarity_weight: float = 1.0,
        cross_pixel_weight: float = 1.0,
        num_classes: int = 64,
        _batch: Optional[Dict[str, Array]] = None
        ) -> Tuple[Array, Dict[str, Array]]:
    """Self-similarity + cross-pixel KL (phase_neighborhood.py:458-636)."""
    batch = _batch if _batch is not None else build_phase_neighborhood_batch(
        spectral_features, phase_embeddings, ysfc, pair_indices,
        pair_valid, min_overlap, num_classes)

    b = pair_indices.shape[0]
    w = pair_weights if pair_weights is not None else jnp.ones((b,))
    w = (w.reshape(batch["valid_pair_mask"].shape)
         * batch["valid_pair_mask"].astype(w.dtype))
    layout = batch.get("layout", "bmn")

    loss_self, stats_self = soft_neighborhood_matching_loss(
        batch["d_ref_self"], batch["d_learned_self"], batch["mask_self"],
        tau_ref, tau_learned, w, min_valid_per_row, layout=layout)
    loss_cross, stats_cross = soft_neighborhood_matching_loss(
        batch["d_ref_cross"], batch["d_learned_cross"], batch["mask_cross"],
        tau_ref, tau_learned, w, min_valid_per_row, layout=layout)

    loss = (self_similarity_weight * loss_self
            + cross_pixel_weight * loss_cross)
    stats = {
        "n_pairs_input": jnp.int32(b),
        "n_pairs_sufficient_overlap":
            jnp.sum(batch["valid_pair_mask"].astype(jnp.int32)),
        "loss_self": loss_self,
        "loss_cross": loss_cross,
    }
    stats.update({f"self_{k}": v for k, v in stats_self.items()})
    stats.update({f"cross_{k}": v for k, v in stats_cross.items()})
    return loss, stats


def compute_phase_spread_ranking(
        batch: Dict[str, Array], pair_indices: Array, dynamism_ref: Array,
        margin: float = 0.1, delta: float = 0.5
        ) -> Tuple[Array, Dict[str, Array]]:
    """Dynamism-ranked trajectory-spread soft-margin loss
    (phase_neighborhood.py:637-740). Uses all pairs with the valid mask."""
    d_i = batch["d_learned_self"]
    d_j = batch["d_learned_self_j"]
    mask = batch["mask_self"]
    vp = batch["valid_pair_mask"]
    idx_i, idx_j = pair_indices[:, 0], pair_indices[:, 1]
    layout = batch.get("layout", "bmn")
    mm_axes = (0, 1) if layout == "mnb" else (1, 2)

    mf = mask.astype(d_i.dtype)
    n_valid = jnp.maximum(jnp.sum(mf, axis=mm_axes), 1.0)
    spread_i = jnp.sum(d_i * mf, axis=mm_axes) / n_valid
    spread_j = jnp.sum(d_j * mf, axis=mm_axes) / n_valid

    # mnsp spreads/vp are [S, P]; flat pair_indices reshape to match
    ref_diff = (dynamism_ref[idx_i]
                - dynamism_ref[idx_j]).reshape(vp.shape)
    act = vp.astype(d_i.dtype)
    i_more = (ref_diff > delta).astype(d_i.dtype) * act
    j_more = (ref_diff < -delta).astype(d_i.dtype) * act

    loss_i = jax.nn.softplus(spread_j - spread_i + margin) * i_more
    loss_j = jax.nn.softplus(spread_i - spread_j + margin) * j_more
    n_con = jnp.maximum(jnp.sum(i_more) + jnp.sum(j_more), 1.0)
    # Reference normalization (phase_neighborhood.py:722): mean over ALL
    # valid pairs, not over the constrained subset -- unconstrained pairs
    # contribute zeros, so the effective weight does not inflate when few
    # pairs clear the dynamism delta.
    n_valid_pairs = jnp.maximum(jnp.sum(act), 1.0)
    loss = (jnp.sum(loss_i) + jnp.sum(loss_j)) / n_valid_pairs

    satisfied = (i_more * (spread_i > spread_j + margin)
                 + j_more * (spread_j > spread_i + margin))
    stats = {
        "n_pairs": jnp.sum(vp.astype(jnp.int32)),
        "n_constrained_i": jnp.sum(i_more).astype(jnp.int32),
        "n_constrained_j": jnp.sum(j_more).astype(jnp.int32),
        "frac_satisfied": jnp.sum(satisfied) / n_con,
        "mean_spread_i": jnp.sum(spread_i * act)
        / jnp.maximum(jnp.sum(act), 1.0),
        "mean_spread_j": jnp.sum(spread_j * act)
        / jnp.maximum(jnp.sum(act), 1.0),
        "mean_ref_diff": jnp.sum(jnp.abs(ref_diff) * act)
        / jnp.maximum(jnp.sum(act), 1.0),
    }
    return loss, stats


def type_local_spectral_demean(z_type: Array, spec: Array, valid: Array,
                               pca_dim: int, knn_k: int
                               ) -> Tuple[Array, Array]:
    """Demean pooled spectral features by a type-local baseline.

    Contract: /root/reference/frl/training/representation/step.py:907-932 --
    rank-``pca_dim`` PCA on (stop-gradient) pooled z_type, kNN in the
    whitened reduced space, neighbor-mean of the time-pooled spectral
    feature subtracted from every timestep (``spec_demeaned``) before the
    cross-batch phase neighborhood / spread losses.

    The reference uses ``torch.pca_lowrank(Z_c, q=K, center=False)`` and
    keeps U (whitened scores). The Gram similarity ``U @ U.T`` is invariant
    to any right-orthogonal transform of U, so an exact top-K eigenbasis of
    ``Z_c.T @ Z_c`` with scores divided by the singular values reproduces
    the same neighbor ranking.

    TPU-native divergence: the reference concatenates only valid anchors
    (dynamic N); here N is static and ``valid`` masks rows -- invalid rows
    contribute nothing to the mean/covariance, are never selected as
    neighbors, and their own baseline is meaningless (their loss terms are
    masked downstream).

    Rank-deficiency divergence (documented): when rank(z_type) < pca_dim
    (collapsed early-training representations), torch.pca_lowrank's
    randomized SVD returns arbitrary unit-norm directions for the null
    space, so the reference's neighbor ranking there is noise seeded by
    its RNG. Here the eigenvalue floor (1e-12) shrinks null-direction
    scores to ~0 instead, so neighbors are determined by the true-rank
    subspace only -- deterministic, and at least as meaningful as the
    reference's random directions, but the two rankings can differ until
    z_type reaches full rank.

    z_type: [N, D] (already stop-gradient), spec: [N, T, C], valid: [N].
    Returns (spec_demeaned [N, T, C], baseline [N, C]).
    """
    n, d = z_type.shape
    v = valid.astype(jnp.float32)[:, None]
    cnt = jnp.maximum(jnp.sum(v), 1.0)
    mu = jnp.sum(z_type * v, axis=0, keepdims=True) / cnt
    zc = (z_type - mu) * v                                   # [N, D]
    gram = jnp.dot(zc.T, zc, precision="highest")            # [D, D]
    evals, evecs = jnp.linalg.eigh(gram)                     # ascending
    k = min(pca_dim, d)
    lam = jnp.sqrt(jnp.clip(evals[d - k:], 1e-12, None))     # singular values
    u = jnp.dot(zc, evecs[:, d - k:], precision="highest") / lam[None, :]
    sim = jnp.dot(u, u.T, precision="highest")               # [N, N]
    neg = jnp.float32(-1e30)
    sim = jnp.where(jnp.eye(n, dtype=bool), neg, sim)
    sim = jnp.where(valid[None, :], sim, neg)  # never pick invalid neighbors
    kk = min(knn_k, n - 1)
    # A >=95%-recall neighbor set is indistinguishable for a demeaning
    # baseline (the reference's own ranking is RNG-seeded noise in
    # rank-deficient regimes anyway -- see the divergence note above);
    # exact_below=1024 keeps oracle tests / debug runs on the exact path.
    _, idx = topk_maybe_approx(sim, kk, exact_below=1024)    # [N, kk]
    s_mean = jnp.mean(spec, axis=1)                          # [N, C]
    nb_v = valid[idx].astype(jnp.float32)                    # [N, kk]
    denom = jnp.maximum(jnp.sum(nb_v, axis=1, keepdims=True), 1.0)
    s_hat = jnp.sum(s_mean[idx] * nb_v[..., None], axis=1) / denom
    return spec - s_hat[:, None, :], s_hat


__all__ = ["build_phase_neighborhood_batch",
           "build_phase_neighborhood_batch_grouped",
           "phase_neighborhood_loss", "compute_phase_spread_ranking",
           "seq_lengths_per_t", "type_local_spectral_demean"]
