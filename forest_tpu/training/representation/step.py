"""process_batch: the whole FRL per-batch algorithm as ONE jitted function.

Behavioral contract from /root/reference/frl/training/representation/step.py
(call stack SURVEY.md §4.1). The reference splits the work into CPU worker
passes + a chunked GPU forward + per-sample Python loops; TPU-native, the
entire algorithm -- feature building (with fused whitening), both encoder
pathways, anchor sampling, pair construction, and every loss -- is a single
XLA graph over the batch with static shapes (anchors per patch fixed by the
grid+supplement strategy, pair lists padded+masked):

  1. type features -> z_type (+ smoothing gate) for the full batch;
  2. per-sample jittered-grid+supplement anchors (explicit jax.random);
  3. spatial InfoNCE: offset-grid kNN positives (spectral-similarity
     weighted exp(-d/sigma)) + distance-ring negatives, one global
     segment-op InfoNCE over B*A anchors (step.py:284-402, 560-574);
  4. VICReg on z_type anchors (:549-557);
  5. phase: ysfc + whitened temporal features at anchors ->
     forward_phase_at_locations with stop-grad z_type -> phase VICReg,
     build_phase_pairs -> phase_neighborhood_loss, spread ranking,
     recovery discrimination, Frobenius type-leakage (:412-451, 582-649,
     935-1027);
  6. cross-batch spectral: chunked mutual-kNN positives over pooled anchors
     + random cross-patch negatives weighted 1 - exp(-d/sigma) -> global
     InfoNCE (:707-812);
  7. optional EVT soft-neighborhood on z_type anchors (:529-547);
  8. weighted total; loss weights and curriculum scalars arrive as traced
     args so annealing never recompiles.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from forest_tpu.data.anchor_sampling import AnchorSampler
from forest_tpu.data.feature_builder import FeatureBuilder
from forest_tpu.training.representation import diagnostics as dg
from forest_tpu.losses import pairs as pairs_mod
from forest_tpu.losses.contrastive import contrastive_loss_grouped
from forest_tpu.losses.evt_soft_neighborhood import evt_soft_neighborhood_loss
from forest_tpu.losses.phase_neighborhood import (
    build_phase_neighborhood_batch_grouped, compute_phase_spread_ranking,
    phase_neighborhood_loss, type_local_spectral_demean)
from forest_tpu.losses.phase_pairs import build_phase_pairs
from forest_tpu.losses.triplet_phase import phase_recovery_discrimination_loss
from forest_tpu.losses.variance_covariance import variance_covariance_loss
from forest_tpu.ops.scatter import extract_at_coords
from forest_tpu.utils import spatial as sp

Array = jax.Array


@dataclass(frozen=True)
class StepConfig:
    """Static (trace-time) configuration -- the config_builders output."""
    # feature names (bindings)
    type_feature: str = "type_encoder_input"
    spectral_feature: str = "infonce_type_spectral"
    phase_feature: str = "phase_ccdc"
    # ysfc comes from the RAW group channel (NaN preserved -- ysfc==0 means
    # "disturbance year", so the feature builder's masked-to-zero would
    # corrupt it): a "group.channel" reference.
    ysfc_source: str = "annual.ysfc"
    # spatial InfoNCE
    knn_k: int = 4
    knn_max_radius: int = 8
    neg_min_distance: float = 16.0
    neg_max_distance: Optional[float] = None
    neg_per_anchor: int = 4
    spectral_sigma: float = 2.0
    min_pair_weight: float = 0.05
    # 0.07: the reference's default when a config omits it
    temperature: float = 0.07
    similarity: str = "l2"
    # VICReg
    vcr_std_target: float = 1.0
    vcr_variance_weight: float = 1.0
    vcr_covariance_weight: float = 1.0
    # phase
    phase_k: int = 16
    phase_min_overlap: int = 3
    phase_min_pairs: int = 5
    phase_sigma: float = 5.0
    phase_tau_ref: float = 0.1
    phase_tau_learned: float = 0.1
    phase_self_weight: float = 1.0
    phase_cross_weight: float = 1.0
    num_ysfc_classes: int = 64
    # spread ranking / recovery discrimination
    spread_margin: float = 0.1
    spread_delta: float = 0.5
    # dynamism source for the spread ranking: a static feature averaged
    # over channels (the reference's phase_dynamism_supervision,
    # step.py:973-974); None falls back to mean temporal std of the
    # phase features (documented divergence for bindings without one).
    dynamism_feature: Optional[str] = None
    rd_margin: float = 0.5
    rd_low_ysfc_max: float = 1.0
    rd_high_ysfc_min: float = 5.0
    # cross-batch spectral
    xb_knn_k: int = 10
    xb_chunk_size: int = 128
    xb_pos_min_spatial: float = 4.0
    xb_neg_per_anchor: int = 4
    # negative weighting 1-exp(-d/tau) floored at min_weight -- the
    # reference's DEDICATED spectral knobs (step.py:747-748, defaults
    # spectral_neg_tau=1.0 / spectral_neg_min_weight=0.05), distinct from
    # the SPATIAL loss's spectral_weighting tau/min_weight
    xb_neg_tau: float = 1.0
    xb_neg_min_weight: float = 0.05
    xb_temperature: float = 0.07
    # cross-batch phase (type-local spectral baseline)
    xb_phase_pca_dim: int = 8
    xb_phase_knn_k: int = 20
    # EVT (optional)
    evt_enabled: bool = False
    evt_feature: str = "static_categorical.evt"
    evt_tau_ref: float = 0.5
    evt_tau_learned: float = 0.5
    evt_min_valid_anchors: int = 4


def wire_exact_groups(cfg: "StepConfig") -> tuple:
    """Batch groups this step compares for EXACT value equality and that
    must therefore never ride the bf16 compact wire (data/wire.py): EVT
    codes 7000+ are not bf16-representable (8-bit mantissa), and a
    rounded code silently merges/splits classes in the soft-neighborhood
    grouping. The group name is user-configurable (losses.evt.feature),
    so the wire's name-based 'categorical' skip is only defense-in-depth
    -- the loop threads this config-derived skip set through
    run_epoch(wire_skip=...). ysfc grouping values are small integers
    (<= num_ysfc_classes) and bf16-exact, so no other group qualifies."""
    return ((cfg.evt_feature.split(".")[0],) if cfg.evt_enabled else ())


DEFAULT_WEIGHTS = {
    "spatial_infonce": 1.0,
    "spectral_infonce": 1.0,
    "vicreg_type": 1.0,
    "vicreg_phase": 0.1,
    "phase_neighborhood": 1.0,
    "phase_spread": 0.1,
    "recovery_disc": 0.1,
    "type_leakage": 0.01,
    "evt": 0.0,
}


def _masked_mean_rows(x: Array, valid: Array) -> Tuple[Array, Array]:
    v = valid.astype(x.dtype)[:, None]
    cnt = jnp.maximum(jnp.sum(v), 1.0)
    mu = jnp.sum(x * v, axis=0) / cnt
    return mu, cnt


def frobenius_type_leakage(h_pre: Array, z_type_sg: Array,
                           valid: Array) -> Array:
    """||cov(mean_T h_pre, sg(z_type))||_F over valid anchors -- the
    Frobenius NORM, `cross_cov.pow(2).sum().sqrt()` in the reference
    (step.py:1013-1021), not its square (the square's gradient vanishes
    exactly where the penalty should still push). The 1e-12 floor keeps
    the sqrt gradient finite at zero covariance."""
    h = jnp.mean(h_pre, axis=1)  # [N, zp]
    mu_h, cnt = _masked_mean_rows(h, valid)
    mu_z, _ = _masked_mean_rows(z_type_sg, valid)
    v = valid.astype(h.dtype)[:, None]
    hc = (h - mu_h) * v
    zc = (z_type_sg - mu_z) * v
    cross = jnp.dot(hc.T, zc, preferred_element_type=jnp.float32) \
        / jnp.maximum(cnt - 1.0, 1.0)
    return jnp.sqrt(jnp.sum(cross * cross) + 1e-12)


def make_process_batch(model, feature_builder: FeatureBuilder,
                       sampler: AnchorSampler, cfg: StepConfig,
                       patch_size: int,
                       evt_tables: Optional[Dict[str, np.ndarray]] = None,
                       diag: bool = False) -> Callable:
    """Returns pure fn(params, batch, rng, weights, curriculum, train)
    -> (total_loss, metrics). ``batch`` is the dict of group arrays
    [B, ...] from ForestDatasetV2.load_batch; ``weights`` a dict of traced
    scalars (DEFAULT_WEIGHTS keys); ``curriculum`` dict with
    input_dropout_rate / min_gate traced scalars.

    ``evt_tables``: {"similarity": [K,K], "idx_lut": [R], "valid_lut": [R],
    "weight_lut": [R], "code_offset": int} from
    :func:`build_evt_tables` when cfg.evt_enabled.
    """
    fb = feature_builder
    h = w = patch_size
    n_anchors = sampler.n_anchors(h, w)

    def sample_anchors_all(batch, key):
        """vmapped anchor sampling -> coords [B, A, 2], valid [B, A]."""
        b = next(v for k, v in batch.items()
                 if not k.startswith("__")).shape[0]
        names = set(sampler.cfg.weight_masks)
        if sampler.cfg.weight_values:
            names.add(sampler.cfg.weight_values)

        def one(key, grids):
            return sampler(key, grids, h, w)

        grids = {}
        for ref in names:
            gname, cname = ref.split(".")
            gcfg = fb.bindings.dataset[gname]
            grids[ref] = jnp.nan_to_num(
                jnp.asarray(batch[gname][..., gcfg.channel_index(cname)],
                            jnp.float32))
        keys = jax.random.split(key, b)
        if grids:
            return jax.vmap(one)(keys, grids)
        return jax.vmap(lambda k: sampler(k, {}, h, w))(keys)

    def process_batch(params, batch, rng, weights, curriculum,
                      train: bool = True):
        metrics: Dict[str, Array] = {}
        k_anchor, k_neg, k_drop = jax.random.split(rng, 3)
        bsz = next(v for k, v in batch.items()
                   if not k.startswith("__")).shape[0]

        # ---- 1. type pathway -------------------------------------------
        x_type, m_type = fb.build_feature(cfg.type_feature, batch)
        # Per-sample numerical containment (reference step.py:661-678): a
        # sample whose built features are non-finite is zeroed at the INPUT
        # and its anchors invalidated below, so it contributes nothing to any
        # loss while the rest of the batch trains normally. Input-level
        # sanitization is required -- masking only at the loss level cannot
        # stop NaN activations from poisoning param-gradients (0*NaN=NaN).
        # The batch-level finite guard in train_step stays as the backstop
        # for NaNs born inside the network.
        ok_type = jnp.all(jnp.isfinite(x_type), axis=(1, 2, 3))      # [B]
        x_type = jnp.where(ok_type[:, None, None, None], x_type, 0.0)
        variables = {"params": params}
        z_type, gate = model.apply(
            variables, x_type, return_gate=True,
            input_dropout_rate=curriculum.get("input_dropout_rate", 0.0),
            min_gate=curriculum.get("min_gate", 0.0),
            deterministic=not train,
            rngs={"dropout": k_drop} if train else {})
        metrics["gate_mean"] = jnp.mean(gate)

        # ---- 2. anchors -------------------------------------------------
        coords, a_valid = sample_anchors_all(batch, k_anchor)  # [B,A,2]
        # z_a is extracted below in ONE merged gather with the neighbor
        # coords: TPU lowers each row-gather (and its backward scatter)
        # to a serial loop, so two separate extract ops cost ~70% more
        # than one (scripts/bench_extract_variants.py: 15.6 -> 9.2 ms
        # fwd+bwd at production shapes).

        def feature_at_anchors(name, crds):
            """Per-sample at-location feature build, vmapped over B."""
            return jax.vmap(
                lambda g, c: fb.build_feature_at_locations(name, g, c),
                in_axes=({k: 0 for k in batch}, 0))(batch, crds)

        spec_a, spec_m = feature_at_anchors(cfg.spectral_feature, coords)
        a_valid = a_valid & jnp.any(spec_m, axis=-1)
        a_valid = a_valid & jax.vmap(
            lambda m, c: m[c[:, 0], c[:, 1]])(jnp.any(m_type, axis=-1),
                                              coords)

        # Phase features are built here (rather than stage 5) so per-sample
        # containment can cover every network input in one place.
        phase_x, _phase_m = feature_at_anchors(cfg.phase_feature, coords)

        ok_spec = jnp.all(jnp.isfinite(spec_a), axis=(1, 2))
        ok_phase = jnp.all(jnp.isfinite(phase_x), axis=(1, 2, 3))
        sample_fin = ok_type & ok_spec & ok_phase                    # [B]
        # Ragged-tail repeat-fill padding from loops.run_epoch: padded
        # duplicate rows are valid data but must not contribute twice.
        pad_valid = batch.get("__sample_valid__")
        if pad_valid is None:
            pad_valid = jnp.ones((bsz,), bool)
        else:
            pad_valid = pad_valid.astype(bool)
        metrics["samples_skipped"] = jnp.sum(
            (~sample_fin & pad_valid).astype(jnp.int32))
        sample_ok = sample_fin & pad_valid
        spec_a = jnp.where(sample_ok[:, None, None], spec_a, 0.0)
        phase_x = jnp.where(sample_ok[:, None, None, None], phase_x, 0.0)
        a_valid = a_valid & sample_ok[:, None]
        metrics["n_anchors_valid"] = jnp.sum(a_valid.astype(jnp.int32))

        a = n_anchors
        flat_valid = a_valid.reshape(-1)                      # [B*A]
        spec_flat = spec_a.reshape(bsz * a, -1)
        patch_ids = jnp.repeat(jnp.arange(bsz), a)
        coords_flat = coords.reshape(-1, 2)

        # ---- 3. within-patch spatial InfoNCE ---------------------------
        # Pair construction uses the DATA-validity mask (step.py:308-335
        # contract): zero-padded boundary regions and nodata pixels must
        # never become neighbors or negatives.
        pixel_mask = jnp.any(m_type, axis=-1)              # [B, H, W]

        # Pair builders emit anchor-major REGULAR layouts ([A, K] per
        # sample), so the InfoNCE runs in grouped form -- dense masked
        # logsumexps over the K axis instead of segment scatters (profiled
        # ~10 ms/step of scatter-add/gather on v5e).
        def one_sample_pairs(args):
            c, mask, key = args
            _, nbr_p, v_p = sp.spatial_knn_pairs(
                c, mask, cfg.knn_k, cfg.knn_max_radius)
            pool, pool_ok, sel, sel_ok = sp.spatial_negative_slots(
                c, mask, key, cfg.neg_min_distance, cfg.neg_max_distance,
                cfg.neg_per_anchor)
            a_ = c.shape[0]
            return (nbr_p.reshape(a_, -1, 2), v_p.reshape(a_, -1),
                    pool, pool_ok, sel, sel_ok)

        keys_neg = jax.random.split(k_neg, bsz)
        nbr_p, v_p, pool, pool_ok, sel, sel_ok = jax.vmap(one_sample_pairs)(
            (coords, pixel_mask, keys_neg))
        k1 = v_p.shape[-1]
        kn = sel.shape[-1]
        k_tot = k1 + kn
        p_pool = pool.shape[1]
        is_pos = jnp.broadcast_to(
            jnp.arange(k_tot) < k1, (bsz, a, k_tot))
        # Merged extraction (see the stage-2 note): anchors + positive
        # neighbors + the SHARED negative pool -- not the per-anchor
        # negative references. The backward of this row-gather would be a
        # serial per-row scatter (~220 ns/row measured) -- the A*kn
        # negative rows (1200/sample at production scale) fold into the
        # pool's p_pool rows (2700 -> 2012 rows/sample), and
        # ops/scatter.extract_at_coords turns the remaining scatter into
        # tile-grouped one-hot MXU matmuls (~5.2 -> ~1.5 ms/step on v5e;
        # XLA fallback off-TPU and for non-2048-multiple grids). Anchors
        # then reach their negatives through one-hot einsums (backward =
        # MXU matmuls).
        nbr_p_flat = nbr_p.reshape(bsz, a * k1, 2)
        all_coords = jnp.concatenate([coords, nbr_p_flat, pool], axis=1)
        z_all = extract_at_coords(z_type, all_coords)
        z_a = z_all[:, :a]                                  # [B, A, zt]
        z_pos = z_all[:, a:a + a * k1].reshape(bsz, a, k1, -1)
        z_pool = z_all[:, a + a * k1:]                      # [B, P, zt]
        z_a_flat = z_a.reshape(-1, z_a.shape[-1])
        hp = jax.lax.Precision.HIGHEST
        oh_sel = jax.nn.one_hot(sel, p_pool, dtype=jnp.float32)  # [B,A,kn,P]
        z_neg = jnp.einsum("bakp,bpd->bakd", oh_sel, z_pool, precision=hp)
        z_nbr = jnp.concatenate([z_pos, z_neg], axis=2)     # [B, A, K, zt]
        # Spectral pair weights (step.py:385-399 contract):
        #   positives: clip(exp(-d/sigma), min_w, 1)
        #   negatives: clip(1 - exp(-d/sigma), min_w, 1)
        # One at-locations build over [pos neighbors; pool] (merged for the
        # same scatter-row reason), negatives selected by the same one-hot.
        ext_coords = jnp.concatenate([nbr_p_flat, pool], axis=1)
        spec_ext, spec_ext_m = jax.vmap(
            lambda g, c: fb.build_feature_at_locations(
                cfg.spectral_feature, g, c),
            in_axes=({k: 0 for k in batch}, 0))(
                {k: v for k, v in batch.items()}, ext_coords)
        spec_pos = spec_ext[:, :a * k1].reshape(bsz, a, k1, -1)
        spec_pos_ok = jnp.any(
            spec_ext_m[:, :a * k1].reshape(bsz, a, k1, -1), axis=-1)
        spec_pool = spec_ext[:, a * k1:]                    # [B, P, C]
        spec_pool_ok = jnp.any(spec_ext_m[:, a * k1:], axis=-1)  # [B, P]
        spec_neg = jnp.einsum("bakp,bpc->bakc", oh_sel, spec_pool,
                              precision=hp)
        neg_spec_ok = jnp.einsum("bakp,bp->bak", oh_sel,
                                 spec_pool_ok.astype(jnp.float32),
                                 precision=hp) > 0.5
        pv = (jnp.concatenate([v_p & spec_pos_ok,
                               sel_ok & neg_spec_ok], axis=2)
              & a_valid[:, :, None])
        spec_nbr = jnp.concatenate([spec_pos, spec_neg], axis=2)
        d_spec = jnp.linalg.norm(spec_a[:, :, None, :] - spec_nbr, axis=-1)
        e = jnp.exp(-d_spec / cfg.spectral_sigma)
        pw = jnp.clip(jnp.where(is_pos, e, 1.0 - e),
                      cfg.min_pair_weight, 1.0)

        s_dim = bsz * a
        d_z = z_a.shape[-1]
        spatial_loss, sp_aux = contrastive_loss_grouped(
            z_a.reshape(s_dim, d_z),
            z_nbr.reshape(s_dim, k_tot, d_z),
            is_pos.reshape(s_dim, k_tot),
            weights=pw.reshape(s_dim, k_tot),
            pair_valid=pv.reshape(s_dim, k_tot),
            similarity=cfg.similarity, temperature=cfg.temperature)
        metrics["loss_spatial_infonce"] = spatial_loss
        metrics["spatial_pos_sim"] = sp_aux["mean_pos_sim"]
        metrics["spatial_neg_sim"] = sp_aux["mean_neg_sim"]

        # ---- 4. VICReg on z_type anchors -------------------------------
        vcr, vcr_v, vcr_c = variance_covariance_loss(
            z_a_flat, flat_valid, cfg.vcr_std_target,
            cfg.vcr_variance_weight, cfg.vcr_covariance_weight)
        metrics["loss_vicreg_type"] = vcr
        metrics["vicreg_type_var"] = vcr_v
        metrics["vicreg_type_cov"] = vcr_c

        # ---- 5. phase pathway (phase_x built + sanitized in stage 2) ----
        ys_g, ys_c = cfg.ysfc_source.split(".")
        ys_cfg = fb.bindings.dataset[ys_g]
        ysfc_grid = jnp.asarray(
            batch[ys_g][..., ys_cfg.channel_index(ys_c)],
            jnp.float32)[..., None]                           # [B,T,H,W,1]
        ysfc = jax.vmap(sp.extract_temporal_at_locations)(
            ysfc_grid, coords)[..., 0]                        # [B, A, T]

        t_dim = phase_x.shape[2]
        n_flat = bsz * a
        phase_flat = phase_x.reshape(n_flat, t_dim, -1)
        ysfc_flat = ysfc.reshape(n_flat, t_dim)
        z_type_sg = jax.lax.stop_gradient(z_a_flat)

        # PHASE-anchor validity: the reference samples phase anchors only
        # from pixels whose ysfc is valid at EVERY timestep
        # (reference step.py:417-424 `phase_mask = combined_mask &
        # ysfc_mask.all(dim=0)`) -- anchors with missing ysfc years corrupt
        # the recovery-sequence alignment (seq_lengths_per_t) and must not
        # enter any phase loss.
        ys_ok = jnp.all(jnp.isfinite(ysfc), axis=-1)             # [B, A]
        phase_a_valid = a_valid & ys_ok
        phase_valid_flat = phase_a_valid.reshape(-1)             # [B*A]

        z_phase, gamma, beta, h_pre = model.apply(
            variables, phase_flat, z_type_sg, return_film=True,
            return_pre_film=True, deterministic=not train,
            method=model.forward_phase_at_locations,
            rngs={"dropout": k_drop} if train else {})
        metrics["film_gamma_mean"] = jnp.mean(gamma)
        metrics["film_beta_mean"] = jnp.mean(beta)

        # per-sample phase pairs, offset into the flat anchor space.
        # valid_anchors keeps invalid slots out of the kNN CANDIDATE lists
        # (they would otherwise displace valid neighbors and count toward
        # the min_pairs stage-3 filter).
        def one_phase_pairs(spec, ys, av):
            return build_phase_pairs(
                spec, ys, cfg.phase_k, cfg.phase_min_overlap,
                cfg.phase_min_pairs, True, cfg.phase_sigma,
                num_ysfc_classes=cfg.num_ysfc_classes, valid_anchors=av)

        pp, pwts, pvalid, pstats = jax.vmap(one_phase_pairs)(
            spec_a, ysfc, phase_a_valid)
        offsets = (jnp.arange(bsz) * a)[:, None, None]
        pp_flat = (pp + offsets).reshape(-1, 2)
        pw_flat = pwts.reshape(-1)
        pvalid_g = (pvalid
                    & jnp.take_along_axis(phase_a_valid, pp[..., 0], axis=1)
                    & jnp.take_along_axis(phase_a_valid, pp[..., 1], axis=1))
        pvalid_flat = pvalid_g.reshape(-1)

        # Cross-batch type-local spectral baseline (step.py:907-932): the
        # phase losses see spectral features demeaned by the mean over the
        # kNN (in rank-reduced z_type space) of each anchor's time-pooled
        # spectrum, so "phase" can't re-learn type identity.
        spec_dm, _ = type_local_spectral_demean(
            z_type_sg, phase_flat, phase_valid_flat,
            cfg.xb_phase_pca_dim, cfg.xb_phase_knn_k)

        # Sample-grouped builder: the pair->anchor hop runs as one-hot
        # einsums instead of gathers whose backward scatter-adds into the
        # shared phase table (~40 ms/step of serialized scatters on v5e).
        phase_batch = build_phase_neighborhood_batch_grouped(
            spec_dm.reshape(bsz, a, t_dim, -1),
            z_phase.reshape(bsz, a, t_dim, -1), ysfc, pp, pvalid_g,
            cfg.phase_min_overlap, cfg.num_ysfc_classes, layout="mnsp")
        ph_loss, ph_stats = phase_neighborhood_loss(
            spec_dm, z_phase, ysfc_flat, pp_flat, pw_flat,
            pvalid_flat, cfg.phase_tau_ref, cfg.phase_tau_learned,
            cfg.phase_min_overlap, 2, cfg.phase_self_weight,
            cfg.phase_cross_weight, cfg.num_ysfc_classes,
            _batch=phase_batch)
        metrics["loss_phase_neighborhood"] = ph_loss
        metrics["phase_loss_self"] = ph_stats["loss_self"]
        metrics["phase_loss_cross"] = ph_stats["loss_cross"]
        metrics["phase_pairs_valid"] = ph_stats[
            "n_pairs_sufficient_overlap"]

        # Spread-ranking dynamism reference: the configured supervision
        # feature (static per-anchor channels averaged -- reference
        # step.py:973-974 `dynamism_all.mean(dim=1)` over the
        # phase_dynamism_supervision feature) when available; mean temporal
        # std of the phase features as the documented fallback for
        # bindings without one.
        if cfg.dynamism_feature:
            dyn_a, _dm = feature_at_anchors(cfg.dynamism_feature, coords)
            dyn = jnp.mean(dyn_a.reshape(n_flat, -1), axis=-1)   # [N]
        else:
            dyn = jnp.mean(jnp.std(phase_flat, axis=1), axis=-1)
        spread_loss, spread_stats = compute_phase_spread_ranking(
            phase_batch, pp_flat, dyn, cfg.spread_margin, cfg.spread_delta)
        metrics["loss_phase_spread"] = spread_loss
        metrics["spread_frac_satisfied"] = spread_stats["frac_satisfied"]

        rd_loss, rd_stats = phase_recovery_discrimination_loss(
            jnp.where(phase_valid_flat[:, None, None], z_phase, 0.0),
            jnp.where(phase_valid_flat[:, None], ysfc_flat, jnp.nan),
            cfg.rd_margin, cfg.rd_low_ysfc_max, cfg.rd_high_ysfc_min)
        metrics["loss_recovery_disc"] = rd_loss

        pvcr, _, _ = variance_covariance_loss(
            z_phase.reshape(-1, z_phase.shape[-1]),
            jnp.repeat(phase_valid_flat, t_dim), cfg.vcr_std_target,
            cfg.vcr_variance_weight, cfg.vcr_covariance_weight)
        metrics["loss_vicreg_phase"] = pvcr

        leak = frobenius_type_leakage(h_pre, z_type_sg, phase_valid_flat)
        metrics["loss_type_leakage"] = leak

        # ---- 6. cross-batch spectral InfoNCE ---------------------------
        big = 1e6
        spec_guard = jnp.where(flat_valid[:, None], spec_flat,
                               big * (1.0 + jnp.arange(n_flat)
                                      )[:, None].astype(jnp.float32))
        # Grouped (anchor-major) mutual-kNN positives + random negatives:
        # dense masked logsumexp instead of segment scatters.
        knn_idx, knn_valid = pairs_mod.mutual_knn_grouped(
            spec_guard, cfg.xb_knn_k, patch_ids, coords_flat,
            cfg.xb_pos_min_spatial, cfg.xb_chunk_size)
        pos_valid = knn_valid & flat_valid[:, None] & flat_valid[knn_idx]
        # random cross-patch negatives
        k_xb = jax.random.fold_in(k_neg, 7)
        neg_j = jax.random.randint(k_xb, (n_flat, cfg.xb_neg_per_anchor),
                                   0, n_flat)
        neg_valid = (patch_ids[:, None] != patch_ids[neg_j]) \
            & flat_valid[:, None] & flat_valid[neg_j]
        d_neg = jnp.linalg.norm(spec_flat[:, None, :] - spec_flat[neg_j],
                                axis=-1)
        # Reference contract (step.py:770-793): mutual-kNN positives are
        # UNWEIGHTED; negatives get clip(1 - exp(-d/sigma), min_w, 1).
        w_neg = jnp.clip(1.0 - jnp.exp(-d_neg / cfg.xb_neg_tau),
                         cfg.xb_neg_min_weight, 1.0)

        kp = knn_idx.shape[1]
        xb_idx = jnp.concatenate([knn_idx, neg_j], axis=1)   # [N, kp+nk]
        xb_pos = jnp.broadcast_to(
            jnp.arange(xb_idx.shape[1]) < kp, xb_idx.shape)
        xb_v = jnp.concatenate([pos_valid, neg_valid], axis=1)
        xb_w = jnp.concatenate(
            [jnp.ones(knn_idx.shape, jnp.float32), w_neg], axis=1)
        xb_loss, xb_aux = contrastive_loss_grouped(
            z_a_flat, z_a_flat[xb_idx], xb_pos,
            weights=xb_w, pair_valid=xb_v, similarity=cfg.similarity,
            temperature=cfg.xb_temperature)
        metrics["loss_spectral_infonce"] = xb_loss
        metrics["spectral_pos_sim"] = xb_aux["mean_pos_sim"]
        metrics["spectral_neg_sim"] = xb_aux["mean_neg_sim"]
        metrics["spectral_n_anchors"] = xb_aux["n_anchors_used"]
        # 'Spectral sims' gap/T kernel-sizing diagnostic (SURVEY.md §6.5).
        metrics["spectral_gap_over_T"] = (
            (xb_aux["mean_pos_sim"] - xb_aux["mean_neg_sim"])
            / cfg.xb_temperature)

        # ---- 7. optional EVT -------------------------------------------
        if cfg.evt_enabled and evt_tables is not None:
            gname, cname = cfg.evt_feature.split(".")
            gcfg = fb.bindings.dataset[gname]
            evt_grid = batch[gname][..., gcfg.channel_index(cname)]
            evt_codes = jax.vmap(sp.extract_at_locations)(
                evt_grid[..., None], coords)[..., 0].reshape(-1)
            off = int(evt_tables["code_offset"])
            lut_len = evt_tables["idx_lut"].shape[0]
            rel = jnp.clip(evt_codes.astype(jnp.int32) - off, 0,
                           lut_len - 1)
            in_range = (evt_codes >= off) & (evt_codes < off + lut_len)
            e_idx = jnp.asarray(evt_tables["idx_lut"])[rel]
            e_valid = jnp.asarray(evt_tables["valid_lut"])[rel] \
                & in_range & flat_valid
            e_w = jnp.asarray(evt_tables["weight_lut"])[rel]
            evt_loss, evt_stats = evt_soft_neighborhood_loss(
                z_a_flat, e_idx, e_valid, e_w,
                jnp.asarray(evt_tables["similarity"]),
                evt_codes.astype(jnp.int32),
                cfg.evt_tau_ref, cfg.evt_tau_learned,
                cfg.evt_min_valid_anchors)
            metrics["loss_evt"] = evt_loss
            metrics["evt_anchors_valid"] = evt_stats["n_anchors_valid"]
        else:
            evt_loss = jnp.float32(0.0)
            metrics["loss_evt"] = evt_loss

        # ---- 7b. optional reference-depth diagnostics -------------------
        if diag:
            pos_m = pv & is_pos
            neg_m = pv & ~is_pos
            # Strided gate subsample: full-tensor gate stats once cost the
            # reference 3.5 s/batch, hence its _GATE_STATS_SAMPLES=4096
            # (reference step.py:53-56, CLAUDE.md:374). A stride-8 grid is
            # the static-shape analogue (~590k samples at B=12 256^2).
            gs = gate[:, ::8, ::8, :]
            gm = jnp.broadcast_to(pixel_mask[:, ::8, ::8, None], gs.shape)
            metrics.update(dg.masked_stats(gs, gm, "diag_gate"))
            metrics.update(dg.masked_stats(pw, pos_m, "diag_pos_weight"))
            metrics.update(dg.masked_stats(pw, neg_m, "diag_neg_weight"))
            metrics.update(dg.masked_stats(d_spec, pos_m,
                                           "diag_pos_spec_dist"))
            metrics.update(dg.masked_stats(d_spec, neg_m,
                                           "diag_neg_spec_dist"))
            # similarity distributions in the same -||a-b||^2/D units the
            # softmax sees (reference 'Spatial sims'/'Spectral sims' rows)
            sim_sp = -jnp.sum((z_a[:, :, None, :] - z_nbr.reshape(
                bsz, a, k_tot, d_z)) ** 2, axis=-1) / d_z
            metrics.update(dg.masked_stats(sim_sp, pos_m, "diag_pos_sim"))
            metrics.update(dg.masked_stats(sim_sp, neg_m, "diag_neg_sim"))
            sim_xb = -jnp.sum((z_a_flat[:, None, :]
                               - z_a_flat[knn_idx]) ** 2, axis=-1) / d_z
            metrics.update(dg.masked_stats(sim_xb, pos_valid,
                                           "diag_spectral_pos_sim"))
            # tau sweeps (reference logs them at epoch 0 only; computing
            # every step is a few masked reductions -- logging decides)
            metrics.update(dg.tau_sweep_stats(
                d_spec, pos_m, cfg.min_pair_weight, "diag_tau_pos", False))
            metrics.update(dg.tau_sweep_stats(
                d_spec, neg_m, cfg.min_pair_weight, "diag_tau_neg", True))
            metrics.update(dg.tau_sweep_stats(
                d_neg, neg_valid, cfg.min_pair_weight,
                "diag_tau_spectral_neg", True))
            # Rows must match the leakage loss itself (and the reference
            # diagnostic, step.py:1140-1171): phase-valid anchors, not all
            # spatially-valid anchors — they differ when ysfc has missing
            # timesteps.
            metrics.update(dg.type_leakage_ridge(
                jnp.mean(h_pre, axis=1), z_type_sg, phase_valid_flat))

        # ---- 8. total ---------------------------------------------------
        total = (weights["spatial_infonce"] * spatial_loss
                 + weights["spectral_infonce"] * xb_loss
                 + weights["vicreg_type"] * vcr
                 + weights["vicreg_phase"] * pvcr
                 + weights["phase_neighborhood"] * ph_loss
                 + weights["phase_spread"] * spread_loss
                 + weights["recovery_disc"] * rd_loss
                 + weights["type_leakage"] * leak
                 + weights["evt"] * evt_loss)
        metrics["loss_total"] = total
        return total, metrics

    return process_batch


def build_evt_tables(metric) -> Dict[str, np.ndarray]:
    """Pack an EvtDiffusionMetric into in-graph LUT arrays."""
    codes = metric.codes
    off = int(codes.min())
    rng = int(codes.max()) - off + 1
    idx_lut = np.zeros(rng, np.int32)
    valid_lut = np.zeros(rng, bool)
    weight_lut = np.zeros(rng, np.float32)
    for c, i in metric.code_to_idx.items():
        idx_lut[c - off] = i
        valid_lut[c - off] = True
        weight_lut[c - off] = metric.freq_weights[i]
    return {"similarity": metric.similarity, "idx_lut": idx_lut,
            "valid_lut": valid_lut, "weight_lut": weight_lut,
            "code_offset": off}


__all__ = ["StepConfig", "make_process_batch", "build_evt_tables",
           "DEFAULT_WEIGHTS", "frobenius_type_leakage"]
