"""Runnable demos for every loss family on synthetic tensors.

The forest-tpu analogue of the per-loss demos in /root/reference/frl/
examples (SURVEY.md §2.8) -- de-facto manual integration tests.

Run: python examples/example_losses.py
"""
import jax
import jax.numpy as jnp
import numpy as np


def demo_contrastive(rng):
    from forest_tpu.losses.contrastive import contrastive_loss

    za = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    zo = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    aid = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1])
    is_pos = jnp.asarray([1, 1, 0, 0, 1, 0, 0, 0], bool)
    loss, aux = contrastive_loss(za, zo, aid, is_pos, 2)
    print(f"contrastive: loss={float(loss):.4f} "
          f"anchors={int(aux['n_anchors_used'])}")


def demo_vicreg(rng):
    from forest_tpu.losses.variance_covariance import (
        variance_covariance_loss)

    z = jnp.asarray(rng.normal(size=(256, 16)), jnp.float32)
    total, v, c = variance_covariance_loss(z)
    print(f"vicreg: total={float(total):.4f} var={float(v):.4f} "
          f"cov={float(c):.4f}")


def demo_soft_neighborhood(rng):
    from forest_tpu.losses.soft_neighborhood import (
        pairwise_sq_distances, soft_neighborhood_matching_loss)

    x = jnp.asarray(rng.normal(size=(2, 6, 4)), jnp.float32)
    d = jnp.sqrt(pairwise_sq_distances(x))
    mask = ~jnp.eye(6, dtype=bool)[None].repeat(2, 0)
    loss, stats = soft_neighborhood_matching_loss(d, d * 1.3, mask)
    print(f"soft_neighborhood: loss={float(loss):.4f} "
          f"rows={int(stats['n_rows_valid'])}")


def demo_phase(rng):
    from forest_tpu.losses.phase_neighborhood import phase_neighborhood_loss
    from forest_tpu.losses.phase_pairs import build_phase_pairs

    n, t = 12, 8
    spec2d = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    spec = jnp.asarray(rng.normal(size=(n, t, 4)), jnp.float32)
    phase = jnp.asarray(rng.normal(size=(n, t, 3)), jnp.float32)
    ysfc = jnp.asarray(rng.integers(0, 6, size=(n, t)), jnp.float32)
    pairs, w, valid, stats = build_phase_pairs(spec2d, ysfc, k=4,
                                               min_overlap=2, min_pairs=1)
    loss, pstats = phase_neighborhood_loss(spec, phase, ysfc, pairs, w,
                                           valid, min_overlap=2)
    print(f"phase pairs: {int(stats['n_total_pairs'])} -> "
          f"neighborhood loss={float(loss):.4f} "
          f"(self {float(pstats['loss_self']):.3f} / "
          f"cross {float(pstats['loss_cross']):.3f})")


def demo_triplet(rng):
    from forest_tpu.losses.triplet_phase import (
        phase_recovery_discrimination_loss, phase_triplet_loss)

    n, t, d = 16, 8, 4
    e = [jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
         for _ in range(3)]
    ysfc = jnp.asarray(rng.integers(0, 8, size=(n, t)), jnp.float32)
    loss, stats = phase_triplet_loss(*e, ysfc, 0, 4, 7)
    print(f"triplet: loss={float(loss):.4f} "
          f"constraints={int(stats['n_constraints'])}")
    z = jnp.asarray(rng.normal(size=(n, t, d)), jnp.float32)
    rd, rstats = phase_recovery_discrimination_loss(z, ysfc)
    print(f"recovery_disc: loss={float(rd):.4f} "
          f"pixels={int(rstats['n_active_pixels'])}")


def demo_vq(rng):
    from forest_tpu.ops import vq

    x = jnp.asarray(rng.normal(size=(512, 32)), jnp.float32)
    cb = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    r = vq.quantize(x, cb, mode="ema", use_pallas=False)
    stats = vq.VQStats.init(64, 32)
    stats, new_cb = vq.ema_codebook_update(stats, cb, r.counts, r.sums)
    print(f"vq: vq_loss={float(r.vq_loss):.4f} "
          f"perplexity={float(r.perplexity):.1f} "
          f"codebook moved {float(jnp.abs(new_cb - cb).mean()):.4f}")


def demo_grouped_infonce(rng):
    """Weighted anchor-grouped InfoNCE in the dense [S, K] layout the FRL
    step uses (contrastive_loss_example.py analogue)."""
    from forest_tpu.losses.contrastive import contrastive_loss_grouped

    s, k, d = 32, 6, 16
    za = jnp.asarray(rng.normal(size=(s, d)), jnp.float32)
    zo = jnp.asarray(rng.normal(size=(s, k, d)), jnp.float32)
    is_pos = jnp.asarray(rng.random(size=(s, k)) < 0.4)
    w = jnp.asarray(rng.uniform(0.05, 1.0, size=(s, k)), jnp.float32)
    pv = jnp.asarray(rng.random(size=(s, k)) < 0.9)
    loss, aux = contrastive_loss_grouped(za, zo, is_pos, weights=w,
                                         pair_valid=pv)
    print(f"grouped infonce: loss={float(loss):.4f} "
          f"anchors={int(aux['n_anchors_used'])} "
          f"pos_sim={float(aux['mean_pos_sim']):.3f} "
          f"neg_sim={float(aux['mean_neg_sim']):.3f}")


def demo_pairs(rng):
    """Pair construction strategies (pairs_example.py analogue)."""
    from forest_tpu.losses import pairs as pm

    x = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    d = jnp.linalg.norm(x[:, None] - x[None], axis=-1)
    pairs, valid = pm.pairs_knn(d, k=4)
    print(f"pairs knn: {int(valid.sum())} valid of {valid.size}")
    mpairs, mvalid = pm.pairs_mutual_knn(d, k=4)
    print(f"pairs mutual-knn: {int(mvalid.sum())} valid")
    adj_q = pm.pairs_quantile(d, 0.1)
    adj_r = pm.pairs_radius(d, float(jnp.quantile(d, 0.1)))
    print(f"pairs quantile(0.1): {int(adj_q.sum())} edges; "
          f"radius: {int(adj_r.sum())} edges")


def demo_evt(rng):
    """EVT diffusion-metric soft neighborhood (check_evt_tau.py's loss)."""
    from forest_tpu.losses.evt_soft_neighborhood import (
        evt_soft_neighborhood_loss)

    n, d, ktypes = 48, 16, 5
    z = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    sim = rng.uniform(0.1, 1.0, size=(ktypes, ktypes))
    sim = jnp.asarray((sim + sim.T) / 2 + np.eye(ktypes), jnp.float32)
    e_idx = jnp.asarray(rng.integers(0, ktypes, size=(n,)), jnp.int32)
    e_valid = jnp.asarray(rng.random(n) < 0.9)
    e_w = jnp.ones((n,), jnp.float32)
    loss, stats = evt_soft_neighborhood_loss(
        z, e_idx, e_valid, e_w, sim, e_idx, 0.5, 0.5, 4)
    print(f"evt soft-neighborhood: loss={float(loss):.4f} "
          f"anchors={int(stats['n_anchors_valid'])}")


def demo_spread(rng):
    """Phase spread ranking on a neighborhood batch (spread/recovery
    demos from the reference example set)."""
    from forest_tpu.losses.phase_neighborhood import (
        build_phase_neighborhood_batch, compute_phase_spread_ranking)
    from forest_tpu.losses.phase_pairs import build_phase_pairs

    n, t = 24, 10
    spec2d = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    spec = jnp.asarray(rng.normal(size=(n, t, 4)), jnp.float32)
    phase = jnp.asarray(rng.normal(size=(n, t, 3)), jnp.float32)
    ysfc = jnp.asarray(rng.integers(0, 6, size=(n, t)), jnp.float32)
    pairs, w, valid, _ = build_phase_pairs(spec2d, ysfc, k=4,
                                           min_overlap=2, min_pairs=1)
    batch = build_phase_neighborhood_batch(spec, phase, ysfc, pairs,
                                           valid, 2)
    dyn = jnp.mean(jnp.std(spec, axis=1), axis=-1)
    loss, stats = compute_phase_spread_ranking(batch, pairs, dyn)
    print(f"phase spread: loss={float(loss):.4f} "
          f"frac_satisfied={float(stats['frac_satisfied']):.3f}")


def demo_reconstruction(rng):
    """Element-wise VQ-VAE losses (reconstruction_loss_example.py
    analogue): masked reconstruction + categorical + count."""
    from forest_tpu.losses.categorical import categorical_loss
    from forest_tpu.losses.count import count_loss
    from forest_tpu.losses.reconstruction import reconstruction_loss

    b, t, c = 16, 5, 6
    pred = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    tgt = pred + 0.1 * jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    tgt = tgt.at[0, 0, 0].set(jnp.nan)  # missing data stays masked
    rec = reconstruction_loss(pred, tgt)
    logits = jnp.asarray(rng.normal(size=(b, t, 7)), jnp.float32)
    labels = jnp.asarray(rng.integers(-1, 7, size=(b, t)), jnp.int32)
    labels = jnp.where(labels < 0, -100, labels)  # ignore_index
    cat = categorical_loss(logits, labels)
    cnt = count_loss(jnp.asarray(rng.normal(size=(b,)), jnp.float32),
                     jnp.asarray(rng.integers(0, 9, size=(b,)), jnp.float32))
    print(f"reconstruction={float(rec):.4f} categorical={float(cat):.4f} "
          f"count={float(cnt):.4f}")


def demo_type_local_demean(rng):
    """Cross-batch type-local spectral baseline feeding the phase losses
    (reference step.py:885-932)."""
    from forest_tpu.losses.phase_neighborhood import (
        type_local_spectral_demean)

    n, t, c, zt = 40, 8, 6, 16
    z_type = jnp.asarray(rng.normal(size=(n, zt)), jnp.float32)
    spec = jnp.asarray(rng.normal(size=(n, t, c)), jnp.float32)
    valid = jnp.asarray(rng.random(n) < 0.9)
    dm, base = type_local_spectral_demean(z_type, spec, valid, 8, 5)
    print(f"type-local demean: |spec|={float(jnp.abs(spec).mean()):.3f} "
          f"-> |demeaned|={float(jnp.abs(dm).mean()):.3f}")


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    for demo in (demo_vq, demo_contrastive, demo_grouped_infonce,
                 demo_vicreg, demo_soft_neighborhood, demo_pairs,
                 demo_phase, demo_spread, demo_triplet, demo_evt,
                 demo_reconstruction, demo_type_local_demean):
        demo(rng)
