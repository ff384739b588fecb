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


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    for demo in (demo_vq, demo_contrastive, demo_vicreg,
                 demo_soft_neighborhood, demo_phase, demo_triplet):
        demo(rng)
