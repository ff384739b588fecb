"""Jitted VQ-VAE train/eval step.

Implements the legacy training-loop contract (SURVEY.md §3 "Training loop
contract"; /root/reference/scripts/train_vqvae.py:296-339): total loss =
lambda_cont * nan-safe MSE(cont) + lambda_cat * sum_head weighted CE(ignore
-100) + lambda_canopy * nan-safe MSE(canopy) + lambda_vq(step) * vq_loss;
AdamW with weight_decay=0 on the codebook param group; grad-clip 1.0; cosine
LR. The torch AMP GradScaler has no TPU equivalent and is dropped: compute is
bf16-safe fp32/bf16 mixed via XLA defaults (SURVEY.md §2.9 "Mixed precision").

TPU-first: the step is a pure function jitted once; loss weights arrive as
traced scalars so annealers never retrigger compilation; data parallelism is
expressed by sharding the batch along a mesh "data" axis (see
forest_tpu.parallel.dp) -- XLA inserts the gradient and EMA-statistic
all-reduces, the code contains no explicit communication.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from forest_tpu.data import wire
from forest_tpu.losses.categorical import IGNORE_INDEX, categorical_loss
from forest_tpu.losses.reconstruction import reconstruction_loss
from forest_tpu.models.vqvae import VQVAE, VQVAEOutput
from forest_tpu.ops import vq as vq_ops

Array = jax.Array


class VQVAETrainState(NamedTuple):
    params: Any
    opt_state: Any
    vq_stats: vq_ops.VQStats
    step: Array  # int32 scalar


def make_optimizer(learning_rate: optax.Schedule | float,
                   weight_decay: float = 1e-4,
                   grad_clip: float = 1.0,
                   b1: float = 0.9, b2: float = 0.999) -> optax.GradientTransformation:
    """AdamW with the codebook excluded from weight decay
    (/root/reference/scripts/train_vqvae.py:221-228)."""
    def wd_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: not any(
                getattr(p, "key", None) == "codebook" for p in path),
            params)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(learning_rate, b1=b1, b2=b2,
                    weight_decay=weight_decay, mask=wd_mask),
    )


def init_train_state(model: VQVAE, optimizer: optax.GradientTransformation,
                     example_batch: Dict[str, Array],
                     rng: Array) -> VQVAETrainState:
    example_batch = wire.decode_wire_batch(example_batch)
    params = model.init(rng, example_batch, use_pallas=False)["params"]
    return VQVAETrainState(
        params=params,
        opt_state=optimizer.init(params),
        # codebook-seeded EMA state: unassigned codes keep their init
        # vectors instead of zero-collapsing on the first update
        vq_stats=vq_ops.VQStats.init(model.codebook_size, model.emb_dim,
                                     codebook=params["codebook"]),
        step=jnp.zeros((), jnp.int32),
    )


def vqvae_loss(out: VQVAEOutput, batch: Dict[str, Array],
               class_weights: Dict[str, Array],
               loss_weights: Dict[str, Array]) -> Tuple[Array, Dict[str, Array]]:
    """Per-batch loss. ``loss_weights`` keys: cont, cat, canopy, vq."""
    cont_l = reconstruction_loss(out.cont_pred, batch["cont"],
                                 batch.get("cont_nan_mask"), kind="l2")
    cat_l = jnp.float32(0.0)
    cat_metrics = {}
    for name in sorted(out.cat_logits):
        # weight_sum = torch F.cross_entropy(weight=..., reduction="mean")
        # semantics of the legacy loop (train_vqvae.py:308-314), so
        # zero-weight MISS/UNK targets neither count nor dilute.
        l = categorical_loss(out.cat_logits[name], batch["cat_target"][name],
                             class_weights.get(name),
                             ignore_index=IGNORE_INDEX,
                             normalization="weight_sum")
        cat_metrics[f"cat/{name}"] = l
        cat_l = cat_l + l
    canopy_l = reconstruction_loss(out.canopy_pred, batch["canopy"], kind="l2")

    total = (loss_weights["cont"] * cont_l
             + loss_weights["cat"] * cat_l
             + loss_weights["canopy"] * canopy_l
             + loss_weights["vq"] * out.vq_loss)
    metrics = {"loss/total": total, "loss/cont": cont_l, "loss/cat": cat_l,
               "loss/canopy": canopy_l, "loss/vq": out.vq_loss,
               "perplexity": out.perplexity, **cat_metrics}
    return total, metrics


def make_train_step(model: VQVAE, optimizer: optax.GradientTransformation,
                    class_weights: Optional[Dict[str, Array]] = None,
                    use_pallas: Optional[bool] = None,
                    reseed_dead: bool = False,
                    reseed_threshold: float = 1e-3,
                    axis_name: Optional[str] = None) -> Callable:
    """Returns pure ``train_step(state, batch, loss_weights, rng) -> (state, metrics)``.

    jit / pjit is applied by the caller (single-chip: jax.jit with donation;
    multi-chip: forest_tpu.parallel.dp wraps it with mesh shardings).
    With ``axis_name`` set (inside shard_map over the data mesh), gradients
    and metrics are pmean'd, EMA sufficient statistics psum'd, and dead-code
    reseed candidates all-gathered, so every replica applies the identical
    update -- the explicit-collective path required because the Pallas VQ
    kernel only partitions under Manual (shard_map) mesh axes.
    """
    cw = class_weights or {}

    def train_step(state: VQVAETrainState, batch: Dict[str, Array],
                   loss_weights: Dict[str, Array], rng: Array):
        batch = wire.decode_wire_batch(batch)  # no-op on plain batches

        def loss_fn(params):
            out = model.apply({"params": params}, batch,
                              use_pallas=use_pallas)
            total, metrics = vqvae_loss(out, batch, cw, loss_weights)
            return total, (out, metrics)

        (_, (out, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)

        vq_stats = state.vq_stats
        if model.quantizer == "ema":
            vq_stats, new_cb = vq_ops.ema_codebook_update(
                vq_stats, params["codebook"], out.counts, out.sums,
                decay=model.ema_decay, eps=model.ema_eps,
                axis_name=axis_name)
            if reseed_dead:
                cand = out.z_e
                if axis_name is not None:
                    cand = jax.lax.all_gather(out.z_e, axis_name, axis=0,
                                              tiled=True)
                new_cb, vq_stats = vq_ops.reseed_dead_codes(
                    new_cb, vq_stats, cand, rng,
                    threshold=reseed_threshold)
            params = dict(params)
            params["codebook"] = new_cb
        else:
            counts = out.counts
            if axis_name is not None:
                counts = jax.lax.psum(counts, axis_name)
            vq_stats = vq_stats._replace(
                code_usage=vq_stats.code_usage + counts)

        metrics["grad_norm"] = optax.global_norm(grads)
        if axis_name is not None:
            metrics = jax.tree.map(
                lambda m: jax.lax.pmean(m, axis_name), metrics)
        new_state = VQVAETrainState(params, opt_state, vq_stats,
                                    state.step + 1)
        return new_state, metrics

    return train_step


def make_scan_train_step(train_step: Callable) -> Callable:
    """Wrap any ``train_step(state, batch, loss_weights, rng)`` into a
    multi-step-per-dispatch function driven by ``jax.lax.scan``.

    The returned ``multi_step(state, stacked_batch, stacked_weights, rng)``
    runs K = leading-axis train steps in ONE device dispatch: the host
    stacks K loader batches (``wire.stack_batches``) and K annealer weight
    dicts leaf-wise with a leading K axis, transfers them in one H2D
    event, and fetches metrics once per dispatch (or less). This is the
    TPU-native answer to the relay's per-dispatch/fetch drain cost
    (CLAUDE.md TIMING PROTOCOL: ~1 s drain cost per fetch event on shallow
    queues): the per-K-steps host cost collapses to one dispatch + one
    optional fetch, leaving the byte-proportional H2D link as the only
    per-batch wall. Semantics are EXACTLY K sequential ``train_step``
    calls (same annealer values per step, same per-step rng folding);
    tests assert bit-identical states vs the sequential loop.

    Returned metrics have a leading K axis (one entry per executed step).
    """
    def multi_step(state, stacked_batch: Dict[str, Array],
                   stacked_weights: Dict[str, Array], rng: Array):
        k = jax.tree_util.tree_leaves(stacked_batch)[0].shape[0]
        rngs = jax.random.split(rng, k)

        def body(st, xs):
            batch, w, r = xs
            return train_step(st, batch, w, r)

        return jax.lax.scan(body, state,
                            (stacked_batch, stacked_weights, rngs))

    return multi_step


def make_eval_step(model: VQVAE,
                   class_weights: Optional[Dict[str, Array]] = None,
                   use_pallas: Optional[bool] = None,
                   axis_name: Optional[str] = None) -> Callable:
    """With ``axis_name`` set (inside shard_map over the data mesh),
    per-replica metric means are pmean'd to the global batch mean."""
    cw = class_weights or {}

    def eval_step(params, batch, loss_weights):
        batch = wire.decode_wire_batch(batch)  # no-op on plain batches
        out = model.apply({"params": params}, batch, use_pallas=use_pallas)
        _, metrics = vqvae_loss(out, batch, cw, loss_weights)
        if axis_name is not None:
            metrics = {k: jax.lax.pmean(v, axis_name)
                       for k, v in metrics.items()}
        return metrics

    return eval_step


__all__ = ["VQVAETrainState", "make_optimizer", "init_train_state",
           "vqvae_loss", "make_train_step", "make_scan_train_step",
           "make_eval_step"]
