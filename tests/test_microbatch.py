"""In-graph microbatched gradient accumulation (VERDICT r4 task #4).

The FRL train step lax.scans over equal-size microbatch grad computations
when the batch exceeds a cap (on TPU: the Pallas smoothing fault envelope,
ops/smoothing._PALLAS_MAX_BATCH), sums gradients, and applies ONE optimizer
update. These tests pin the semantics on CPU: the microbatched step must
equal MANUAL gradient accumulation (per-microbatch value_and_grad with
fold_in'd rngs, equal-weight averaged) bit-for-fp32, counts must partition,
and the containment contract must survive the scan path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forest_tpu.training.representation.train_step import (
    _microbatch_groups, default_frl_microbatch_cap)


def test_microbatch_groups_math():
    assert _microbatch_groups(24, 17) == 2   # 2 x 12
    assert _microbatch_groups(20, 17) == 2   # 2 x 10
    assert _microbatch_groups(18, 17) == 2   # 2 x 9
    assert _microbatch_groups(34, 17) == 2   # 2 x 17 (at the cap)
    assert _microbatch_groups(35, 17) == 5   # 35 % 3, % 4 != 0 -> 5 x 7
    assert _microbatch_groups(4, 2) == 2
    for b, cap in [(24, 17), (20, 17), (35, 17), (48, 16), (6, 4)]:
        g = _microbatch_groups(b, cap)
        assert b % g == 0 and b // g <= cap


def test_default_cap_is_none_off_tpu():
    # CPU CI: auto-cap must be None so plain-path tests keep their graphs.
    assert jax.default_backend() != "tpu"
    assert default_frl_microbatch_cap() is None


@pytest.fixture(scope="module")
def frl_parts():
    from forest_tpu.data.bindings import parse_bindings
    from forest_tpu.data.cube_v2 import (synthetic_bindings,
                                         synthetic_feature_stats)
    from forest_tpu.data.feature_builder import FeatureBuilder
    from forest_tpu.models import representation as rep
    from forest_tpu.training.representation import (config_builders as cb,
                                                    step as step_mod,
                                                    train_step as ts)

    bindings = parse_bindings(synthetic_bindings("/dev/null", "/dev/null"))
    fb = FeatureBuilder(bindings, synthetic_feature_stats(bindings))
    model = rep.RepresentationModel(
        type_in_channels=4, phase_in_channels=3, z_type_dim=8,
        type_encoder_channels=(16, 8), z_phase_dim=3,
        phase_tcn_channels=(12, 12), phase_tcn_dilations=(1, 2))
    t, hw = 15, 32
    params = rep.init_variables(model, jax.random.key(0),
                                num_timesteps=t)["params"]
    process = step_mod.make_process_batch(
        model, fb, cb.build_sampler(bindings, {}),
        cb.build_step_config(bindings, {}), hw)
    opt = ts.make_optimizer(1e-3)
    weights = {k: jnp.float32(v)
               for k, v in step_mod.DEFAULT_WEIGHTS.items()}
    cur = {"input_dropout_rate": jnp.float32(0.0),
           "min_gate": jnp.float32(0.0)}
    return dict(model=model, fb=fb, params=params, process=process, opt=opt,
                weights=weights, cur=cur, t=t, hw=hw, ts=ts,
                step_mod=step_mod, cb=cb, bindings=bindings)


def _batch(parts, b, seed=0):
    from forest_tpu.data.cube_v2 import synthetic_frl_batch
    rng = np.random.default_rng(seed)
    return {k: jnp.asarray(v)
            for k, v in synthetic_frl_batch(rng, b, parts["hw"],
                                            parts["t"]).items()}


def test_microbatch_equals_manual_accumulation(frl_parts):
    """microbatch_size=2 over B=4 must reproduce manual 2-group grad
    accumulation: same averaged grads -> same optimizer update, same loss,
    same metrics (counts summed, floats averaged).

    Parity is checked through an SGD optimizer so the param delta is
    LINEAR in the gradient (delta = -lr * g_avg) -- Adam's ~sign(g)
    normalization amplifies float-order noise on near-zero grads into
    full sign flips, which is optimizer behavior, not an accumulation
    bug (losses agree to 1e-6 under both optimizers)."""
    p = frl_parts
    ts = p["ts"]
    batch = _batch(p, 4)
    rng = jax.random.key(11)

    import optax
    lr = 1e-2
    sgd = optax.sgd(lr)

    step_mb = jax.jit(ts.make_train_step(p["process"], sgd,
                                         microbatch_size=2))
    state0 = ts.init_train_state(p["params"], sgd)
    new_mb, m_mb = step_mb(state0, batch, rng, p["weights"], p["cur"])

    # Manual accumulation mirroring the documented contract.
    def loss_fn(params, mb, mrng):
        return p["process"](params, mb, mrng, p["weights"], p["cur"], True)

    grads_acc, losses, metric_list = None, [], []
    for i in range(2):
        mb = {k: v[2 * i:2 * i + 2] for k, v in batch.items()}
        (loss_i, m_i), g_i = jax.value_and_grad(loss_fn, has_aux=True)(
            p["params"], mb, jax.random.fold_in(rng, i))
        losses.append(loss_i)
        metric_list.append(m_i)
        grads_acc = g_i if grads_acc is None else jax.tree.map(
            jnp.add, grads_acc, g_i)
    grads = jax.tree.map(lambda x: x * 0.5, grads_acc)
    loss = (losses[0] + losses[1]) * 0.5

    np.testing.assert_allclose(float(m_mb["loss_total"]), float(loss),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m_mb["grad_norm"]),
                               float(optax.global_norm(grads)), rtol=1e-4)
    # Implied averaged grads from the SGD update: g = (old - new) / lr.
    flat_old = jax.tree_util.tree_leaves(state0.params)
    flat_new = jax.tree_util.tree_leaves(new_mb.params)
    flat_g = jax.tree_util.tree_leaves(grads)
    gscale = float(optax.global_norm(grads))
    for old, new, g_ref in zip(flat_old, flat_new, flat_g):
        implied = (np.asarray(old) - np.asarray(new)) / lr
        np.testing.assert_allclose(implied, np.asarray(g_ref),
                                   rtol=2e-3, atol=1e-5 * max(gscale, 1.0))

    # Metric aggregation rule: ints sum, floats equal-weight mean.
    for k, v in m_mb.items():
        if k in ("grad_norm", "skipped"):
            continue
        v0, v1 = metric_list[0][k], metric_list[1][k]
        if jnp.issubdtype(v.dtype, jnp.inexact):
            expect = (float(v0) + float(v1)) / 2
            np.testing.assert_allclose(float(v), expect, rtol=1e-5,
                                       atol=1e-6, err_msg=k)
        else:
            assert int(v) == int(v0) + int(v1), k


def test_microbatch_zero_disables(frl_parts):
    """microbatch_size=0 must force the plain full-batch path: identical
    result to the default CPU step (auto-cap None)."""
    p = frl_parts
    ts = p["ts"]
    batch = _batch(p, 4, seed=3)
    rng = jax.random.key(2)
    s_plain = jax.jit(ts.make_train_step(p["process"], p["opt"]))
    s_zero = jax.jit(ts.make_train_step(p["process"], p["opt"],
                                        microbatch_size=0))
    st = ts.init_train_state(p["params"], p["opt"])
    _, m_a = s_plain(st, batch, rng, p["weights"], p["cur"])
    st = ts.init_train_state(p["params"], p["opt"])
    _, m_b = s_zero(st, batch, rng, p["weights"], p["cur"])
    assert float(m_a["loss_total"]) == float(m_b["loss_total"])


def test_microbatch_nan_containment(frl_parts):
    """A poisoned sample inside ONE microbatch: per-sample containment
    must hold (samples_skipped counts it), the batch-level skip must stay
    quiet, and params must still move."""
    p = frl_parts
    ts, step_mod, cb = p["ts"], p["step_mod"], p["cb"]
    fb = p["fb"]
    batch = _batch(p, 4, seed=5)
    orig_build = fb.build_feature

    def poisoned_build(name, b):
        x, msk = orig_build(name, b)
        if name == "type_encoder_input" and x.ndim == 4 and x.shape[0] == 2:
            x = x.at[1].set(jnp.inf)  # sample 1 of EVERY 2-sample microbatch
        return x, msk

    fb.build_feature = poisoned_build
    try:
        process_p = step_mod.make_process_batch(
            p["model"], fb, cb.build_sampler(p["bindings"], {}),
            cb.build_step_config(p["bindings"], {}), p["hw"])
        step = jax.jit(ts.make_train_step(process_p, p["opt"],
                                          microbatch_size=2))
        st = ts.init_train_state(p["params"], p["opt"])
        new_st, m = step(st, batch, jax.random.key(9), p["weights"],
                         p["cur"])
    finally:
        fb.build_feature = orig_build
    assert int(m["samples_skipped"]) == 2  # one per microbatch, summed
    assert int(m["skipped"]) == 0
    assert np.isfinite(float(m["loss_total"]))
    moved = jax.tree_util.tree_reduce(
        lambda acc, pq: acc + float(jnp.sum(jnp.abs(pq))),
        jax.tree.map(lambda a, b: a - b, new_st.params, st.params), 0.0)
    assert moved > 0.0
