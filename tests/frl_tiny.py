"""Tiny FRL training assembly shared by the multi-host child process and
test_multihost.py's single-process comparison (NOT a test module)."""
from types import SimpleNamespace

import numpy as np


def make_frl_parts(t: int = 15, hw: int = 32):
    """Deterministic tiny FRL model + jit-ready process_batch + optimizer
    state (same construction as __graft_entry__._dryrun_frl_multichip)."""
    import jax
    import jax.numpy as jnp

    from forest_tpu.data.bindings import parse_bindings
    from forest_tpu.data.cube_v2 import (synthetic_bindings,
                                         synthetic_feature_stats)
    from forest_tpu.data.feature_builder import FeatureBuilder
    from forest_tpu.models import representation as rep
    from forest_tpu.training.representation import (config_builders as cb,
                                                    step as step_mod,
                                                    train_step as ts)

    bindings = parse_bindings(synthetic_bindings("/dev/null", "/dev/null"))
    stats = synthetic_feature_stats(bindings)
    fb = FeatureBuilder(bindings, stats)
    model = rep.RepresentationModel(
        type_in_channels=4, phase_in_channels=3, z_type_dim=8,
        type_encoder_channels=(16, 8), z_phase_dim=3,
        phase_tcn_channels=(12, 12), phase_tcn_dilations=(1, 2))
    params = rep.init_variables(model, jax.random.key(0),
                                num_timesteps=t)["params"]
    cfg = cb.build_step_config(bindings, {})
    sampler = cb.build_sampler(bindings, {})
    process = step_mod.make_process_batch(model, fb, sampler, cfg, hw)
    opt = ts.make_optimizer(1e-3)
    state = ts.init_train_state(params, opt)
    weights = {k: jnp.float32(v)
               for k, v in step_mod.DEFAULT_WEIGHTS.items()}
    curriculum = {"input_dropout_rate": jnp.float32(0.05),
                  "min_gate": jnp.float32(0.0)}
    return SimpleNamespace(process=process, opt=opt, state=state,
                           weights=weights, curriculum=curriculum,
                           t=t, hw=hw)


class FakeFrlDataset:
    """Index-deterministic synthetic FRL dataset: every process loading the
    same index produces the same row, so per-process slices of a global
    batch reassemble to the single-process batch exactly."""

    def __init__(self, n: int = 10, hw: int = 32, t: int = 15):
        self.n, self.hw, self.t = n, hw, t

    def on_epoch_start(self):
        pass

    def __len__(self):
        return self.n

    def load_batch(self, idxs):
        from forest_tpu.data.cube_v2 import synthetic_frl_batch
        rows = [synthetic_frl_batch(np.random.default_rng(1000 + int(i)),
                                    1, self.hw, self.t) for i in idxs]
        return {k: np.concatenate([r[k] for r in rows]) for k in rows[0]}


def run_tiny_frl_epoch(mesh, n: int = 10, batch_size: int = 8):
    """One run_epoch over the mesh; returns (metrics, param_checksum)."""
    import jax

    from forest_tpu.parallel import make_dp_frl_step
    from forest_tpu.training.representation import loops

    parts = make_frl_parts()
    step = make_dp_frl_step(parts.process, parts.opt, mesh)
    ds = FakeFrlDataset(n=n, hw=parts.hw, t=parts.t)
    state, m = loops.run_epoch(
        ds, step, parts.state, batch_size=batch_size,
        weights=parts.weights, curriculum=parts.curriculum, rng_seed=7,
        train=True, num_workers=1, mesh=mesh)
    checks = jax.tree.map(lambda x: float(np.sum(np.abs(np.asarray(x)))),
                          state.params)
    return m, float(sum(jax.tree.leaves(checks)))
