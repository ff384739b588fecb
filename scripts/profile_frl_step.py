"""Capture a jax.profiler trace of the production FRL step on TPU and print
an op-level time breakdown (top self-time HLO ops) using xprof's converters.

Run: python scripts/profile_frl_step.py [--batch 12] [--steps 5]
Diagnostics to stderr; the breakdown table to stdout.
"""
from __future__ import annotations

# Containers can lose the editable install between rounds; make the
# repo-root import work regardless of pip state.
import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))

import argparse
import glob
import json
import sys
import tempfile


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--logdir", default=None)
    a = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from forest_tpu.data.bindings import parse_bindings
    from forest_tpu.data.cube_v2 import (synthetic_bindings,
                                         synthetic_feature_stats,
                                         synthetic_frl_batch)
    from forest_tpu.data.feature_builder import FeatureBuilder
    from forest_tpu.models import representation as rep
    from forest_tpu.training.representation import (config_builders as cb,
                                                    step as step_mod,
                                                    train_step as ts)

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    bindings = parse_bindings(synthetic_bindings("/dev/null", "/dev/null"))
    bindings.sampling_strategies["grid-plus-supplement"] = {
        "grid": {"stride": 16, "exclude_border": 16,
                 "jitter": {"radius": 4}},
        "supplement": {"n": 104, "sampling": {
            "type": "weighted",
            "weight_by": ["static_mask.aoi", "static_mask.forest"]}},
    }
    fb = FeatureBuilder(bindings, synthetic_feature_stats(bindings))
    model = rep.RepresentationModel(
        type_in_channels=4, phase_in_channels=3, z_type_dim=48,
        type_encoder_channels=(128, 48), z_phase_dim=8,
        phase_tcn_channels=(64, 64, 64), phase_tcn_dilations=(1, 2, 4),
        spatial_conv_compute_dtype="bfloat16",
        spatial_conv_use_pallas=False if a.no_pallas else None)
    t, hw, b = 15, a.patch, a.batch
    params = rep.init_variables(model, jax.random.key(0),
                                num_timesteps=t)["params"]
    process = step_mod.make_process_batch(
        model, fb, cb.build_sampler(bindings, {}),
        cb.build_step_config(bindings, {}), hw)
    opt = ts.make_optimizer(1e-4)
    state = ts.init_train_state(params, opt)
    step = jax.jit(ts.make_train_step(process, opt), donate_argnums=0)

    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_frl_batch(rng, b, hw, t).items()}
    weights = {k: jnp.float32(v)
               for k, v in step_mod.DEFAULT_WEIGHTS.items()}
    cur = {"input_dropout_rate": jnp.float32(0.05),
           "min_gate": jnp.float32(0.0)}

    # compile outside the trace
    state, m = step(state, batch, jax.random.key(0), weights, cur)
    jax.block_until_ready(m["loss_total"])
    print("compiled; tracing...", file=sys.stderr)

    logdir = a.logdir or tempfile.mkdtemp(prefix="frl_trace_")
    with jax.profiler.trace(logdir):
        for i in range(a.steps):
            state, m = step(state, batch, jax.random.key(i), weights, cur)
        jax.block_until_ready(m["loss_total"])

    xplanes = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    print(f"trace at {logdir}: {len(xplanes)} xplane file(s)",
          file=sys.stderr)
    if not xplanes:
        sys.exit(1)

    from xprof.convert import raw_to_tool_data as rtd

    # op_profile gives HLO-level nodes WITH shape expressions (gviz JSON).
    data, _ = rtd.xspace_to_tool_data(xplanes, "op_profile", {})
    d = json.loads(data if isinstance(data, str) else data.decode())
    root = d["byProgramExcludeIdle"]

    def walk(n):
        out = []
        m = n.get("metrics", {})
        expr = n.get("xla", {}).get("expression", "")
        if expr:
            out.append((m.get("rawTime", 0), n.get("name", ""), expr))
        for c in n.get("children", []):
            out.extend(walk(c))
        return out

    leaves = sorted(walk(root), reverse=True)
    tot_ps = root["metrics"]["rawTime"]
    print(json.dumps({"device_ms_per_step": tot_ps / a.steps / 1e9}))
    for t, nm, expr in leaves[:a.top]:
        print(f"{t/a.steps/1e9:8.2f} ms/step {t/tot_ps*100:5.1f}%  "
              f"{nm[:36]:36.36} {expr[:120]}")


if __name__ == "__main__":
    main()
