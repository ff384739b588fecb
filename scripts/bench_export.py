"""Dense embedding export throughput bench (VERDICT round-1 weak #8).

Builds a synthetic v2 cube, loads a randomly-initialized encoder, and times
export_embeddings end-to-end (decode + device compute + zarr writeback).
Reports patches/s and ms/patch. Compare against the round-1 baseline of
~1.6 s/patch (host-bound decode+assembly).

Usage: python scripts/bench_export.py [--height 1024] [--patch 256]
"""
from __future__ import annotations

# Containers can lose the editable install between rounds; make the
# repo-root import work regardless of pip state.
import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))

import argparse
import sys
import tempfile
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args(argv)

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from forest_tpu.data.bindings import parse_bindings
    from forest_tpu.data.cube_v2 import (build_synthetic_v2_cube,
                                         synthetic_bindings,
                                         synthetic_feature_stats)
    from forest_tpu.data.feature_builder import FeatureBuilder
    from forest_tpu.data.frl_dataset import ForestDatasetV2
    from forest_tpu.eval import frozen
    from forest_tpu.eval.export_embeddings import export_embeddings
    from forest_tpu.models import representation as rep

    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        build_synthetic_v2_cube(f"{td}/cube.zarr", height=a.height,
                                width=a.height)
        log(f"cube {a.height}^2 built in {time.perf_counter() - t0:.1f}s")
        bindings = parse_bindings(
            synthetic_bindings(f"{td}/cube.zarr", "/dev/null"))
        fb = FeatureBuilder(bindings, synthetic_feature_stats(bindings))
        model = rep.RepresentationModel(
            type_in_channels=4, phase_in_channels=3, z_type_dim=16,
            type_encoder_channels=(32, 16), z_phase_dim=4,
            phase_tcn_channels=(16, 16), phase_tcn_dilations=(1, 2))
        params = rep.init_variables(
            model, jax.random.key(0),
            num_timesteps=bindings.time_window.num_years)["params"]
        enc_t, _, _ = frozen.make_encode_fns(model, params, fb)
        ds = ForestDatasetV2(bindings, split=None, patch_size=a.patch)
        n = len(ds.patches)
        log(f"{n} patches of {a.patch}^2 on {jax.default_backend()}")

        # compile + warm
        export_embeddings(enc_t, ds, f"{td}/warm.zarr", z_dim=16,
                          batch_size=a.batch_size,
                          needed_features=["type_encoder_input"])
        t0 = time.perf_counter()
        export_embeddings(enc_t, ds, f"{td}/emb.zarr", z_dim=16,
                          batch_size=a.batch_size,
                          needed_features=["type_encoder_input"])
        dt = time.perf_counter() - t0
        pps = n / dt
        log(f"export: {dt:.2f}s total")
        print(f"export_patches_per_sec={pps:.2f} ms_per_patch="
              f"{1000 / pps:.1f}")


if __name__ == "__main__":
    main()
