"""End-to-end demo: the reference's VERBATIM cube YAML -> forest-tpu.

Pipeline: synthesize every source `zarr_builder/va_vae_dataset_test.yaml`
references -> build the cube through the reference-schema builder
(data/build_zarr_v2.py, UNMODIFIED YAML, scaled grid) -> bind its real
hierarchical arrays (topo + ccdc-history statics, ccdc_annual temporal
series, lcms ysfc, soils masks, EVT) into FRL features/losses -> train
the representation model on the current backend -> write
docs/reference_cube_demo.md with the loss trajectory.

Run (TPU): python scripts/demo_reference_cube.py --epochs 3
CPU CI smoke: FOREST_TPU_BENCH_PLATFORM=cpu ... --scale 64 --epochs 1
"""
from __future__ import annotations

import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))

import argparse
import json
import os
import time
from pathlib import Path

REF_YAML = Path("/root/reference/zarr_builder/va_vae_dataset_test.yaml")


def demo_bindings(zarr_path: Path, stats_file: Path) -> dict:
    """FRL bindings over the va_vae_dataset_test cube's real arrays."""
    return {
        "version": "1.0", "name": "va_test_cube_demo",
        "zarr": {"path": str(zarr_path), "structure": "hierarchical"},
        "time_window": {"start": 2010, "end": 2024},
        "stats": {"compute": "if-not-exists", "file": str(stats_file),
                  "stats": ["mean", "sd", "min", "max", "q02", "q25",
                            "q50", "q75", "q98"],
                  "covariance": True,
                  "samples": {"n": 8, "reservoir_size": 50_000},
                  "mask": ["static_mask.aoi"]},
        "dataset": {
            "static_mask": {
                "type": "uint8", "dim": ["C", "H", "W"],
                "channels": [
                    {"name": "aoi", "source": "aoi"},
                    {"name": "dem_mask",
                     "source": "static/soils_masks/mask/dem_mask"},
                ]},
            "static": {
                "type": "float32", "dim": ["C", "H", "W"],
                "channels": [
                    {"name": "elevation",
                     "source": "static/topo/data/elevation"},
                    {"name": "slope", "source": "static/topo/data/slope_deg"},
                    {"name": "northness",
                     "source": "static/topo/data/northness"},
                    {"name": "mean_ndvi",
                     "source": "static/ccdc_metrics_history/data/mean_ndvi"},
                    {"name": "mean_nbr",
                     "source": "static/ccdc_metrics_history/data/mean_nbr"},
                    {"name": "variance_ndvi", "source":
                     "static/ccdc_metrics_history/data/variance_ndvi"},
                ]},
            "static_categorical": {
                "type": "int16", "dim": ["C", "H", "W"],
                "channels": [{"name": "evt",
                              "source": "static/evt/data/evt",
                              "fill_value": -1}]},
            "annual": {
                "type": "float32", "dim": ["C", "T", "H", "W"],
                "channels": [
                    {"name": "ndvi",
                     "source": "annual/ccdc_annual/data/ndvi"},
                    {"name": "nbr",
                     "source": "annual/ccdc_annual/data/nbr"},
                    {"name": "ndmi",
                     "source": "annual/ccdc_annual/data/ndmi"},
                    {"name": "ysfc", "source":
                     "annual/lcms_ysfc/data/lcms_ysfc_value_1985_2024"},
                    {"name": "tpos", "formula": "temporal_position"},
                ]},
        },
        "features": {
            "type_encoder_input": {
                "dim": ["C", "H", "W"],
                "channels": {
                    "static.elevation": {"mask": "static_mask.dem_mask",
                                         "norm": "zscore"},
                    "static.slope": {"mask": "static_mask.dem_mask",
                                     "norm": "zscore"},
                    "static.northness": {"norm": "zscore"},
                    "static.mean_ndvi": {"norm": "robust_iqr"},
                }},
            "infonce_type_spectral": {
                "dim": ["C", "H", "W"],
                "channels": {
                    "static.mean_ndvi": {"norm": "zscore"},
                    "static.mean_nbr": {"norm": "zscore"},
                    "static.variance_ndvi": {"norm": "zscore"},
                },
                "covariance": {"calculate": True,
                               "stat_domain": "patch"}},
            "phase_ccdc": {
                "dim": ["C", "T", "H", "W"],
                "channels": {
                    "annual.ndvi": {"norm": "zscore"},
                    "annual.nbr": {"norm": "zscore"},
                    "annual.tpos": {"norm": "identity"},
                },
                "covariance": {"calculate": True,
                               "stat_domain": "patch"}},
            "ysfc": {"dim": ["C", "T", "H", "W"],
                     "channels": {"annual.ysfc": {"norm": "identity"}}},
        },
        "sampling-strategy": {
            "grid-plus-supplement": {
                "grid": {"stride": 8, "exclude_border": 4,
                         "jitter": {"radius": 2}},
                "supplement": {"n": 16, "sampling": {
                    "type": "weighted",
                    "weight_by": ["static_mask.aoi"]}}},
        },
        "losses": {
            "infonce_type_spatial": {
                "type": "infonce", "feature": "infonce_type_spectral",
                "sampling_strategy": "grid-plus-supplement",
                "temperature": 0.2, "similarity": "l2",
                "knn_k": 4, "knn_max_radius": 8,
                "neg_min_distance": 16.0, "neg_per_anchor": 4,
                "spectral_sigma": 2.0},
            "phase_neighborhood": {
                "type": "phase_neighborhood", "feature": "phase_ccdc",
                "ysfc_feature": "ysfc", "k": 8, "min_overlap": 2,
                "min_pairs": 2, "sigma": 5.0, "tau_ref": 0.1,
                "tau_learned": 0.1},
        },
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default=None)
    ap.add_argument("--scale", type=int, default=16,
                    help="grid coarsening of the 4096^2 config (16 -> "
                         "256^2 cube)")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--report", default="docs/reference_cube_demo.md")
    a = ap.parse_args(argv)

    if os.environ.get("FOREST_TPU_BENCH_PLATFORM"):
        import jax as _jax
        _jax.config.update("jax_platforms",
                           os.environ["FOREST_TPU_BENCH_PLATFORM"])
    import jax
    import yaml

    from forest_tpu.data import build_zarr_v2 as bz
    from forest_tpu.training import train_representation as tr
    from forest_tpu.training.representation.training_config import (
        parse_training_config)
    from forest_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    root = Path(a.root) if a.root else Path("/tmp/ref_cube_demo")
    root.mkdir(parents=True, exist_ok=True)
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    t0 = time.perf_counter()
    cfg = bz.load_config(REF_YAML)
    n_src = len(bz.synthesize_sources(cfg, root, scale=a.scale))
    t_synth = time.perf_counter() - t0
    t0 = time.perf_counter()
    bz.build(cfg, path_root=root, scale=a.scale)
    t_build = time.perf_counter() - t0
    zarr_path = bz.PathResolver(root).map(
        cfg["dataset"]["out_zarr"]["path"])
    print(f"synthesized {n_src} sources ({t_synth:.1f}s); built "
          f"{zarr_path.name} ({t_build:.1f}s)")

    bpath = root / "bindings.yaml"
    bpath.write_text(yaml.safe_dump(
        demo_bindings(zarr_path, root / "stats.json")))
    tcfg = parse_training_config({
        "run": {"experiment_name": "ref_cube_demo",
                "run_root": str(root / "runs"),
                "checkpoint": {"save_top_k": 1,
                               "save_every_n_epochs": 1}},
        "training": {"epoch": {"num_epochs": a.epochs, "mode": "full",
                               "batch_size": a.batch}},
        "optimizer": {"lr": 1e-3},
        "scheduler": {"warmup_epochs": 0, "phase_rewarmup": False},
        "spatial_domain": {"patch_size": a.patch,
                           "split_block_size": [1, 1]},
        "hardware": {"num_workers": 2},
    })
    model_cfg = {"version": "4", "model": {
        "z_type_dim": 16, "z_phase_dim": 4,
        "type_encoder": {"channels": [32, 16]},
        "phase_tcn": {"channels": [16, 16], "dilations": [1, 2]}}}
    t0 = time.perf_counter()
    result = tr.train(tcfg, str(bpath), model_cfg)
    t_train = time.perf_counter() - t0
    hist = result["history"]
    first, last = hist[0], hist[-1]
    print(f"train: {a.epochs} epochs in {t_train:.1f}s; loss "
          f"{first['train/loss_total']:.3f} -> "
          f"{last['train/loss_total']:.3f}")

    report = Path(a.report)
    report.parent.mkdir(parents=True, exist_ok=True)
    lines = [
        "# Verbatim reference cube YAML -> forest-tpu training",
        "",
        f"- config: `{REF_YAML}` (UNMODIFIED; grid scaled {a.scale}x "
        f"-> {4096 // a.scale}^2)",
        f"- backend: {jax.default_backend()} {jax.devices()}",
        f"- sources synthesized: {n_src} files in {t_synth:.1f}s",
        f"- cube built by data/build_zarr_v2.py in {t_build:.1f}s "
        f"(117 variables, AOI-masked stats embedded + sidecars)",
        f"- FRL training: {a.epochs} epochs, B={a.batch}, "
        f"patch {a.patch}, {t_train:.1f}s wall",
        "",
        "",
        "Early epochs ramp the loss-weight/gate curricula (min_gate "
        "anneals open, tau is learned), so the total typically RISES "
        "through the ramp before descending -- compare post-ramp epochs.",
        "",
        "| epoch | train loss | val loss |",
        "|---|---|---|",
    ]
    for i, h in enumerate(hist):
        lines.append(f"| {i} | {h['train/loss_total']:.4f} | "
                     f"{h.get('val/loss_total', float('nan')):.4f} |")
    report.write_text("\n".join(lines) + "\n")
    print(f"wrote {report}")
    (root / "result.json").write_text(json.dumps(
        {"epochs": a.epochs,
         "loss_first": float(first["train/loss_total"]),
         "loss_last": float(last["train/loss_total"]),
         "t_train_s": t_train}))


if __name__ == "__main__":
    main()
