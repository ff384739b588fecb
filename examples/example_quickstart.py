"""Quickstart: both pipelines end-to-end on synthetic cubes in a temp dir.

1. Legacy VQ-VAE pipeline: cube -> schema -> train -> export codebook.
2. FRL pipeline: v2 cube -> stats -> train -> linear probe.

Run: python examples/example_quickstart.py [--epochs 2]
"""
import argparse
import tempfile
from pathlib import Path


def vqvae_quickstart(root: Path, epochs: int):
    from forest_tpu.data.cube import build_synthetic_cube
    from forest_tpu.eval import export_codebook
    from forest_tpu.training import train_vqvae

    print("== VQ-VAE pipeline ==")
    build_synthetic_cube(root / "cube.zarr", height=96, width=96,
                         chunk_yx=32, patch_size=32)
    cfg = train_vqvae.load_config(None, {})
    cfg.update(zarr=str(root / "cube.zarr"), run_dir=str(root / "run"),
               epochs=epochs, steps_per_epoch=10, batch_size=64,
               num_workers=4, block_size=(1, 1), min_hits_per_epoch=1,
               emb_dim=32, hidden=32, codebook_size=32, val_steps=2)
    train_vqvae.train(cfg)
    out = export_codebook.export(cfg["zarr"], cfg["run_dir"])
    print(f"codebook exported -> {out}")


def frl_quickstart(root: Path, epochs: int):
    import yaml

    from forest_tpu.data.cube_v2 import (build_synthetic_v2_cube,
                                         synthetic_bindings)
    from forest_tpu.eval import frozen, linear_probe as lp
    from forest_tpu.training import train_representation as tr
    from forest_tpu.training.representation.training_config import (
        parse_training_config)

    print("== FRL pipeline ==")
    build_synthetic_v2_cube(root / "v2.zarr", height=96, width=96,
                            chunk_yx=32)
    bpath = root / "bindings.yaml"
    bpath.write_text(yaml.safe_dump(synthetic_bindings(
        root / "v2.zarr", root / "stats.json")))
    cfg = parse_training_config({
        "run": {"experiment_name": "quickstart",
                "run_root": str(root / "runs")},
        "training": {"epoch": {"num_epochs": epochs, "mode": "full",
                               "batch_size": 4}},
        "optimizer": {"lr": 1e-3},
        "scheduler": {"warmup_epochs": 0, "phase_rewarmup": False},
        "spatial_domain": {"patch_size": 32, "split_block_size": [1, 1]},
        "hardware": {"num_workers": 2}})
    model_cfg = {"version": "4", "model": {
        "z_type_dim": 8, "z_phase_dim": 3,
        "type_encoder": {"channels": [16, 8]},
        "phase_tcn": {"channels": [12, 12], "dilations": [1, 2]}}}
    result = tr.train(cfg, str(bpath), model_cfg, max_batches=3)
    enc_t, _, _ = frozen.make_encode_fns(result["model"],
                                         result["state"].params,
                                         result["fb"])
    probe = lp.fit_linear_probe(enc_t, result["fb"], result["ds_train"],
                                result["ds_val"],
                                "infonce_type_spectral",
                                max_batches_train=3, max_batches_eval=2,
                                batch_size=2)
    print(f"probe R2 (val): {probe['r2_val']}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=1)
    a = ap.parse_args()
    root = Path(tempfile.mkdtemp(prefix="forest_tpu_quickstart_"))
    print(f"workdir: {root}")
    vqvae_quickstart(root / "vq", a.epochs)
    frl_quickstart(root / "frl", a.epochs)
    print("quickstart OK")
