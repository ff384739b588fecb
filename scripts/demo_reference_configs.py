"""Verbatim-reference-config migration demo (TPU).

Runs the COMPLETE FRL path with the UNMODIFIED reference YAMLs
(/root/reference/frl/config/frl_{binding,repr_model,training}_v1.yaml):

  1. a synthetic cube is generated to satisfy every binding source
     (build_cube_for_bindings; ZARR_ROOT -> --work-dir),
  2. train() runs from the verbatim configs -- every semantic choice
     (features, normalization presets + parameterized transforms, losses,
     curricula, sampling strategy, model architecture) comes from the
     reference files; only operational knobs are overridden and LOGGED
     (run_root; epochs/split-block for wall-clock on a small cube),
  3. the phase probe and figure sheets drive the frozen-encoder eval tail,
  4. loss curves + probe metrics land in docs/reference_config_demo.md.

Usage (TPU): python scripts/demo_reference_configs.py \
    --work-dir /tmp/refdemo --size 1024 --epochs 4
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
# Containers can lose the editable install between rounds; make the
# repo-root import work regardless of pip state.
sys.path.insert(0, str(REPO))
REF = Path("/root/reference/frl/config")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--size", type=int, default=1024,
                    help="cube height=width (1024 -> 16 patches of 256^2)")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--num-workers", type=int, default=4)
    ap.add_argument("--doc", default=str(REPO / "docs"
                                         / "reference_config_demo.md"))
    ap.add_argument("--skip-eval", action="store_true")
    a = ap.parse_args(argv)

    work = Path(a.work_dir)
    work.mkdir(parents=True, exist_ok=True)
    os.environ["ZARR_ROOT"] = str(work)

    from forest_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()

    import yaml

    from forest_tpu.data.bindings import parse_bindings
    from forest_tpu.data.cube_v2 import build_cube_for_bindings
    from forest_tpu.training import train_representation as tr
    from forest_tpu.training.representation.training_config import (
        parse_training_config)

    overrides = {}
    t0 = time.time()
    bindings = parse_bindings(REF / "frl_binding_v1.yaml")
    cube_path = Path(bindings.zarr_path)
    if not cube_path.exists():
        print(f"[demo] building {a.size}^2 cube for the verbatim binding "
              f"at {cube_path} ...", flush=True)
        build_cube_for_bindings(bindings, cube_path, height=a.size,
                                width=a.size, chunk_yx=256)
    print(f"[demo] cube ready in {time.time() - t0:.0f}s", flush=True)

    cfg = parse_training_config(str(REF / "frl_training_v1.yaml"))
    # Operational overrides only -- recorded in the doc:
    cfg.run.run_root = str(work / "runs")
    overrides["run_root"] = cfg.run.run_root
    cfg.epoch.num_epochs = a.epochs
    overrides["num_epochs"] = a.epochs
    cfg.epoch.mode = "full"
    overrides["epoch.mode"] = "full (cube has %d patches total)" % (
        (a.size // cfg.spatial_domain.patch_size) ** 2)
    cfg.spatial_domain.split_block_size = (1, 1)
    overrides["split_block_size"] = "(1,1) -- checkerboard at patch "\
        "granularity so the small demo cube has train AND val patches"
    cfg.spatial_domain.debug_window = None
    cfg.hardware.num_workers = a.num_workers
    overrides["num_workers"] = a.num_workers
    cfg.scheduler.warmup_epochs = min(
        cfg.scheduler.warmup_epochs, max(a.epochs // 2, 1))
    overrides["warmup_epochs"] = cfg.scheduler.warmup_epochs
    # phase curriculum: the verbatim start epoch (~20) never arrives in a
    # short demo; pull it in so the phase losses actually train.
    ps = cfg.curriculum.get("phase_start_epoch")
    if ps is not None and ps >= a.epochs:
        cfg.curriculum["phase_start_epoch"] = max(a.epochs // 2, 1)
        overrides["phase_start_epoch"] = cfg.curriculum["phase_start_epoch"]
    for k in ("smoothing_freeze_until", "freeze_until_epoch"):
        if cfg.curriculum.get(k, 0) and cfg.curriculum[k] >= a.epochs:
            cfg.curriculum[k] = max(a.epochs // 4, 1)
            overrides[k] = cfg.curriculum[k]

    model_cfg = yaml.safe_load((REF / "frl_repr_model_v1.yaml").read_text())
    print(f"[demo] training {a.epochs} epochs from the verbatim configs "
          f"(overrides: {overrides})", flush=True)
    t0 = time.time()
    result = tr.train(cfg, str(REF / "frl_binding_v1.yaml"), model_cfg,
                      max_batches=a.max_batches)
    train_wall = time.time() - t0
    hist = result["history"]
    print(f"[demo] trained in {train_wall:.0f}s; loss "
          f"{hist[0]['train/loss_total']:.3f} -> "
          f"{hist[-1]['train/loss_total']:.3f}", flush=True)

    ckpt = (cfg.run.experiment_dir / cfg.run.ckpt_dir
            / "encoder_last.msgpack")
    probe_json, figs = None, []
    if not a.skip_eval:
        from forest_tpu.eval import phase_probe, visualize
        probe_out = work / "phase_probe.json"
        try:
            phase_probe.main([
                "--checkpoint", str(ckpt),
                "--bindings", str(REF / "frl_binding_v1.yaml"),
                "--split-block-size", "1", "1", "--max-batches", "4",
                "--output", str(probe_out)])
            probe_json = json.loads(probe_out.read_text()) \
                if probe_out.exists() else None
        except SystemExit:
            pass
        except Exception as e:  # eval tail is best-effort in the demo
            print(f"[demo] phase probe failed: {e}", file=sys.stderr)
        figdir = work / "figures"
        try:
            visualize.main([
                "--checkpoint", str(ckpt),
                "--bindings", str(REF / "frl_binding_v1.yaml"),
                "--out", str(figdir), "--split", "val",
                "--split-block-size", "1", "1", "--n", "2"])
            figs = sorted(p.name for p in figdir.glob("*.png"))
        except Exception as e:
            print(f"[demo] visualize failed: {e}", file=sys.stderr)

    # ---- write the doc ----------------------------------------------------
    import jax
    lines = [
        "# Verbatim-reference-config migration demo",
        "",
        "The UNMODIFIED reference YAMLs (`frl_binding_v1.yaml`, "
        "`frl_repr_model_v1.yaml`, `frl_training_v1.yaml` from "
        "`/root/reference/frl/config/`) drove the complete forest-tpu "
        "training + eval path on a synthetic cube generated to satisfy "
        "every binding source (`build_cube_for_bindings`).",
        "",
        f"- backend: `{jax.default_backend()}` "
        f"({jax.devices()[0].device_kind})",
        f"- cube: {a.size}x{a.size}, "
        f"patch {cfg.spatial_domain.patch_size}, "
        f"batch {cfg.epoch.batch_size} (verbatim)",
        f"- wall-clock: {train_wall:.0f}s for {len(hist)} epochs",
        f"- operational overrides (semantics verbatim): "
        f"`{json.dumps(overrides)}`",
        "",
        "## Loss curves",
        "",
        "| epoch | train loss | val loss | spatial infonce | "
        "phase neighborhood | vicreg type | gate mean | grad norm |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for h in hist:
        lines.append(
            "| {epoch} | {tl:.3f} | {vl:.3f} | {si:.3f} | {pn:.3f} | "
            "{vt:.3f} | {gm:.3f} | {gn:.2f} |".format(
                epoch=h["epoch"], tl=h.get("train/loss_total", float("nan")),
                vl=h.get("val/loss_total", float("nan")),
                si=h.get("train/loss_spatial_infonce", float("nan")),
                pn=h.get("train/loss_phase_neighborhood", float("nan")),
                vt=h.get("train/loss_vicreg_type", float("nan")),
                gm=h.get("train/gate_mean", float("nan")),
                gn=h.get("train/grad_norm", float("nan"))))
    if probe_json is not None:
        lines += ["", "## Phase probe (frozen encoder)", "",
                  "```json", json.dumps(
                      {k: v for k, v in probe_json.items()
                       if not isinstance(v, (list, dict))} or probe_json,
                      indent=1, default=str)[:2000], "```"]
    if figs:
        lines += ["", f"## Figures ({len(figs)})", ""]
        lines += [f"- `{f}`" for f in figs]
    doc = Path(a.doc)
    doc.parent.mkdir(parents=True, exist_ok=True)
    doc.write_text("\n".join(lines) + "\n")
    print(f"[demo] wrote {doc}", flush=True)


if __name__ == "__main__":
    main()
