"""FRL training CLI: the primary training entry point.

The forest-tpu equivalent of /root/reference/frl/training/
train_representation.py (call stack SURVEY.md §4.1): three-file YAML config
(bindings + model + training), stats precompute if-not-exists, datasets with
the checkerboard split, the single jitted process_batch step, two-phase
cosine LR with phase re-warmup, curricula (input dropout, smoothing gate,
phase-loss ramp), CheckpointManager with auto-resume, per-epoch diagnostic
logging, artifact archival (configs + git hash).

Run:
  python -m forest_tpu.training.train_representation \
      --training configs/frl_training_v1.yaml \
      [--bindings B.yaml] [--model-config M.yaml] \
      [--num-epochs N] [--max-batches N] [--no-resume] [--profile]
"""
from __future__ import annotations

import argparse
import json
import logging
import subprocess
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from forest_tpu.data.bindings import parse_bindings
from forest_tpu.data.feature_builder import FeatureBuilder
from forest_tpu.data.frl_dataset import ForestDatasetV2
from forest_tpu.data.stats import StatsCalculator
from forest_tpu.data.windows import SpatialWindow
from forest_tpu.models import representation as rep
from forest_tpu.training.checkpointing import (CheckpointManager,
                                               load_state_raw)
from forest_tpu.training.representation import (config_builders as cb,
                                                curriculum as cur_mod,
                                                epoch_logging, loops,
                                                profiling)
from forest_tpu.training.representation import step as step_mod
from forest_tpu.training.representation import train_step as ts
from forest_tpu.training.representation.training_config import (
    TrainingConfiguration, parse_training_config)
from forest_tpu.training.scheduler import cosine_lr, two_phase_cosine_lr

log = logging.getLogger("forest_tpu.train_representation")


def _git_hash() -> str:
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "HEAD"], text=True,
            stderr=subprocess.DEVNULL).strip()
    except Exception:
        return "unknown"


def apply_mixed_precision(model_cfg: Optional[Dict[str, Any]],
                          dtype: Optional[str]) -> Dict[str, Any]:
    """Thread hardware.mixed_precision into the model config as the
    spatial-conv compute-dtype DEFAULT (the TPU-native AMP equivalent;
    the reference parses the flag but its torch loop never autocasts --
    training_config_parser.py:123-135). An explicit compute_dtype in the
    model config always wins."""
    import copy

    mc = copy.deepcopy(model_cfg) if model_cfg else {}
    if not dtype:
        return mc
    sect = mc["model"] if "model" in mc else mc
    sc = sect.setdefault("spatial_conv", {})
    sc.setdefault("compute_dtype", dtype)
    return mc


def setup(cfg: TrainingConfiguration,
          bindings_path: Optional[str] = None,
          model_cfg: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Wire every component; returns the training context dict."""
    bindings = parse_bindings(bindings_path or cfg.bindings_path)
    sd = cfg.spatial_domain
    dbg = SpatialWindow(*sd.debug_window) if sd.debug_window else None

    ds_kwargs = dict(patch_size=sd.patch_size,
                     split_block_size=sd.split_block_size,
                     min_aoi=sd.min_aoi, debug_window=dbg)

    # stats precompute (if-not-exists contract, SURVEY.md §4.6)
    stats_path = Path(bindings.stats.file)
    if bindings.stats.compute == "always" or not stats_path.exists():
        log.info("computing stats -> %s", stats_path)
        ds_all = ForestDatasetV2(bindings, split=None, **ds_kwargs)
        StatsCalculator(bindings, ds_all).compute_and_save()
    stats = json.loads(stats_path.read_text())

    ds_train = ForestDatasetV2(bindings, split="train",
                               epoch_mode=cfg.epoch.mode,
                               sample_frac=cfg.epoch.sample_frac,
                               sample_number=cfg.epoch.sample_number,
                               seed=cfg.seed, **ds_kwargs)
    ds_val = ForestDatasetV2(bindings, split="val", seed=cfg.seed,
                             **ds_kwargs)
    log.info("train patches: %d  val patches: %d",
             len(ds_train.patches), len(ds_val.patches))

    fb = FeatureBuilder(bindings, stats)
    builder_dict = cfg.as_builder_dict()
    step_cfg = cb.build_step_config(bindings, builder_dict)
    # Channel counts come from the SAME features the jitted step consumes
    # (step_cfg names them from the bindings losses section).
    type_c = len(bindings.get_feature(step_cfg.type_feature).channels)
    phase_c = len(bindings.get_feature(step_cfg.phase_feature).channels)
    model_cfg = apply_mixed_precision(model_cfg,
                                      cfg.hardware.mixed_precision_dtype)
    if cfg.hardware.mixed_precision_dtype:
        log.info("mixed precision: spatial-conv compute dtype %s",
                 model_cfg.get("model", model_cfg)["spatial_conv"]
                 ["compute_dtype"])
    model = rep.from_config(model_cfg or {}, type_c, phase_c)
    params = rep.init_variables(
        model, jax.random.key(cfg.seed),
        num_timesteps=bindings.time_window.num_years)["params"]
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    log.info("model params: %.3f M", n_params / 1e6)

    sampler = cb.build_sampler(bindings, builder_dict)
    weights = cb.build_loss_weights(builder_dict, bindings)
    curricula = cb.build_curricula(builder_dict, bindings)

    evt_tables = None
    if step_cfg.evt_enabled:
        from forest_tpu.losses.evt_soft_neighborhood import EvtDiffusionMetric
        evt_spec = bindings.losses["evt_soft_neighborhood"]
        counts = stats.get(evt_spec.get("counts_feature", ""), {}) \
            .get(step_cfg.evt_feature, {}).get("counts", {})
        metric_keys = ("min_count", "min_confusion_samples",
                       "diffusion_steps", "laplace_smoothing",
                       "binary_threshold", "max_weight")
        metric = EvtDiffusionMetric(evt_spec["confusion_csv"], counts,
                                    **{k: evt_spec[k] for k in metric_keys
                                       if k in evt_spec})
        evt_tables = step_mod.build_evt_tables(metric)

    process = step_mod.make_process_batch(model, fb, sampler, step_cfg,
                                          sd.patch_size, evt_tables,
                                          diag=cfg.diagnostics)

    # Steps per epoch reflect the EFFECTIVE epoch size under the configured
    # epoch mode -- the LR schedule and the phase re-warmup step are pinned
    # to real step counts, not the full split size.
    if cfg.epoch.mode == "number":
        epoch_size = min(cfg.epoch.sample_number, len(ds_train.patches))
    elif cfg.epoch.mode == "frac":
        epoch_size = max(int(cfg.epoch.sample_frac
                             * len(ds_train.patches)), 1)
    else:
        epoch_size = len(ds_train.patches)
    # ceil: run_epoch repeat-fills the ragged tail batch instead of
    # dropping it, so an epoch executes ceil(n/bs) optimizer steps.
    steps_per_epoch = max(-(-epoch_size // cfg.epoch.batch_size), 1)
    total_steps = cfg.epoch.num_epochs * steps_per_epoch
    phase_start = curricula["phase_start_epoch"] * steps_per_epoch
    s = cfg.scheduler
    if s.phase_rewarmup and curricula["phase_start_epoch"] > 0:
        lr_sched = two_phase_cosine_lr(
            cfg.optimizer.lr, total_steps,
            phase_start_step=phase_start + steps_per_epoch,
            rewarmup_steps=s.rewarmup_epochs * steps_per_epoch,
            min_lr=cfg.optimizer.lr * s.min_lr_factor,
            warmup_steps=s.warmup_epochs * steps_per_epoch,
            start_factor=s.start_factor, peak_factor=s.peak_factor)
    else:
        lr_sched = cosine_lr(cfg.optimizer.lr, total_steps,
                             cfg.optimizer.lr * s.min_lr_factor,
                             s.warmup_epochs * steps_per_epoch)

    optimizer = ts.make_optimizer(lr_sched, cfg.optimizer.weight_decay,
                                  cfg.optimizer.grad_clip)
    state = ts.init_train_state(params, optimizer)

    # DP over all visible devices when enabled (hardware.data_parallel);
    # multi-process jax (hosts.initialize) forces it -- the global mesh is
    # the only correct execution there (SURVEY §6.8).
    from forest_tpu.parallel import hosts
    n_dev = len(jax.devices())
    n_proc, _ = hosts.process_shard()
    mesh = None
    if (cfg.hardware.data_parallel and n_dev > 1) or n_proc > 1:
        from forest_tpu.parallel import make_dp_frl_step
        from forest_tpu.parallel.dp import make_dp_frl_eval
        if cfg.epoch.batch_size % n_dev:
            raise ValueError(
                f"epoch.batch_size {cfg.epoch.batch_size} must divide by "
                f"{n_dev} devices for data-parallel training")
        mesh = hosts.global_mesh()
        log.info("FRL data-parallel over %d devices (%d processes)",
                 n_dev, n_proc)
        train_step = make_dp_frl_step(process, optimizer, mesh)
        eval_step = make_dp_frl_eval(process, mesh)
        if n_proc > 1:
            state = hosts.replicate_pytree(
                jax.tree.map(np.asarray, state), mesh)
    else:
        train_step = jax.jit(ts.make_train_step(process, optimizer),
                             donate_argnums=0)
        eval_step = jax.jit(ts.make_eval_step(process))

    return dict(bindings=bindings, model=model, fb=fb, state=state,
                train_step=train_step, eval_step=eval_step,
                ds_train=ds_train, ds_val=ds_val, weights=weights,
                curricula=curricula, step_cfg=step_cfg,
                lr_sched=lr_sched, steps_per_epoch=steps_per_epoch,
                optimizer=optimizer, model_cfg=model_cfg or {},
                mesh=mesh)


def train(cfg: TrainingConfiguration,
          bindings_path: Optional[str] = None,
          model_cfg: Optional[Dict[str, Any]] = None,
          max_batches: Optional[int] = None,
          resume: bool = True,
          init_from: Optional[str] = None) -> Dict[str, Any]:
    exp_dir = cfg.run.experiment_dir
    exp_dir.mkdir(parents=True, exist_ok=True)
    (exp_dir / "provenance.json").write_text(json.dumps(
        {"git_hash": _git_hash(), "config": cfg.summary(),
         "time": time.strftime("%Y-%m-%dT%H:%M:%S")}, indent=1))
    # Artifact archival (train_representation.py:487-524 contract): copy
    # the exact configs into the experiment dir for reproducibility.
    arch = exp_dir / "configs"
    arch.mkdir(exist_ok=True)
    import dataclasses
    (arch / "training_resolved.json").write_text(json.dumps(
        dataclasses.asdict(cfg), indent=1, default=str))
    if model_cfg:
        (arch / "model.yaml").write_text(yaml.safe_dump(model_cfg))
    bp = bindings_path or cfg.bindings_path
    if bp and Path(bp).exists():
        (arch / "bindings.yaml").write_text(Path(bp).read_text())

    ctx = setup(cfg, bindings_path, model_cfg)
    state = ctx["state"]
    ckpt = CheckpointManager(
        exp_dir / cfg.run.ckpt_dir, prefix="encoder",
        top_k=cfg.run.checkpoint.save_top_k,
        periodic_every=cfg.run.checkpoint.save_every_n_epochs,
        monitor=cfg.run.checkpoint.monitor,
        monitor_start_epoch=cfg.run.checkpoint.monitor_start_epoch,
        mode=cfg.run.checkpoint.mode)

    start_epoch = 0
    resumed_run = False
    from forest_tpu.parallel import hosts
    n_proc, _ = hosts.process_shard()
    if resume:
        resumed = ckpt.maybe_resume(state)
        if resumed is not None:
            state, meta = resumed
            if n_proc > 1 and ctx["mesh"] is not None:
                state = hosts.replicate_pytree(
                    jax.tree.map(np.asarray, state), ctx["mesh"])
            start_epoch = int(meta.get("epoch", -1)) + 1
            resumed_run = True
            log.info("auto-resumed from epoch %d", start_epoch - 1)
    if init_from:
        # Warm-start a NEW run from a params-only checkpoint (e.g. one
        # imported from a reference .pt via utils/torch_import): params are
        # replaced, the optimizer/schedule start fresh. An auto-resumed run
        # keeps its own state -- resuming continues, init_from seeds.
        if resumed_run:
            log.warning("--init-from %s ignored: run auto-resumed from its "
                        "own checkpoint (use --no-resume or a fresh "
                        "experiment dir to warm-start)", init_from)
        else:
            raw, _ = load_state_raw(Path(init_from))
            if "params" not in raw:
                raise ValueError(f"{init_from} has no 'params' entry")
            loaded = jax.tree.map(jnp.asarray, raw["params"])
            want = jax.tree.map(lambda p: tuple(p.shape), state.params)
            got = jax.tree.map(lambda p: tuple(np.shape(p)), loaded)
            if want != got:
                raise ValueError(
                    f"--init-from {init_from} does not match the configured "
                    f"model: expected leaf shapes {want} but checkpoint has "
                    f"{got}")
            state = ts.init_train_state(loaded, ctx["optimizer"])
            if n_proc > 1 and ctx["mesh"] is not None:
                state = hosts.replicate_pytree(
                    jax.tree.map(np.asarray, state), ctx["mesh"])
            log.info("warm-started params from %s (fresh optimizer state)",
                     init_from)

    cur = ctx["curricula"]
    base_weights = ctx["weights"]
    # Groups the step compares by exact value (EVT codes): the compact
    # H2D wire must never bf16-round them, whatever the YAML named them.
    wire_skip = step_mod.wire_exact_groups(ctx["step_cfg"])
    extra_meta = {"model_version": rep.VERSION,
                  "model_config": rep.model_config_dict(ctx["model"]),
                  "type_in_channels": ctx["model"].type_in_channels,
                  "phase_in_channels": ctx["model"].phase_in_channels}

    history = []
    val_cfg = cfg.validation or {}
    val_every = val_cfg.get("val_every_n_epochs", 1)
    es_cfg = cfg.early_stopping or {}
    es_enabled = es_cfg.get("enabled", False)
    es_patience = int(es_cfg.get("patience", 15))
    es_best = float("inf")
    es_bad = 0
    monitor = cfg.run.checkpoint.monitor
    for epoch in range(start_epoch, cfg.epoch.num_epochs):
        # curricula -> traced scalars
        idr = cur_mod.compute_input_dropout_rate(
            cur["input_dropout"], epoch, cfg.epoch.num_epochs)
        min_gate = cur_mod.compute_smoothing_min_gate(
            epoch, cur["smoothing_freeze_until"],
            cur["smoothing_ramp_epochs"])
        ramp = cur_mod.ramp_weight(epoch, cur["phase_start_epoch"],
                                   cur["phase_ramp_epochs"])
        weights = {k: jnp.float32(v * (ramp if k in
                                       cur["phase_ramped_losses"] else 1.0))
                   for k, v in base_weights.items()}
        curriculum = {"input_dropout_rate": jnp.float32(idr),
                      "min_gate": jnp.float32(min_gate)}

        # --profile captures a jax.profiler trace of the FIRST trained
        # epoch (SURVEY.md §6.1's opt-in tracing).
        trace_dir = (str(exp_dir / cfg.run.log_dir / "trace")
                     if profiling.is_profiling() and epoch == start_epoch
                     else None)
        with profiling.maybe_trace(trace_dir):
            state, train_m = loops.train_epoch(
                ctx["ds_train"], ctx["train_step"], state,
                batch_size=cfg.epoch.batch_size, weights=weights,
                curriculum=curriculum, rng_seed=cfg.seed + epoch,
                num_workers=cfg.hardware.num_workers,
                max_batches=max_batches, mesh=ctx["mesh"],
                wire_skip=wire_skip)

        val_m = None
        if val_every and epoch % val_every == 0:
            val_m = loops.validate_epoch(
                ctx["ds_val"], ctx["eval_step"], state.params,
                batch_size=cfg.epoch.batch_size, weights=weights,
                curriculum={"input_dropout_rate": jnp.float32(0.0),
                            "min_gate": jnp.float32(min_gate)},
                rng_seed=1_000_000 + epoch,
                num_workers=cfg.hardware.num_workers,
                max_batches=val_cfg.get("max_batches", max_batches),
                mesh=ctx["mesh"], wire_skip=wire_skip)

        lr_now = float(ctx["lr_sched"](int(state.step)))
        log.info("\n%s", epoch_logging.format_epoch_block(
            epoch, train_m, val_m, lr_now))
        metrics = epoch_logging.checkpoint_metrics(train_m, val_m)
        history.append({"epoch": epoch, **metrics})
        if hosts.is_primary():
            ckpt.save(epoch, state, metrics, extra_meta)
        hosts.sync()

        # early stopping on the monitored metric (SURVEY.md §6.6 config);
        # direction follows the checkpoint monitor mode.
        if es_enabled and monitor in metrics:
            v = float(metrics[monitor])
            if cfg.run.checkpoint.mode == "max":
                improved = np.isfinite(v) and -v < es_best - 1e-9
                v = -v
            else:
                improved = np.isfinite(v) and v < es_best - 1e-9
            if improved:
                es_best, es_bad = v, 0
            else:
                es_bad += 1
                if es_bad >= es_patience:
                    log.info("early stopping at epoch %d "
                             "(no improvement for %d epochs)", epoch,
                             es_bad)
                    break

    if hosts.is_primary():
        (exp_dir / "history.json").write_text(json.dumps(history, indent=1))
    # NOTE: ctx first -- its "state" is the (donated, dead) initial state
    # and must be overwritten by the final one.
    return {**ctx, "state": state, "history": history}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--training", required=True)
    ap.add_argument("--bindings", default=None)
    ap.add_argument("--model-config", dest="model_config", default=None)
    ap.add_argument("--num-epochs", dest="num_epochs", type=int,
                    default=None)
    ap.add_argument("--max-batches", dest="max_batches", type=int,
                    default=None)
    ap.add_argument("--num-workers", dest="num_workers", type=int,
                    default=None)
    ap.add_argument("--phase-start-epoch", dest="phase_start_epoch",
                    type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--init-from", dest="init_from", default=None,
                    help="params-only msgpack to warm-start a fresh run "
                         "(e.g. a reference .pt imported via "
                         "forest_tpu.utils.torch_import)")
    ap.add_argument("--overwrite", action="store_true")
    ap.add_argument("--profile", action="store_true")
    a = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")
    profiling.set_profile(a.profile)
    cfg = parse_training_config(a.training)
    if a.num_epochs:
        cfg.epoch.num_epochs = a.num_epochs
    if a.num_workers:
        cfg.hardware.num_workers = a.num_workers
    if a.phase_start_epoch is not None:
        cfg.curriculum["phase_start_epoch"] = a.phase_start_epoch
    if a.overwrite:
        import shutil
        shutil.rmtree(cfg.run.experiment_dir, ignore_errors=True)
    model_cfg = None
    mc_path = a.model_config or cfg.model_path
    if mc_path:
        model_cfg = yaml.safe_load(Path(mc_path).read_text())
    # Multi-host: no-op unless FOREST_TPU_COORDINATOR/NUM_PROCESSES/
    # PROCESS_ID (or a TPU pod environment) configure a process group.
    from forest_tpu.parallel import hosts
    hosts.initialize()
    train(cfg, a.bindings, model_cfg, a.max_batches,
          resume=not a.no_resume, init_from=a.init_from)


if __name__ == "__main__":
    main()
