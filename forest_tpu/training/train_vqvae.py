"""Legacy-pipeline VQ-VAE training CLI (TPU-native).

The forest-tpu equivalent of /root/reference/scripts/train_vqvae.py (call
stack SURVEY.md §4.3): schema build -> VQVAEDataset + ChunkBatchSampler +
prefetching loader -> VQVAE -> AdamW (codebook wd=0) + cosine LR + lambda_vq
annealer -> jitted train step with EMA codebook updates -> per-epoch
checkpoints (ckpt_epochNNN / ckpt_best semantics via CheckpointManager).

Run:
  python -m forest_tpu.training.train_vqvae --config configs/vae_v0.yaml \
      [--zarr PATH] [--run-dir PATH] [--epochs N] [--max-steps N]

Config YAML uses a ``train_vqvae:`` section with the reference's key names
(/root/reference/scripts/config.yaml:19-61) so existing configs port directly.
"""
from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from forest_tpu.data.loader import PrefetchLoader
from forest_tpu.data.samplers import ChunkBatchSampler
from forest_tpu.data.schema import build_and_save_schema
from forest_tpu.data.cube import LegacyCube
from forest_tpu.data.vqvae_dataset import VQVAEDataset
from forest_tpu.models.vqvae import VQVAE, model_config_dict
from forest_tpu.training import vqvae_step
from forest_tpu.training.annealers import load_scheduler
from forest_tpu.training.checkpointing import CheckpointManager
from forest_tpu.training.scheduler import cosine_lr

log = logging.getLogger("forest_tpu.train_vqvae")

DEFAULTS: Dict[str, Any] = dict(
    batch_size=64, steps_per_epoch=200, epochs=10, num_workers=8,
    eager=False, steps_per_dispatch=1,
    min_hits_per_epoch=100, mass_coverage=0.999, vocab_cap=5000,
    codebook_size=256, emb_dim=128, hidden=128, cat_emb_dim=8, beta=0.25,
    quantizer="ema", ema_decay=0.99, ema_eps=1e-5,
    lr=3e-4, min_lr=3e-5, weight_decay=1e-4, clip_grad=1.0,
    lambda_cont=1.0, lambda_cat=1.0, lambda_canopy=1.0,
    anneal_vq_schedule="constant", anneal_vq_value=1.0,
    block_size=(4, 4), split_train="train", split_val="val",
    drop_last=True, seed=0,
)


def load_config(path: Optional[str], overrides: Dict[str, Any]) -> Dict[str, Any]:
    cfg = dict(DEFAULTS)
    if path:
        y = yaml.safe_load(Path(path).read_text()) or {}
        cfg.update(y.get("train_vqvae", y))
    cfg.update({k: v for k, v in overrides.items() if v is not None})
    return cfg


def build_vq_annealer(cfg: Dict[str, Any]):
    """Map the reference's flat anneal_vq_* keys to an AnnealConfig."""
    sched = cfg.get("anneal_vq_schedule", "constant")
    base = {"cont": cfg["lambda_cont"], "cat": cfg["lambda_cat"],
            "canopy": cfg["lambda_canopy"], "vq": 1.0}
    if sched == "constant":
        return load_scheduler(base, {"vq": float(
            cfg.get("anneal_vq_value", 1.0))})
    if sched == "warmup_hold_decay":
        return load_scheduler(base, {"vq": {
            "kind": "warmup_hold_decay",
            "start_step": int(cfg.get("anneal_vq_start", 0)),
            "warmup": int(cfg.get("anneal_vq_warmup", 0)),
            "hold": int(cfg.get("anneal_vq_hold", 0)),
            "decay": int(cfg.get("anneal_vq_decay", 0)),
            "floor": float(cfg.get("anneal_vq_floor", 0.0)),
            "ceil": float(cfg.get("anneal_vq_ceil", 1.0)),
            "final": float(cfg.get("anneal_vq_final", 1.0))}})
    return load_scheduler(base, {"vq": {
        "kind": sched,
        "start_value": float(cfg.get("anneal_vq_floor", 0.0)),
        "end_value": float(cfg.get("anneal_vq_ceil", 1.0)),
        "start_step": int(cfg.get("anneal_vq_start", 0)),
        "end_step": int(cfg.get("anneal_vq_start", 0))
        + int(cfg.get("anneal_vq_warmup", 1))}})


def wire_int_bounds(ds: VQVAEDataset) -> Dict[str, Any]:
    """Schema-derived id-array value bounds for the compact wire
    (data/wire.py): the merged ``cat`` block is bounded by the largest
    per-feature ``num_ids``; each ``cat_target`` array additionally
    carries IGNORE_INDEX (-100). Dataset properties, NOT per-batch maxima
    (a per-batch dtype would change the jit signature between batches)."""
    from forest_tpu.data.vqvae_dataset import IGNORE_INDEX

    vocab = {n: int(ds.schema_cat[n]["num_ids"]) for n in ds.cat_names}
    if not vocab:
        return {}
    bounds: Dict[str, Any] = {n: (IGNORE_INDEX, v) for n, v in vocab.items()}
    # The merged [B,T,Cc] id block is non-negative and bounded by the
    # largest vocabulary. A feature literally NAMED "cat" shares the key
    # (the wire matches keys at any nesting level), so that entry must
    # hold BOTH arrays: the union bound (sentinel, max vocab) does.
    bounds["cat"] = ((IGNORE_INDEX, max(vocab.values()))
                     if "cat" in vocab else max(vocab.values()))
    return bounds


def host_to_device_batch(batch: Dict[str, Any], wire: bool = False,
                         int_bounds: Optional[Dict[str, Any]] = None
                         ) -> Dict[str, Any]:
    """Drop host-only keys; jnp-ify the rest. ``wire=True`` applies the
    compact wire format (data/wire.py: bf16 floats + bit-packed masks +
    narrow ids per ``int_bounds``, ~3.5x fewer relay H2D bytes); the
    jitted steps decode it via ``wire.decode_wire_batch`` (a no-op on
    plain batches)."""
    if wire:
        from forest_tpu.data.wire import encode_wire_batch

        batch = encode_wire_batch({k: v for k, v in batch.items()
                                   if k not in ("years", "yx")},
                                  int_bounds=int_bounds)
    out = {}
    for k, v in batch.items():
        if k in ("years", "yx"):
            continue
        out[k] = ({n: jnp.asarray(a) for n, a in v.items()}
                  if isinstance(v, dict) else jnp.asarray(v))
    return out


def host_to_device_block(batches, wire: bool = False,
                         int_bounds: Optional[Dict[str, Any]] = None
                         ) -> Dict[str, Any]:
    """Stack K loader batches into ONE [K, ...] device pytree for
    ``vqvae_step.make_scan_train_step`` (multi-step-per-dispatch): K wire
    encodes on host, one leaf-wise ``np.stack`` (owning arrays -- numpy
    views serialize ~4x slower through the relay), one H2D event."""
    from forest_tpu.data import wire as wire_mod

    enc = []
    for b in batches:
        b = {k: v for k, v in b.items() if k not in ("years", "yx")}
        if wire:
            b = wire_mod.encode_wire_batch(b, int_bounds=int_bounds)
        enc.append(b)
    return jax.tree.map(jnp.asarray, wire_mod.stack_batches(enc))


def train(cfg: Dict[str, Any]) -> Dict[str, Any]:
    from forest_tpu.parallel import hosts

    t_setup = time.perf_counter()
    # Multi-host: each process ingests a disjoint chunk shard feeding one
    # global mesh (SURVEY §6.8). Call hosts.initialize() (or set the
    # FOREST_TPU_COORDINATOR/... env) BEFORE train(); main() does.
    n_proc, proc_id = hosts.process_shard()
    run_dir = Path(cfg["run_dir"])
    run_dir.mkdir(parents=True, exist_ok=True)
    if hosts.is_primary():
        (run_dir / "config.json").write_text(json.dumps(
            {k: str(v) if isinstance(v, Path) else v for k, v in cfg.items()},
            indent=1, default=str))

    # 1. schema (exposure-aware vocab collapse)
    schema_path = run_dir / "schema.json"
    if not schema_path.exists():
        cube = LegacyCube(cfg["zarr"])
        build_and_save_schema(
            cube, run_dir, cfg["batch_size"], cfg["steps_per_epoch"],
            cfg["min_hits_per_epoch"], cfg["mass_coverage"],
            cfg["vocab_cap"])
        log.info("schema written to %s", schema_path)

    # 2. datasets + loaders
    block = tuple(cfg["block_size"])
    ds_tr = VQVAEDataset(cfg["zarr"], schema_path, split=cfg["split_train"],
                         eager=cfg["eager"], block_size=block)
    ds_va = VQVAEDataset(cfg["zarr"], schema_path, split=cfg["split_val"],
                         eager=cfg["eager"], block_size=block)
    log.info("train pixels: %d  val pixels: %d", len(ds_tr), len(ds_va))

    # 3. model
    cat_vocab = {n: ds_tr.schema_cat[n]["num_ids"] for n in ds_tr.cat_names}
    model = VQVAE(
        cont_dim=len(ds_tr.cont_names), cat_vocab_sizes=cat_vocab,
        naip_bands=ds_tr.naip.shape[-1], num_timesteps=len(ds_tr.ds["years"]),
        emb_dim=cfg["emb_dim"], codebook_size=cfg["codebook_size"],
        beta=cfg["beta"], hidden=cfg["hidden"], quantizer=cfg["quantizer"],
        cat_emb_dim=cfg["cat_emb_dim"], ema_decay=cfg["ema_decay"],
        ema_eps=cfg["ema_eps"])
    class_weights = {n: jnp.asarray(ds_tr.class_weights_by_cat_name(n))
                     for n in ds_tr.cat_names}

    total_steps = cfg["epochs"] * cfg["steps_per_epoch"]
    lr_sched = cosine_lr(cfg["lr"], total_steps, cfg["min_lr"])
    opt = vqvae_step.make_optimizer(lr_sched, cfg["weight_decay"],
                                    cfg["clip_grad"])

    sampler0 = ChunkBatchSampler(ds_tr.xy_by_chunk, cfg["batch_size"],
                                 drop_last=cfg["drop_last"],
                                 seed=cfg["seed"],
                                 num_shards=n_proc, shard_id=proc_id)
    # Compact H2D wire (data/wire.py): auto-on for TPU backends (the relay
    # H2D link is byte-proportional and doesn't overlap compute); explicit
    # train_vqvae.wire_compact override otherwise. Multi-process global
    # assembly keeps the plain wire (arrays cross process boundaries
    # before the device), mirroring representation/loops.py.
    use_wire = ((jax.default_backend() == "tpu")
                if cfg.get("wire_compact") is None
                else bool(cfg["wire_compact"])) and n_proc == 1
    wire_bounds = wire_int_bounds(ds_tr) if use_wire else None
    if use_wire:
        log.info("compact H2D wire on (bf16 floats, packed masks, "
                 "narrow ids: %s)", wire_bounds)
    example = host_to_device_batch(ds_tr.load_batch(next(iter(sampler0))),
                                   wire=use_wire, int_bounds=wire_bounds)
    state = vqvae_step.init_train_state(model, opt, example,
                                        jax.random.key(cfg["seed"]))
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(state.params))
    log.info("model params: %.2f M", n_params / 1e6)

    # Data-parallel when multiple devices are visible: shard batches over a
    # 1-D mesh -- gradient all-reduce + codebook EMA psum derived by XLA
    # (SURVEY.md §6.8; forest_trajectory_v0 multi-chip contract).
    n_dev = len(jax.devices())
    mesh = None
    if cfg.get("data_parallel", n_dev > 1) and n_dev > 1:
        from forest_tpu.parallel import make_dp_train_step, make_mesh
        from forest_tpu.parallel.mesh import shard_batch_pytree
        mesh = make_mesh(n_dev)
        log.info("data-parallel over %d devices (%d processes)",
                 n_dev, n_proc)
        train_step = make_dp_train_step(model, opt, mesh,
                                        class_weights=class_weights)
        if n_proc > 1:
            # Per-process batches are this host's slice of the global
            # batch; assemble global dim-0-sharded arrays. The replicated
            # initial state must also become a global array before the
            # first (donating) step.
            _shard = hosts.global_batch_from_local
            state = hosts.replicate_pytree(
                jax.tree.map(np.asarray, state), mesh)
        else:
            _shard = shard_batch_pytree
        # shard_map eval too: a dim-0-sharded batch through a plain-jit
        # eval would put the Pallas VQ kernel under GSPMD auto-sharding,
        # which silently all-gathers to full replication (dp.py header).
        from forest_tpu.parallel.dp import make_dp_eval_step
        eval_step = make_dp_eval_step(model, mesh,
                                      class_weights=class_weights)
    else:
        inner_step = vqvae_step.make_train_step(model, opt, class_weights)
        train_step = jax.jit(inner_step, donate_argnums=0)
        _shard = None
        eval_step = jax.jit(vqvae_step.make_eval_step(model, class_weights))

    # Multi-step-per-dispatch (steps_per_dispatch > 1, single-process jit
    # path only): lax.scan K train steps per device dispatch over
    # host-stacked batches + per-step annealer weights, so the relay's
    # per-dispatch/per-fetch drain cost amortizes over K steps. Semantics
    # per step are identical to the plain loop except the rng stream: a
    # block at global step g uses split(key(g), K) instead of
    # key(g)..key(g+K-1) (tests/test_scan_steps.py pins scan == sequential
    # under the block convention).
    spd = max(int(cfg.get("steps_per_dispatch") or 1), 1)
    multi_step = None
    if spd > 1:
        if _shard is not None:
            log.warning("steps_per_dispatch=%d ignored: multi-device "
                        "sharding path handles its own dispatch", spd)
            spd = 1
        else:
            multi_step = jax.jit(
                vqvae_step.make_scan_train_step(inner_step),
                donate_argnums=0)
            log.info("multi-step dispatch: %d steps per device call", spd)

    def min_shard_len(xy_by_chunk, drop_last, replacement=False):
        """Lockstep cap under multi-process: every process must launch the
        SAME number of global-collective programs per epoch, but chunk
        shards are only near-equal in size -- cap at the smallest shard's
        batch count (deterministically computable by every process)."""
        if n_proc <= 1:
            return None
        cap = min(len(ChunkBatchSampler(
            xy_by_chunk, cfg["batch_size"], drop_last=drop_last,
            replacement_within_chunk=replacement,
            num_shards=n_proc, shard_id=s)) for s in range(n_proc))
        if cap == 0:
            raise ValueError(
                f"a process shard yields 0 batches ({n_proc} processes, "
                f"{len(xy_by_chunk)} chunks): use fewer processes or a "
                "bigger/finer-chunked cube")
        return cap

    tr_cap = min_shard_len(ds_tr.xy_by_chunk, cfg["drop_last"],
                           replacement=True)
    va_cap = min_shard_len(ds_va.xy_by_chunk, True, replacement=True)

    ckpt = CheckpointManager(run_dir / "ckpt", prefix="ckpt", top_k=1,
                             periodic_every=cfg.get("ckpt_every", 1),
                             monitor="val/loss_total",
                             monitor_start_epoch=0)
    start_epoch = 0
    resumed = ckpt.maybe_resume(state)
    if resumed is not None and not cfg.get("no_resume"):
        state, meta = resumed
        if n_proc > 1 and mesh is not None:
            state = hosts.replicate_pytree(
                jax.tree.map(np.asarray, state), mesh)
        start_epoch = int(meta.get("epoch", -1)) + 1
        log.info("auto-resumed from epoch %d", start_epoch - 1)

    annealer = build_vq_annealer(cfg)
    extra_meta = {"model_version": "vqvae-1",
                  "model_config": model_config_dict(model)}
    log.info("setup in %.1fs", time.perf_counter() - t_setup)

    global_step = start_epoch * cfg["steps_per_epoch"]
    max_steps = cfg.get("max_steps")
    history = []
    for epoch in range(start_epoch, cfg["epochs"]):
        sampler = ChunkBatchSampler(
            ds_tr.xy_by_chunk, cfg["batch_size"],
            drop_last=cfg["drop_last"],
            replacement_within_chunk=True, seed=cfg["seed"] + epoch,
            num_shards=n_proc, shard_id=proc_id)
        loader = PrefetchLoader(ds_tr, sampler,
                                num_workers=cfg["num_workers"])
        t0 = time.perf_counter()
        wait_t = step_t = 0.0
        n_steps = 0
        agg: Dict[str, float] = {}
        pending: list = []  # on-device metric dicts awaiting block fetch

        def drain():
            # One relay round trip per BLOCK of steps instead of per step
            # (a per-step device_get costs up to ~30 ms on a degraded
            # relay); 16-deep stays under the ~30-deep drain cliff.
            # Scanned dispatches carry [K]-leaf metrics: np.sum totals
            # them (identity on plain scalars); the /n_steps below then
            # yields the per-step mean either way.
            if pending:
                for m in jax.device_get(pending):
                    for k, v in m.items():
                        agg[k] = agg.get(k, 0.0) + float(np.sum(v))
                pending.clear()

        epoch_cap = (min(cfg["steps_per_epoch"], tr_cap)
                     if tr_cap is not None else cfg["steps_per_epoch"])
        block_b: list = []
        block_w: list = []
        t_wait = time.perf_counter()
        for batch in loader:
            wait_t += time.perf_counter() - t_wait
            t_step = time.perf_counter()
            if multi_step is not None:
                # multi-step-per-dispatch: stage spd host batches + their
                # per-step annealer weights, one scanned device call.
                block_b.append(batch)
                block_w.append(annealer(global_step))
                global_step += 1
                n_steps += 1
                stop = bool(n_steps >= epoch_cap
                            or (max_steps and global_step >= max_steps))
                if len(block_b) == spd or stop:
                    sb = host_to_device_block(block_b, wire=use_wire,
                                              int_bounds=wire_bounds)
                    sw = {k: jnp.asarray([bw[k] for bw in block_w],
                                         jnp.float32)
                          for k in block_w[0]}
                    state, m = multi_step(
                        state, sb, sw,
                        jax.random.key(global_step - len(block_b)))
                    pending.append(m)
                    block_b, block_w = [], []
                    if len(pending) * spd >= 16:
                        drain()
                step_t += time.perf_counter() - t_step
                t_wait = time.perf_counter()
                if stop:
                    break
                continue
            w = {k: jnp.float32(v) for k, v in annealer(global_step).items()}
            db = host_to_device_batch(batch, wire=use_wire,
                                      int_bounds=wire_bounds)
            if _shard is not None:
                db = _shard(db, mesh)
            state, m = train_step(state, db, w,
                                  jax.random.key(global_step))
            global_step += 1
            n_steps += 1
            pending.append(m)
            if len(pending) >= 16:
                drain()
            step_t += time.perf_counter() - t_step
            t_wait = time.perf_counter()
            if n_steps >= epoch_cap:
                break
            if max_steps and global_step >= max_steps:
                break
        drain()

        train_metrics = {f"train/{k.replace('loss/', 'loss_')}": v / n_steps
                         for k, v in agg.items()}
        # validation
        va_sampler = ChunkBatchSampler(ds_va.xy_by_chunk, cfg["batch_size"],
                                       drop_last=True, seed=0,
                                       replacement_within_chunk=True,
                                       num_shards=n_proc, shard_id=proc_id)
        va_agg: Dict[str, float] = {}
        nv = 0
        w = {k: jnp.float32(v) for k, v in annealer(global_step).items()}
        for batch in PrefetchLoader(ds_va, va_sampler,
                                    num_workers=cfg["num_workers"]):
            vb = host_to_device_batch(batch, wire=use_wire,
                                      int_bounds=wire_bounds)
            if _shard is not None:
                vb = _shard(vb, mesh)
            m = jax.device_get(eval_step(state.params, vb, w))
            for k, v in m.items():
                va_agg[k] = va_agg.get(k, 0.0) + float(v)
            nv += 1
            if nv >= (min(cfg.get("val_steps", 20), va_cap)
                      if va_cap is not None else cfg.get("val_steps", 20)):
                break
        val_metrics = {f"val/{k.replace('loss/', 'loss_')}": v / max(nv, 1)
                       for k, v in va_agg.items()}

        dt = time.perf_counter() - t0
        metrics = {**train_metrics, **val_metrics,
                   "epoch_time_s": dt, "wait_s": wait_t, "step_s": step_t,
                   "steps_per_s": n_steps / max(dt, 1e-9)}
        history.append({"epoch": epoch, **metrics})
        log.info(
            "epoch %d: train %.4f  val %.4f  ppl %.1f  %.1f steps/s "
            "(wait %.1fs / step %.1fs)",
            epoch, train_metrics.get("train/loss_total", float("nan")),
            val_metrics.get("val/loss_total", float("nan")),
            train_metrics.get("train/perplexity", float("nan")),
            metrics["steps_per_s"], wait_t, step_t)
        if hosts.is_primary():
            # msgpack checkpoints gather to host; the state is replicated,
            # so one writer suffices (Orbax manager is the shard-local
            # multi-writer alternative -- orbax_checkpointing.py).
            ckpt.save(epoch, state, metrics, extra_meta)
        hosts.sync()
        if max_steps and global_step >= max_steps:
            break

    if hosts.is_primary():
        (run_dir / "history.json").write_text(json.dumps(history, indent=1))
    return {"state": state, "model": model, "history": history,
            "dataset": ds_tr}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None)
    ap.add_argument("--zarr", default=None)
    ap.add_argument("--run-dir", dest="run_dir", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", dest="batch_size", type=int, default=None)
    ap.add_argument("--steps-per-epoch", dest="steps_per_epoch", type=int,
                    default=None)
    ap.add_argument("--max-steps", dest="max_steps", type=int, default=None)
    ap.add_argument("--num-workers", dest="num_workers", type=int,
                    default=None)
    ap.add_argument("--quantizer", default=None)
    ap.add_argument("--no-resume", dest="no_resume", action="store_true",
                    default=None)
    args = vars(ap.parse_args(argv))
    cfg = load_config(args.pop("config"), args)
    if not cfg.get("zarr") or not cfg.get("run_dir"):
        raise SystemExit("--zarr and --run-dir (or config) are required")
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")
    # Multi-host: no-op unless FOREST_TPU_COORDINATOR/NUM_PROCESSES/
    # PROCESS_ID (or a TPU pod environment) configure a process group.
    from forest_tpu.parallel import hosts
    hosts.initialize()
    train(cfg)


if __name__ == "__main__":
    main()
