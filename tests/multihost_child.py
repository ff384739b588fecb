"""Child process for the 2-process multi-host CPU test (test_multihost.py).

Each invocation is one "host": 4 virtual CPU devices, joined into an
8-device global mesh via jax.distributed (gloo collectives). Writes its
results as JSON for the parent test to assert on:

  1. its disjoint chunk-shard assignment (SURVEY §6.8 ingestion contract),
  2. two full data-parallel VQ-VAE train steps over the GLOBAL mesh
     (losses + a parameter checksum -- the parent compares against a
     single-process run over the identical global batch),
  3. an Orbax save -> restore round-trip done cooperatively by both
     processes (shard-local IO path).

Usage: python multihost_child.py <pid> <nproc> <port> <outdir>
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def main(pid: int, nproc: int, port: int, outdir: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from forest_tpu.parallel import hosts

    assert hosts.initialize(coordinator_address=f"127.0.0.1:{port}",
                            num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.process_index() == pid

    import numpy as np

    import __graft_entry__ as g
    from forest_tpu.data.samplers import ChunkBatchSampler
    from forest_tpu.parallel import make_dp_train_step
    from forest_tpu.training import vqvae_step

    out = {"pid": pid, "n_devices_global": len(jax.devices()),
           "n_devices_local": len(jax.local_devices())}

    # --- 1. disjoint per-host chunk ingestion ----------------------------
    rng = np.random.default_rng(0)
    xy_by_chunk = [rng.integers(0, 1000, size=(s,)) for s in
                   (40, 25, 60, 10, 35, 50)]
    n_shards, shard_id = hosts.process_shard()
    sampler = ChunkBatchSampler(xy_by_chunk, batch_size=8, seed=0,
                                num_shards=n_shards, shard_id=shard_id)
    out["my_chunks"] = sorted(sampler.my_chunks)
    out["my_total"] = int(sampler.total)

    # --- 2. global-mesh DP train steps ------------------------------------
    mesh = hosts.global_mesh()
    model = g._flagship()
    b_global = 16
    local = b_global // nproc
    opt = vqvae_step.make_optimizer(1e-3)

    def local_slice(batch):
        return {k: (jax.tree.map(lambda x: x[pid * local:(pid + 1) * local],
                                 v) if isinstance(v, dict)
                    else v[pid * local:(pid + 1) * local])
                for k, v in batch.items()}

    import jax.numpy as jnp
    state = vqvae_step.init_train_state(
        model, opt, g._example_batch(b=b_global, seed=0), jax.random.key(0))
    state = hosts.replicate_pytree(jax.tree.map(np.asarray, state), mesh)
    step = make_dp_train_step(model, opt, mesh, use_pallas=False)
    w = {k: jnp.float32(1.0) for k in ("cont", "cat", "canopy", "vq")}
    losses = []
    for i in range(2):
        batch = hosts.global_batch_from_local(
            jax.tree.map(np.asarray,
                         local_slice(g._example_batch(b=b_global, seed=i))),
            mesh)
        state, m = step(state, batch, w, jax.random.key(i))
        losses.append(float(m["loss/total"]))
    out["losses"] = losses
    checks = jax.tree.map(lambda x: float(np.sum(np.abs(np.asarray(x)))),
                          state.params)
    out["param_checksum"] = float(sum(jax.tree.leaves(checks)))

    # --- 3b. FRL loop over the global mesh (loops.run_epoch slicing) -----
    from frl_tiny import run_tiny_frl_epoch
    frl_m, frl_checksum = run_tiny_frl_epoch(mesh)
    out["frl_loss_total"] = float(frl_m["loss_total"])
    out["frl_skipped"] = int(frl_m["skipped"])
    out["frl_n_steps"] = int(frl_m["n_steps"])
    out["frl_param_checksum"] = frl_checksum

    # --- 3. Orbax shard-local save/restore round-trip ---------------------
    from forest_tpu.training.orbax_checkpointing import OrbaxCheckpointManager
    mgr = OrbaxCheckpointManager(Path(outdir) / "orbax_ckpt", top_k=2,
                                 monitor="val/loss_total")
    mgr.save(0, state, {"val/loss_total": losses[-1]})
    hosts.sync()
    restored = mgr.restore(0, state)
    ok = jax.tree.all(jax.tree.map(
        lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
        jax.device_get(state), jax.device_get(restored)))
    out["orbax_roundtrip_ok"] = bool(ok)
    mgr.close()
    hosts.sync()

    Path(outdir, f"result_{pid}.json").write_text(json.dumps(out))
    print(f"[child {pid}] OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
