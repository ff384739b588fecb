"""Multi-host bring-up test: 2 processes x 4 CPU devices, one global mesh.

VERDICT r2 missing #2 / SURVEY §6.8: per-host disjoint chunk ingestion
feeding one global data-parallel mesh via ``jax.distributed.initialize``
(forest_tpu/parallel/hosts.py). Asserts, via tests/multihost_child.py run
as two coordinated subprocesses:

  (i)   the chunk shards are disjoint and exhaustive across processes,
  (ii)  the global update matches a single-process run over the identical
        global batch (losses + parameter checksum),
  (iii) Orbax save/restore round-trips with both processes writing their
        own shards.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
CHILD = Path(__file__).parent / "multihost_child.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def child_results(tmp_path_factory):
    outdir = tmp_path_factory.mktemp("mh")
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = " ".join(
        [f for f in env.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
        + ["--xla_force_host_platform_device_count=4"])
    procs = [subprocess.Popen(
        [sys.executable, str(CHILD), str(pid), "2", str(port), str(outdir)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out[-4000:]}"
    return [json.loads((outdir / f"result_{pid}.json").read_text())
            for pid in range(2)]


def test_global_device_view(child_results):
    for r in child_results:
        assert r["n_devices_global"] == 8
        assert r["n_devices_local"] == 4


def test_chunk_shards_disjoint_and_exhaustive(child_results):
    a, b = (set(r["my_chunks"]) for r in child_results)
    assert not (a & b), "chunk shards overlap between processes"
    assert a | b == set(range(6)), "some chunks are read by no process"
    # size-balanced greedy assignment: totals within one largest chunk
    totals = [r["my_total"] for r in child_results]
    assert sum(totals) == 40 + 25 + 60 + 10 + 35 + 50
    assert abs(totals[0] - totals[1]) <= 60


def test_global_update_matches_single_process(child_results):
    # both processes computed identical replicated results
    np.testing.assert_allclose(child_results[0]["losses"],
                               child_results[1]["losses"], rtol=1e-6)
    np.testing.assert_allclose(child_results[0]["param_checksum"],
                               child_results[1]["param_checksum"],
                               rtol=1e-6)

    # single-process reference over the SAME global batch on this test
    # process's 8-device CPU mesh (conftest)
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from forest_tpu.parallel import make_dp_train_step, make_mesh
    from forest_tpu.parallel.mesh import shard_batch_pytree
    from forest_tpu.training import vqvae_step

    model = g._flagship()
    opt = vqvae_step.make_optimizer(1e-3)
    state = vqvae_step.init_train_state(
        model, opt, g._example_batch(b=16, seed=0), jax.random.key(0))
    mesh = make_mesh(8)
    step = make_dp_train_step(model, opt, mesh, use_pallas=False)
    w = {k: jnp.float32(1.0) for k in ("cont", "cat", "canopy", "vq")}
    losses = []
    for i in range(2):
        batch = shard_batch_pytree(g._example_batch(b=16, seed=i), mesh)
        state, m = step(state, batch, w, jax.random.key(i))
        losses.append(float(m["loss/total"]))
    checks = jax.tree.map(lambda x: float(np.sum(np.abs(np.asarray(x)))),
                          state.params)
    checksum = float(sum(jax.tree.leaves(checks)))

    np.testing.assert_allclose(child_results[0]["losses"], losses,
                               rtol=1e-5)
    np.testing.assert_allclose(child_results[0]["param_checksum"], checksum,
                               rtol=1e-5)


def test_frl_loop_matches_single_process(child_results):
    """loops.run_epoch under 2 processes (per-process slices + global
    validity mask, incl. the repeat-filled tail batch) must match a
    single-process run over the identical 8-device mesh."""
    np.testing.assert_allclose(child_results[0]["frl_loss_total"],
                               child_results[1]["frl_loss_total"],
                               rtol=1e-6)
    assert child_results[0]["frl_skipped"] == 0
    assert child_results[0]["frl_n_steps"] == 2  # 10 samples / batch 8

    from forest_tpu.parallel import make_mesh
    from frl_tiny import run_tiny_frl_epoch

    m, checksum = run_tiny_frl_epoch(make_mesh(8))
    np.testing.assert_allclose(child_results[0]["frl_loss_total"],
                               float(m["loss_total"]), rtol=1e-4)
    np.testing.assert_allclose(child_results[0]["frl_param_checksum"],
                               checksum, rtol=1e-4)


def test_orbax_roundtrip_shard_local(child_results):
    for r in child_results:
        assert r["orbax_roundtrip_ok"] is True


def test_initialize_noop_single_process():
    """No multi-process config -> clean no-op (the single-host CLI path)."""
    from forest_tpu.parallel import hosts
    env_backup = {k: os.environ.pop(k, None)
                  for k in ("FOREST_TPU_COORDINATOR",
                            "FOREST_TPU_NUM_PROCESSES",
                            "FOREST_TPU_PROCESS_ID")}
    try:
        assert hosts.initialize() is False
        assert hosts.process_shard() == (1, 0)
        assert hosts.is_primary()
        hosts.sync()  # no-op barrier
    finally:
        for k, v in env_backup.items():
            if v is not None:
                os.environ[k] = v
