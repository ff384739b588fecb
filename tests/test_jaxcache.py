"""Persistent-cache host-fingerprint guard (VERDICT r4 weak #5).

CPU AOT executables cached by one container host can SIGILL on another
(XLA's machine-feature warnings in MULTICHIP_r04); the guard scopes CPU
cache entries into a ``cpu-<host-fingerprint>`` subdirectory and the dryrun
re-exec retries once with the cache disabled if the child still aborts.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

from forest_tpu.utils import jaxcache

REPO = Path(__file__).resolve().parents[1]


def test_fingerprint_stable_and_hex():
    fp1 = jaxcache.cpu_host_fingerprint()
    fp2 = jaxcache.cpu_host_fingerprint()
    assert fp1 == fp2
    assert len(fp1) == 12
    int(fp1, 16)  # hex


def test_cpu_platform_scopes_cache_dir(tmp_path):
    # The suite's conftest pins jax_platforms=cpu, so the hint is "cpu".
    d = jaxcache.enable_persistent_cache(tmp_path)
    fp = jaxcache.cpu_host_fingerprint()
    assert d == tmp_path / f"cpu-{fp}"
    assert d.is_dir()


def test_non_cpu_platform_uses_shared_root(tmp_path, monkeypatch):
    # TPU/axon entries are relay-side (no host-ISA hazard) and must keep
    # the shared warm cache root.
    monkeypatch.setattr(jaxcache, "_platform_hint", lambda: "axon")
    d = jaxcache.enable_persistent_cache(tmp_path)
    assert d == tmp_path


def test_disable_env_skips_enabling(tmp_path, monkeypatch):
    monkeypatch.setenv("FOREST_TPU_JAX_CACHE_DISABLE", "1")
    assert jaxcache.enable_persistent_cache(tmp_path) is None


def test_foreign_cache_entry_cannot_be_loaded(tmp_path):
    """Plant a foreign-feature cache entry at the legacy (unscoped) root and
    run a jitted CPU computation with caching enabled: the process must
    write to the fingerprint subdir and never read the planted entry."""
    foreign = tmp_path / "jit_step-deadbeef-foreign-host-entry"
    foreign.write_bytes(b"\x00not-a-valid-executable\x00" * 16)
    code = (
        "import os\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from forest_tpu.utils.jaxcache import enable_persistent_cache\n"
        "d = enable_persistent_cache(os.environ['CACHE_ROOT'])\n"
        "import jax.numpy as jnp\n"
        "out = jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64)))\n"
        "assert float(out) == 64.0 ** 3\n"
        "print('SCOPED_DIR=' + str(d))\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["CACHE_ROOT"] = str(tmp_path)
    # Force caching of even instant compiles so the subdir gets used.
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-3000:]
    fp = jaxcache.cpu_host_fingerprint()
    assert f"SCOPED_DIR={tmp_path}/cpu-{fp}" in proc.stdout
    # The foreign entry is untouched and no machine-feature warning fired.
    assert foreign.read_bytes().startswith(b"\x00not-a-valid-executable")
    for bad in ("SIGILL", "machine features"):
        assert bad not in proc.stderr, proc.stderr[-3000:]


def test_dryrun_retries_once_without_cache_on_child_abort():
    """A child that dies by signal (e.g. SIGILL from a stale AOT entry) must
    be retried exactly once with FOREST_TPU_JAX_CACHE_DISABLE=1."""
    code = (
        "import subprocess\n"
        "calls = []\n"
        "def fake_run(cmd, **kw):\n"
        "    env = kw.get('env', {})\n"
        "    calls.append(env.get('FOREST_TPU_JAX_CACHE_DISABLE'))\n"
        "    class P: pass\n"
        "    p = P(); p.stdout, p.stderr = 'retry-ok', ''\n"
        "    p.returncode = -4 if len(calls) == 1 else 0\n"
        "    return p\n"
        "subprocess.run = fake_run\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "assert calls == [None, '1'], calls\n"
        "print('RETRY-PATH-OK')\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cuda"  # driver-style: parent must not init
    env.pop("FOREST_TPU_DRYRUN_CHILD", None)
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "RETRY-PATH-OK" in proc.stdout


@pytest.mark.slow
def test_dryrun_passes_with_foreign_entry_planted(tmp_path):
    """VERDICT r4 task #6 acceptance: plant a foreign-feature entry at the
    cache root and dryrun_multichip(8) still passes, with no SIGILL /
    machine-feature warnings on stderr."""
    (tmp_path / "jit_train_step-0123-foreign").write_bytes(b"garbage" * 64)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cuda"
    env.pop("FOREST_TPU_DRYRUN_CHILD", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env["FOREST_TPU_JAX_CACHE"] = str(tmp_path)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip(8): OK" in proc.stdout
    for bad in ("SIGILL", "machine features"):
        assert bad not in proc.stderr, proc.stderr[-3000:]
    fp = jaxcache.cpu_host_fingerprint()
    assert (tmp_path / f"cpu-{fp}").is_dir()
