"""Test configuration: force an 8-virtual-device CPU mesh before JAX import.

All tests run on CPU with XLA's host-platform device-count override so that
multi-chip sharding (data-parallel pjit/shard_map paths) is exercised without
real TPU hardware. Mirrors the reference's CPU-only unit-test strategy
(/root/reference/frl/tests/*) extended with multi-device coverage (SURVEY.md §5).
"""
import os

# Hard override: the session environment pins JAX_PLATFORMS=axon (TPU tunnel)
# and its sitecustomize pre-imports jax, so env vars alone are too late --
# use jax.config (backend selection is lazy, this works pre-first-device-use).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
