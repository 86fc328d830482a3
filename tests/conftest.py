"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding tests run against a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``); the real TPU chip is only
used by ``bench.py`` and the driver's graft entry checks.

This file must set the env vars BEFORE jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The hosted-TPU site config (/root/.axon_site) pins JAX_PLATFORMS=axon at
# interpreter start; the env var alone does not stick, so force the config
# flag too (it wins over the site default).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(666)
