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

# persistent compile cache: the default tier is compile-bound on this
# single-core host; repeat runs of the same suite hit the cache instead
# of recompiling the whole-sequence programs (~30 s saved per run)
from vilgod_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (heavy parity/e2e tier)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy tier (multi-minute e2e / torch-parity / paged-kernel "
        "tests); skipped by default, enable with --runslow or VILGOD_SLOW=1")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r2 #7): the default run must finish in a
    few minutes on this single-core host; the slow tier (--runslow or
    VILGOD_SLOW=1) adds the multi-minute e2e/parity/paged tests."""
    if config.getoption("--runslow") or os.environ.get("VILGOD_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow or VILGOD_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(666)
