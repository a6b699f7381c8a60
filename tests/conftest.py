"""Test configuration: force CPU with 8 virtual devices.

The axon sitecustomize overwrites JAX_PLATFORMS in the environment, so the
env-var route is not reliable here; `jax.config.update("jax_platforms", ...)`
takes precedence and must run before any backend is initialized. Real-TPU
behavior is exercised by bench.py and the driver's compile checks; unit tests
validate math and sharding on a virtual 8-device CPU mesh (SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# The fast tier is compile-bound (tiny shapes, heavy graphs): persistent
# compilation cache cuts a warm run to a fraction of cold. Shared dir with
# the TPU bench cache — entries are keyed by backend + HLO hash.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (full tier; default tier is <5 min)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight test (multi-process, e2e app, big-shape grads); "
        "excluded by default, enabled with --runslow",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
