"""Test config: run all tests on CPU with 8 virtual devices.

Multi-chip sharding logic is validated without TPU hardware exactly as the
driver does — the TPU analogue of the reference's "CPU models that simulate
thread decomposition" testing pattern (``src/cuzk/test/utils.rs``).

The image pins the `axon` TPU platform via sitecustomize, overriding
JAX_PLATFORMS env vars — so the platform is forced through jax.config
(set MSM_TPU_TEST_PLATFORM to opt out, e.g. to smoke-test on real TPU).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

_platform = os.environ.get("MSM_TPU_TEST_PLATFORM", "cpu")
jax.config.update("jax_platforms", _platform)
if _platform == "cpu":
    jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False, help="run slow tests"
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: slow test (use --runslow)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="needs --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules: a single pytest
    process accumulates ~150 XLA CPU programs over the full suite and has
    been observed to segfault near the end (trace-time crash in native
    code, not reproducible in isolation). Re-compiles across modules cost
    a little time; process stability is worth it."""
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
