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

# Persistent compilation cache: the suite is XLA-CPU-compile-dominated
# (every e2e test compiles a multi-kernel pipeline), so repeat runs load
# executables from disk instead of recompiling — a cold default-tier run
# pays the compiles once; warm runs are minutes. Opt out (e.g. to measure
# true compile time) with MSM_TPU_TEST_NO_CACHE=1.
if not os.environ.get("MSM_TPU_TEST_NO_CACHE"):
    _cache = os.environ.get(
        "MSM_TPU_TEST_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"),
    )
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

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
