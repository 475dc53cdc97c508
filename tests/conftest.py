"""Test environment: force an 8-device CPU platform before JAX initializes.

Per the TPU-standard CI trick (SURVEY.md section 4), tests run on a virtual
8-device CPU mesh so sharding/collective paths are exercised without real
chips; the benchmark harness (bench.py) is what runs on TPU hardware.
"""

import os

# Force-override: the ambient environment pins JAX_PLATFORMS to the TPU
# plugin; tests must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# The ambient TPU plugin (sitecustomize) force-registers itself and pins the
# platform before any conftest runs; override it back to CPU here (works as
# long as no backend has initialized yet). jax >= 0.5 replaced
# --xla_force_host_platform_device_count with jax_num_cpu_devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound backend memory growth across the 140-test run.

    The full suite compiles hundreds of distinct programs (many with large
    constant operands); by ~120 tests in, the CPU backend's live
    executables + cached buffers have been observed to push XLA's own
    compiler allocations into a segfault. Dropping the compilation cache
    between MODULES keeps the process bounded; per-module locality keeps
    the re-compile cost negligible (modules rarely share jit signatures).
    """
    yield
    jax.clear_caches()


# ---------------------------------------------------------------------------
# Slow-test marking (VERDICT r3 weak 9): the interpret-mode Pallas kernel
# suites dominate the 15+ minute full run. `pytest -m "not slow"` is the
# fast gate (~3 min) covering all non-kernel logic; CI / the driver still
# run everything.
# ---------------------------------------------------------------------------

SLOW_MODULES = {
    "test_leafcull", "test_conecull", "test_kernels", "test_cull",
    "test_scaling_train", "test_device_bvh", "test_sparse_diff",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: interpret-mode Pallas kernel tests (minutes each)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
