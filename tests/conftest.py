"""Test environment: force an 8-device CPU platform before JAX initializes.

Per the TPU-standard CI trick (SURVEY.md section 4), tests run on a virtual
8-device CPU mesh so sharding/collective paths are exercised without real
chips; the benchmark harness (bench.py) is what runs on TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
