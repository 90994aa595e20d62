"""Test configuration: run everything on a virtual 8-device CPU mesh.

SURVEY.md §5.3 item 6: distributed-without-a-cluster via
``xla_force_host_platform_device_count`` — pjit/shard_map tests assert
sharding and numerical equality against single-device runs, all on CPU.
These env vars must be set before jax initializes, hence module import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
