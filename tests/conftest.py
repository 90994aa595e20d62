"""Test configuration: run everything on a virtual 8-device CPU mesh.

SURVEY.md §5.3 item 6: distributed-without-a-cluster via
``xla_force_host_platform_device_count`` — pjit/shard_map tests assert
sharding and numerical equality against single-device runs, all on CPU.

Note: this environment's axon site-hook pins JAX_PLATFORMS=axon (the real
TPU), so the env var alone is not enough — we must also set the config flag
before any backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
