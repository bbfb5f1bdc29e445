"""Test harness config: force an 8-device virtual CPU mesh (SURVEY.md §4.5)
so sharding/collective tests run without TPU hardware."""
import os

# Hard-set (not setdefault): the environment pins JAX_PLATFORMS to the TPU
# plugin globally and a sitecustomize registers it at interpreter startup,
# so the env var alone is not enough — jax.config.update below is what
# actually forces the CPU backend for tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(19)  # the reference's seed (Program.fs:14)
