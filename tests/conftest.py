"""Test config: run JAX on a virtual 8-device CPU mesh so sharded paths
are testable without a TPU pod (SURVEY.md §4 consequence (d))."""

import os

# Force CPU regardless of ambient JAX_PLATFORMS (e.g. a TPU tunnel):
# tests must be hermetic and run the virtual multi-device mesh.
# NOTE: the axon TPU plugin's sitecustomize overrides jax_platforms to
# "axon,cpu" at interpreter start, so the env var alone is not enough —
# the config must be re-set after `import jax`.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
