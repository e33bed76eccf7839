"""Test harness: force an 8-device virtual CPU mesh so data-parallel
sharding is testable without TPU hardware (SURVEY.md §4's test strategy)."""

import os

# Must be set before any backend initializes. The container's sitecustomize
# force-registers the axon TPU plugin and pins JAX_PLATFORMS=axon, so the
# env var alone is not enough — override via jax.config too.
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
    return np.random.default_rng(0)
