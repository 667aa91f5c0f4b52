"""Test fixtures: force JAX onto an 8-virtual-device CPU platform.

Multi-device sharding paths are tested without TPU hardware by emulating 8 host
devices (the strategy SURVEY.md §4 prescribes). Must run before jax initializes.
"""

import os

# Force CPU even when the environment pre-sets JAX_PLATFORMS (e.g. axon/TPU):
# the test suite must run hermetically on 8 virtual host devices. jax snapshots
# JAX_PLATFORMS into its config at import, so set BOTH the env var and the config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Hermetic: never read/write the user-level decoded-sample disk cache from tests
# (datasets default to it via TPU_UNET_DATA_CACHE; tests opt in explicitly).
os.environ["TPU_UNET_DATA_CACHE"] = ""

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
