"""Test config: force CPU with 8 virtual devices so mesh/collective tests
run without TPU hardware (SURVEY §4 test strategy).

NOTE: on this image a sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon already in the environment, so jax.config has the
axon platform baked in before conftest runs — plain ``os.environ`` edits
are too late. ``jax.config.update`` still works until the first backend
use, so it is the reliable override. XLA_FLAGS is read when the CPU
client is created, which also happens after collection starts.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
