"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's lack of a fake backend by creating one: JAX's
host-platform device multiplexing stands in for a TPU slice, so multi-chip
sharding logic is exercised without hardware (SURVEY.md §4).
"""

import os

# Must be set before jax initializes its backends.  The env var alone is not
# enough under the axon TPU plugin, so also force via jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
