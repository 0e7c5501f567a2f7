"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's lack of a fake backend by creating one: JAX's
host-platform device multiplexing stands in for a TPU slice, so multi-chip
sharding logic is exercised without hardware (SURVEY.md §4).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
