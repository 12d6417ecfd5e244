"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX fake-backend story for testing sharded code paths
without TPU hardware (SURVEY.md §4): the same `shard_map`/`pjit` code that
runs on a v5e-8 runs here on 8 host devices.
"""

import os

# Must be set before jax is imported anywhere.  Force (not setdefault):
# the container environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel),
# and tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
