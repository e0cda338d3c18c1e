"""Test env: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests simulate a TPU slice via
`--xla_force_host_platform_device_count=8` (SURVEY.md §4c); env vars must be
set before jax initializes, hence this lives at conftest import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin registers itself via sitecustomize before conftest runs
# and pins jax_platforms; override at the config level, env alone is ignored.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
