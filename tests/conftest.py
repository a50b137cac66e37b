"""Test environment: force an 8-device virtual CPU mesh.

The JAX analogue of the reference's pseudo-multi-GPU validation trick
(dlrm_s_pytorch_pseudo_multigpu.py): multi-chip sharding is exercised on a
single host by splitting the CPU into 8 virtual devices. Must run before
jax initializes a backend, hence env mutation at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin registers itself regardless of JAX_PLATFORMS; the
# config knob is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
