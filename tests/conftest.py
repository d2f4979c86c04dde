"""Test configuration: force an 8-device CPU platform before JAX import.

Multi-chip sharding correctness is validated on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the driver's
dryrun contract. Must run before anything imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(594277)  # reference seed, train.py:129
