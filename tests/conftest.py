"""Test configuration: force an 8-device CPU platform before JAX import.

Multi-chip sharding correctness is validated on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the driver's
dryrun contract. Must run before anything imports jax.
"""

import os
import sys

# Hard override: the sandbox exports JAX_PLATFORMS=axon (remote TPU tunnel)
# globally and its sitecustomize re-registers the axon backend; tests must
# run on the local virtual-8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
sys.modules.pop("sitecustomize", None)

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(594277)  # reference seed, train.py:129
