"""Mesh construction and sharding rules.

The reference's entire distribution story is single-host DataParallel
(train.py:190-192). The TPU-native equivalent is SPMD over a device mesh:

- axis ``data``: batch sharding; gradients are all-reduced over ICI by XLA
  (GSPMD inserts the psum — there is no hand-written collective here).
- axis ``model``: tensor-parallel sharding of the encoder's conv channels
  (rules in sharding.py; size 1 = pure dp at reference scale, --n_model
  on the train CLI turns it on).

BatchNorm under this layout computes GLOBAL batch statistics (sync-BN):
jnp.mean over the sharded batch axis is a global mean under GSPMD. The
reference's DataParallel uses per-replica statistics instead; sync-BN is
the better-behaved choice at small per-core batches and is the documented
deviation (SURVEY.md §7 "BatchNorm under pmap").

Multi-slice DCN data parallelism is a mesh-shape change (devices spanning
slices on the ``data`` axis), not a code change.
"""

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        assert n_total % n_model == 0
        n_data = n_total // n_model
    assert n_data * n_model <= n_total
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of [B, ...] arrays sharded on the data axis."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
