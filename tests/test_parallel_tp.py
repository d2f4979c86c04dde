"""Tensor-parallel sharding rules: dp x tp mesh matches pure-dp numerics.

The 'model' axis shards encoder conv kernels channel-wise
(parallel/sharding.py); GSPMD inserts the collectives. These tests run the
same train step on an (8 data, 1 model) and a (4 data, 2 model) layout of
the virtual 8-CPU-device mesh and require identical losses, and verify the
kernels really are distributed (not silently replicated).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from horizonnet_tpu.models import build_model
from horizonnet_tpu.models.registry import init_model
from horizonnet_tpu.parallel import (make_mesh, shard_state, state_shardings,
                                     tp_spec)
from horizonnet_tpu.train import create_train_state, train_step, \
    warmup_poly_schedule
from horizonnet_tpu.train.step import make_optimizer


@pytest.fixture(scope="module")
def tiny():
    model = build_model("resnet18", use_rnn=True)
    variables = init_model(model, jax.random.PRNGKey(0), (1, 64, 32, 3))
    variables = jax.tree.map(np.asarray, variables)  # host master copy
    rng = np.random.default_rng(0)
    B, H, W = 8, 64, 32
    batch = (rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32),
             rng.normal(0, 0.3, (B, 2, W)).astype(np.float32),
             rng.uniform(0, 1, (B, 1, W)).astype(np.float32))
    return model, variables, batch


def _run_step(model, variables, batch, n_data, n_model):
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    tx = make_optimizer("Adam", warmup_poly_schedule(1e-3, 100))
    state = create_train_state(model, jax.tree.map(jnp.asarray, variables),
                               tx)
    state = shard_state(mesh, state)
    data = NamedSharding(mesh, P("data"))
    x, y_bon, y_cor = (jax.device_put(a, data) for a in batch)
    rng = jax.device_put(jax.random.PRNGKey(7), NamedSharding(mesh, P()))
    new_state, metrics = train_step(model, state, x, y_bon, y_cor, rng)
    return new_state, jax.tree.map(float, metrics)


def test_tp_spec_rules():
    D = jax.tree_util.DictKey
    k4 = jax.ShapeDtypeStruct((3, 3, 64, 128), jnp.float32)
    vec = jax.ShapeDtypeStruct((128,), jnp.float32)
    path_k = (D("encoder"), D("conv"), D("kernel"))
    path_s = (D("height"), D("bn"), D("scale"))
    path_head = (D("linear"), D("bias"))
    assert tp_spec(path_k, k4, 2) == P(None, None, None, "model")
    assert tp_spec(path_s, vec, 2) == P("model")
    # head/LSTM subtrees replicate even when divisible (design: only the
    # conv stacks are tensor-sharded)
    assert tp_spec(path_head, vec, 2) == P()
    assert tp_spec(path_k, k4, 1) == P()          # n_model=1: pure dp
    odd = jax.ShapeDtypeStruct((3, 3, 64, 3), jnp.float32)
    assert tp_spec(path_k, odd, 2) == P()         # indivisible: replicate


def test_params_actually_sharded(tiny):
    model, variables, _ = tiny
    mesh = make_mesh(n_data=4, n_model=2)
    sharded = shard_state(mesh, jax.tree.map(jnp.asarray, variables))
    kernels = [v for p, v in jax.tree_util.tree_flatten_with_path(sharded)[0]
               if hasattr(v, "sharding") and v.ndim == 4]
    assert kernels, "no conv kernels found"
    n_dist = sum(1 for k in kernels
                 if k.sharding.spec == P(None, None, None, "model"))
    assert n_dist >= len(kernels) // 2, \
        f"only {n_dist}/{len(kernels)} conv kernels tensor-sharded"
    k = next(k for k in kernels
             if k.sharding.spec == P(None, None, None, "model"))
    # two distinct shard extents on the cout axis -> truly distributed
    idx = {s.index[3] for s in k.addressable_shards}
    assert len(idx) == 2


@pytest.mark.heavy
def test_tp_step_matches_dp(tiny):
    model, variables, batch = tiny
    _, m_dp = _run_step(model, variables, batch, n_data=8, n_model=1)
    st_tp, m_tp = _run_step(model, variables, batch, n_data=4, n_model=2)
    assert np.isfinite(m_tp["total"])
    # Same math, different reduction layout: agreement to fp tolerance
    assert m_tp["total"] == pytest.approx(m_dp["total"], rel=2e-4)
    assert m_tp["bon"] == pytest.approx(m_dp["bon"], rel=2e-4)
    assert m_tp["cor"] == pytest.approx(m_dp["cor"], rel=2e-4)
    # updated params keep their TP sharding (donation preserves layout)
    flat = jax.tree_util.tree_flatten_with_path(st_tp.params)[0]
    assert any(hasattr(v, "sharding")
               and v.sharding.spec == P(None, None, None, "model")
               for _, v in flat)


@pytest.mark.heavy
def test_train_engine_tp_mesh(tiny):
    """TrainEngine on a (2 data, 2 model) mesh: AOT step runs, loss drops."""
    from horizonnet_tpu.train.engine import TrainEngine

    model, variables, batch = tiny
    tx = make_optimizer("Adam", warmup_poly_schedule(1e-3, 100))
    state = create_train_state(model, jax.tree.map(jnp.asarray, variables),
                               tx)
    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    engine = TrainEngine(model, state, batch_size=4, H=64, W=32, mesh=mesh)
    x, yb, yc = (a[:4] for a in batch)
    losses = [float(engine.step(x, yb, yc, jax.random.PRNGKey(i))["total"])
              for i in range(4)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses
    assert int(engine.host_state().step) == 4
