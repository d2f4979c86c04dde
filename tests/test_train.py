"""Training tests: SPMD step over the CPU mesh, engine, checkpoints, LR."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from horizonnet_tpu.models import build_model
from horizonnet_tpu.models.registry import init_model
from horizonnet_tpu.parallel import make_mesh, shard_batch, replicated
from horizonnet_tpu.train import (create_train_state, train_step,
                                  eval_losses, warmup_poly_schedule)
from horizonnet_tpu.train.step import make_optimizer, encoder_freeze_mask, \
    loss_terms
from horizonnet_tpu.train.engine import TrainEngine
from horizonnet_tpu.train.checkpoint import (save_model, load_trained_model,
                                             save_checkpoint, load_checkpoint)


@pytest.fixture(scope="module")
def tiny_model():
    model = build_model("resnet18", use_rnn=True)
    variables = init_model(model, jax.random.PRNGKey(0), (1, 64, 128, 3))
    # Keep the canonical copy on host: tests donate their device states,
    # and donated buffers may alias a shared device copy
    variables = jax.tree.map(np.asarray, variables)
    return model, variables


@pytest.fixture()
def tiny_setup(tiny_model):
    model, variables = tiny_model
    tx = make_optimizer("Adam", warmup_poly_schedule(1e-3, 100))
    state = create_train_state(model, jax.tree.map(jnp.asarray, variables),
                               tx)
    return model, variables, state


def test_schedule_warmup_and_poly():
    s = warmup_poly_schedule(1e-4, max_iters=1000, warmup_lr=1e-6,
                             warmup_iters=100, lr_pow=0.9)
    assert float(s(0)) == pytest.approx(1e-6)
    assert float(s(100)) == pytest.approx(1e-4, rel=1e-3)
    assert float(s(1000)) == pytest.approx(0.0, abs=1e-9)
    mid = float(s(550))
    assert 0 < mid < 1e-4


def test_loss_terms_match_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    bp = rng.normal(size=(2, 2, 32)).astype(np.float32)
    bt = rng.normal(size=(2, 2, 32)).astype(np.float32)
    cp = rng.normal(size=(2, 1, 32)).astype(np.float32)
    ct = rng.uniform(0, 1, (2, 1, 32)).astype(np.float32)
    bon, cor = loss_terms(jnp.asarray(bp), jnp.asarray(cp),
                          jnp.asarray(bt), jnp.asarray(ct))
    ref_bon = F.l1_loss(torch.from_numpy(bp), torch.from_numpy(bt)).item()
    ref_cor = F.binary_cross_entropy_with_logits(
        torch.from_numpy(cp), torch.from_numpy(ct)).item()
    assert float(bon) == pytest.approx(ref_bon, rel=1e-5)
    assert float(cor) == pytest.approx(ref_cor, rel=1e-5)


@pytest.mark.heavy
def test_train_step_over_mesh(tiny_setup):
    model, variables, state = tiny_setup
    mesh = make_mesh()  # all 8 virtual devices
    # NOTE: device_put to a replicated sharding may alias the source
    # device-0 buffer as a shard; donation in train_step then deletes the
    # original arrays too. Snapshot to host before stepping.
    p0 = np.asarray(state.params["linear"]["kernel"])
    state_r = jax.tree.map(
        lambda a: jax.device_put(a, replicated(mesh))
        if hasattr(a, "dtype") else a, state)
    B = 8
    rng = np.random.default_rng(0)
    x, yb, yc = shard_batch(mesh, (
        jnp.asarray(rng.uniform(0, 1, (B, 64, 128, 3)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.3, (B, 2, 128)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (B, 1, 128)), jnp.float32)))
    new_state, metrics = train_step(model, state_r, x, yb, yc,
                                    jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))
    assert int(new_state.step) == 1
    # params actually changed
    p1 = new_state.params["linear"]["kernel"]
    assert not np.allclose(p0, np.asarray(p1))


@pytest.mark.heavy
def test_train_engine_loss_decreases(tiny_setup):
    model, variables, state = tiny_setup
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    engine = TrainEngine(model, state, batch_size=2, H=64, W=128, mesh=mesh)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 64, 128, 3)).astype(np.float32)
    yb = rng.normal(0, 0.3, (2, 2, 128)).astype(np.float32)
    yc = rng.uniform(0, 1, (2, 1, 128)).astype(np.float32)
    losses = []
    for i in range(5):
        m = engine.step(x, yb, yc, jax.random.PRNGKey(i))
        losses.append(float(m["total"]))
    assert losses[-1] < losses[0], losses
    hs = engine.host_state()
    assert int(hs.step) == 5


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    model, variables, state = tiny_setup
    path = str(tmp_path / "model.ckpt")
    save_model(path, variables, "resnet18", True, args={"x": 1})
    model2, v2 = load_trained_model(path)
    assert model2.backbone == "resnet18" and model2.use_rnn
    chex = pytest.importorskip("chex")
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), variables["params"], v2["params"])
    # Model applies with loaded variables
    out = model2.apply(v2, jnp.zeros((1, 64, 128, 3)), train=False)
    assert out[0].shape == (1, 2, 128)


@pytest.mark.heavy
def test_train_checkpoint_resume(tiny_setup, tmp_path):
    model, variables, state = tiny_setup
    # advance one step so opt_state is non-trivial
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 128, 3)), jnp.float32)
    yb = jnp.asarray(rng.normal(0, 0.3, (1, 2, 128)), jnp.float32)
    yc = jnp.asarray(rng.uniform(0, 1, (1, 1, 128)), jnp.float32)
    state1, _ = train_step(model, state, x, yb, yc, jax.random.PRNGKey(0))

    ckpt_dir = str(tmp_path)
    save_checkpoint(ckpt_dir, state1, "resnet18", True, epoch=1,
                    best_valid_score=0.5, is_best=True)
    assert os.path.isfile(os.path.join(ckpt_dir, "best_model_1.ckpt"))

    fresh = create_train_state(model, variables, state.tx)
    restored, header = load_checkpoint(
        os.path.join(ckpt_dir, "checkpoint.ckpt"), fresh)
    assert header["epoch"] == 1
    assert header["best_valid_score"] == 0.5
    assert int(restored.step) == 1
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), state1.params, restored.params)


def test_freeze_mask_blocks():
    model = build_model("resnet18", use_rnn=False)
    variables = init_model(model, jax.random.PRNGKey(0), (1, 64, 128, 3))
    mask = encoder_freeze_mask(variables["params"], 1)
    # conv1/bn1 (block0) and layer1 frozen; layer2+ trainable
    assert not jax.tree.leaves(mask["encoder"]["conv1"])[0]
    assert not jax.tree.leaves(mask["encoder"]["layer1_0"])[0]
    assert jax.tree.leaves(mask["encoder"]["layer2_0"])[0]
    assert jax.tree.leaves(mask["height"])[0]


def test_orbax_checkpoint_roundtrip(tiny_setup, tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from horizonnet_tpu.train.orbax_io import (save_checkpoint_orbax,
                                               load_checkpoint_orbax)
    model, variables, state = tiny_setup
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 128, 3)), jnp.float32)
    yb = jnp.asarray(rng.normal(0, 0.3, (1, 2, 128)), jnp.float32)
    yc = jnp.asarray(rng.uniform(0, 1, (1, 1, 128)), jnp.float32)
    state1, _ = train_step(model, state, x, yb, yc, jax.random.PRNGKey(0))

    path = save_checkpoint_orbax(str(tmp_path), state1, "resnet18", True,
                                 epoch=3, best_valid_score=0.7)
    fresh = create_train_state(model, jax.tree.map(jnp.asarray, variables),
                               state.tx)
    restored, meta = load_checkpoint_orbax(path, fresh)
    assert meta["epoch"] == 3
    assert meta["kwargs"]["backbone"] == "resnet18"
    assert int(restored.step) == 1
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), state1.params, restored.params)
