"""Fused Pallas bottleneck block (ops/pallas_block.py) vs the unfused path.

The fused path must be a drop-in: identical variable tree (checkpoints
round-trip), identical math (BN folded, WrapConv padding semantics — wrap W,
zero H, ref model.py:27-55) to activation-dtype tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax
import pytest

from horizonnet_tpu.models.resnet import Bottleneck
from horizonnet_tpu.models import build_model
from horizonnet_tpu.models.registry import init_model


def _randomized_bn_vars(module, x, seed):
    """Init, then randomize the BN affine + running stats so the fold is
    non-trivial (fresh init has scale=1/bias=0/mean=0/var=1, which would
    mask fold bugs)."""
    rng = np.random.default_rng(seed)
    v = flax.core.unfreeze(module.init(jax.random.PRNGKey(1), x,
                                       train=False))
    for bn in ("bn1", "bn2", "bn3"):
        ch = v["params"][bn]["bn"]["scale"].shape[0]
        v["params"][bn]["bn"]["scale"] = jnp.asarray(
            rng.uniform(0.5, 1.5, ch), jnp.float32)
        v["params"][bn]["bn"]["bias"] = jnp.asarray(
            rng.normal(size=ch), jnp.float32)
        v["batch_stats"][bn]["bn"]["mean"] = jnp.asarray(
            rng.normal(size=ch), jnp.float32)
        v["batch_stats"][bn]["bn"]["var"] = jnp.asarray(
            rng.uniform(0.3, 2.0, ch), jnp.float32)
    return v


@pytest.mark.parametrize("B,H,W,C", [
    (2, 16, 32, 64),     # single tile (nH=1): both halos are zero rows
    (1, 64, 32, 64),     # 4 tiles: interior halos cross tile boundaries
    (2, 32, 16, 256),    # stage1-like channel count
    (1, 16, 8, 2048),    # stage4 channels: TH drops to 8
])
def test_fused_bottleneck_matches_unfused_f32(B, H, W, C):
    rng = np.random.default_rng(C + H)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    ref = Bottleneck(C // 4, 1, False)
    fus = Bottleneck(C // 4, 1, False, fused="pallas_interpret")
    v = _randomized_bn_vars(ref, x, seed=C)
    y_ref = ref.apply(v, x, train=False)
    y_fus = fus.apply(v, x, train=False)
    rel = (float(jnp.max(jnp.abs(y_ref - y_fus)))
           / float(jnp.max(jnp.abs(y_ref))))
    assert rel < 2e-5, rel


def test_fused_bottleneck_bf16_tolerance():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 64)).astype(np.float32))
    ref = Bottleneck(16, 1, False, dtype=jnp.bfloat16)
    fus = Bottleneck(16, 1, False, dtype=jnp.bfloat16,
                     fused="pallas_interpret")
    v = _randomized_bn_vars(ref, x, seed=3)
    y_ref = ref.apply(v, x, train=False).astype(jnp.float32)
    y_fus = fus.apply(v, x, train=False).astype(jnp.float32)
    rel = (float(jnp.max(jnp.abs(y_ref - y_fus)))
           / float(jnp.max(jnp.abs(y_ref))))
    assert rel < 3e-2, rel


def test_fused_variable_tree_identical():
    """Same tree structure AND same init values as the unfused block, so
    every checkpoint (ours or converted torch) loads unchanged."""
    x = jnp.zeros((1, 16, 32, 256), jnp.float32)
    ref = Bottleneck(64, 1, False)
    fus = Bottleneck(64, 1, False, fused="pallas_interpret")
    v_ref = ref.init(jax.random.PRNGKey(7), x, train=False)
    v_fus = fus.init(jax.random.PRNGKey(7), x, train=False)
    assert (jax.tree_util.tree_structure(v_ref)
            == jax.tree_util.tree_structure(v_fus))
    same = jax.tree.map(lambda a, b: bool(jnp.all(a == b)), v_ref, v_fus)
    assert all(jax.tree.leaves(same))


def test_fused_full_model_forward():
    """build_model(fused_blocks=...) end to end on a small pano: same
    variables as the plain model, bon/cor within bf16-free tolerance."""
    model = build_model("resnet50", use_rnn=True)
    fused = build_model("resnet50", use_rnn=True,
                        fused_blocks="pallas_interpret")
    variables = init_model(model, jax.random.PRNGKey(0), (1, 64, 128, 3))
    v_fused = init_model(fused, jax.random.PRNGKey(0), (1, 64, 128, 3))
    same = jax.tree.map(lambda a, b: bool(jnp.all(a == b)),
                        variables, v_fused)
    assert all(jax.tree.leaves(same))

    x = jnp.asarray(np.random.default_rng(1)
                    .uniform(size=(1, 64, 128, 3)).astype(np.float32))
    bon_r, cor_r = model.apply(variables, x, train=False)
    bon_f, cor_f = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(bon_f), np.asarray(bon_r),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(cor_f), np.asarray(cor_r),
                               atol=2e-4, rtol=1e-3)


def test_fused_train_mode_falls_back():
    """train=True must take the unfused path (fused is serving-only) and
    produce BN batch_stats mutations like the plain block."""
    x = jnp.zeros((2, 16, 32, 256), jnp.float32)
    fus = Bottleneck(64, 1, False, fused="pallas_interpret")
    v = fus.init(jax.random.PRNGKey(0), x, train=False)
    y, mutated = fus.apply(v, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mutated
    assert y.shape == x.shape
