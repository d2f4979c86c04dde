"""Model tests: shapes, conv/BN parity vs torch, forward determinism."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from horizonnet_tpu.models import build_model
from horizonnet_tpu.models.registry import init_model
from horizonnet_tpu.models.layers import max_pool_same_as_torch
from horizonnet_tpu.models.resnet import resnet_feature_channels
from horizonnet_tpu.models.densenet import densenet_feature_channels


def test_feature_channels():
    assert resnet_feature_channels("resnet50") == (256, 512, 1024, 2048)
    assert resnet_feature_channels("resnet18") == (64, 128, 256, 512)
    assert densenet_feature_channels("densenet121") == (256, 512, 1024, 1024)
    assert densenet_feature_channels("densenet161") == (384, 768, 2112, 2208)


def test_maxpool_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 5)).astype(np.float32)
    ref = torch.nn.functional.max_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, 2, 1).numpy()
    got = np.array(max_pool_same_as_torch(jnp.asarray(x), 3, 2, 1))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=1e-6)


@pytest.mark.heavy
def test_horizonnet_forward_shapes_small():
    """Shape-polymorphic forward on a tiny pano (fast CPU test)."""
    model = build_model("resnet18", use_rnn=True)
    key = jax.random.PRNGKey(0)
    variables = init_model(model, key, (1, 128, 256, 3))
    x = jnp.zeros((2, 128, 256, 3))
    bon, cor = model.apply(variables, x, train=False)
    assert bon.shape == (2, 2, 256)
    assert cor.shape == (2, 1, 256)


@pytest.mark.heavy
def test_horizonnet_nornn_forward():
    model = build_model("resnet18", use_rnn=False)
    key = jax.random.PRNGKey(1)
    variables = init_model(model, key, (1, 128, 256, 3))
    x = jnp.zeros((1, 128, 256, 3))
    bon, cor = model.apply(variables, x, train=False)
    assert bon.shape == (1, 2, 256)
    assert cor.shape == (1, 1, 256)


def test_head_bias_prior():
    """Fresh model on zero input emits the bias priors (cor<0 => sigmoid<0.27,
    ceiling bon approx -0.478, floor approx 0.425), ref model.py:231-233."""
    model = build_model("resnet18", use_rnn=True)
    variables = init_model(model, jax.random.PRNGKey(2), (1, 128, 256, 3))
    b = np.array(variables["params"]["linear"]["bias"])
    np.testing.assert_allclose(b[:4], -1.0)
    np.testing.assert_allclose(b[4:8], -0.478)
    np.testing.assert_allclose(b[8:12], 0.425)


def test_wrap_conv_seam_equivariance():
    """Rolling the input pano rolls the output: the whole CNN is seam-free.

    This is the property the reference's wrap_lr_pad monkey-patch exists to
    provide (model.py:42-55). Verified through the encoder + height stage +
    per-column MLP head (the LSTM head is inherently not roll-equivariant —
    it carries state from a fixed start column — so use_rnn=False isolates
    the convolutional seam behavior). seam_pool=True wrap-pads the maxpool,
    the one op where torch parity would break exact equivariance.
    """
    model = build_model("resnet18", use_rnn=False, seam_pool=True)
    variables = init_model(model, jax.random.PRNGKey(3), (1, 128, 256, 3))
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 128, 256, 3))
    bon1, _ = model.apply(variables, x, train=False)
    # Roll by 64 columns = 16 LSTM steps (multiple of total stride 4*4)
    x_rolled = jnp.roll(x, 64, axis=2)
    bon2, _ = model.apply(variables, x_rolled, train=False)
    np.testing.assert_allclose(np.array(jnp.roll(bon1, 64, axis=-1)),
                               np.array(bon2), atol=1e-5)


@pytest.mark.heavy
def test_densenet121_forward():
    model = build_model("densenet121", use_rnn=False)
    variables = init_model(model, jax.random.PRNGKey(5), (1, 128, 256, 3))
    bon, cor = model.apply(variables, jnp.zeros((1, 128, 256, 3)), train=False)
    assert bon.shape == (1, 2, 256)
    assert np.isfinite(np.array(bon)).all()


@pytest.mark.heavy
def test_resnext50_forward():
    model = build_model("resnext50_32x4d", use_rnn=False)
    variables = init_model(model, jax.random.PRNGKey(6), (1, 64, 128, 3))
    bon, cor = model.apply(variables, jnp.zeros((1, 64, 128, 3)), train=False)
    assert bon.shape == (1, 2, 128)
    assert np.isfinite(np.array(bon)).all()


@pytest.mark.heavy
def test_train_mode_updates_bn_stats():
    model = build_model("resnet18", use_rnn=False)
    variables = init_model(model, jax.random.PRNGKey(7), (1, 64, 128, 3))
    x = jax.random.uniform(jax.random.PRNGKey(8), (2, 64, 128, 3))
    out, mutated = model.apply(variables, x, train=True,
                               rngs={"dropout": jax.random.PRNGKey(9)},
                               mutable=["batch_stats"])
    before = variables["batch_stats"]["encoder"]["bn1"]["bn"]["mean"]
    after = mutated["batch_stats"]["encoder"]["bn1"]["bn"]["mean"]
    assert not np.allclose(np.array(before), np.array(after))


@pytest.mark.parametrize("backbone", [
    "resnet18",
    pytest.param("densenet121", marks=pytest.mark.heavy),
])
def test_s2d_stem_matches_standard_stem(backbone):
    """The space-to-depth stem rewrite (models/resnet.py S2DStemConv) is
    the same math as WrapConv(7x7, s2, p3) on the same parameter tree:
    identical param paths/shapes, outputs equal to fp tolerance."""
    std = build_model(backbone, use_rnn=True)
    s2d = build_model(backbone, use_rnn=True, s2d_stem=True)
    variables = init_model(std, jax.random.PRNGKey(0), (1, 64, 128, 3))

    chex = jax.tree_util.tree_structure(variables)
    assert chex == jax.tree_util.tree_structure(
        init_model(s2d, jax.random.PRNGKey(1), (1, 64, 128, 3)))

    x = jnp.asarray(np.random.default_rng(2)
                    .uniform(0, 1, (2, 64, 128, 3)), jnp.float32)
    bon_a, cor_a = std.apply(variables, x, train=False)
    bon_b, cor_b = s2d.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(bon_b), np.asarray(bon_a),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(cor_b), np.asarray(cor_a),
                               atol=2e-4)


@pytest.mark.heavy
def test_s2d_stem_gradients_match():
    """Identical math => identical gradients: the s2d stem is safe for
    training (cli.train --s2d_stem) with checkpoint interop both ways."""
    import jax.numpy as _jnp

    std = build_model("resnet18", use_rnn=False)
    s2d = build_model("resnet18", use_rnn=False, s2d_stem=True)
    variables = init_model(std, jax.random.PRNGKey(0), (1, 64, 128, 3))
    x = jnp.asarray(np.random.default_rng(5)
                    .uniform(0, 1, (2, 64, 128, 3)), jnp.float32)

    def loss(m):
        def f(params):
            bon, cor = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=False)
            return _jnp.mean(bon ** 2) + _jnp.mean(cor ** 2)
        return f

    g_std = jax.grad(loss(std))(variables["params"])
    g_s2d = jax.grad(loss(s2d))(variables["params"])
    for a, b in zip(jax.tree.leaves(g_std), jax.tree.leaves(g_s2d)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-6)


def test_wrap_conv_seam_fix_bit_exact():
    """WrapConv(seam_fix=True) — zero-padded conv + seam-column strip
    recompute — must match the materialized wrap-pad default exactly,
    across kernel/stride/groups/bias variants (incl. the stem's 7x7/s2
    and the odd-width fallback). Measured slower on v5e (kept for
    backends where pad concats materialize; see ops/pad.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from horizonnet_tpu.models.layers import WrapConv
    from horizonnet_tpu.ops.pad import seam_layout

    rng = np.random.default_rng(0)
    cases = [(3, 1, 1, 32, 1, False), (7, 2, 3, 64, 1, False),
             (3, 2, 1, 32, 1, False), (5, 1, 2, 40, 1, True),
             (3, 1, 1, 32, 4, False), (3, 1, 1, 30, 2, False)]
    for kw, sw, pw, W, groups, bias in cases:
        x = jnp.asarray(rng.normal(0, 1, (2, 8, W, 8)), jnp.float32)
        kw_h = min(kw, 5)
        ref = WrapConv(16, (kw_h, kw), (1, sw), (0, pw), use_bias=bias,
                       groups=groups)
        fix = WrapConv(16, (kw_h, kw), (1, sw), (0, pw), use_bias=bias,
                       groups=groups, seam_fix=True)
        v = ref.init(jax.random.PRNGKey(0), x)
        y0 = ref.apply(v, x)
        y1 = fix.apply(v, x)   # same param tree by construction
        assert y0.shape == y1.shape
        assert float(jnp.abs(y1 - y0).max()) == 0.0, (kw, sw, pw, W)

    # stride-2 3x3: no seam-crossing right column (n_right == 0 branch)
    assert seam_layout(32, 3, 2, 1) == (1, 0, 1, 2)
    # even kernel / asymmetric pad: no fast path
    assert seam_layout(32, 4, 1, 1) is None
