"""Full-checkpoint converter test against a name-accurate synthetic
state_dict (the key layout the reference's wrap_lr_pad'd torch model
produces), catching key-mapping regressions without needing torchvision.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from horizonnet_tpu.models import build_model
from horizonnet_tpu.models.registry import init_model
from horizonnet_tpu.models.torch_convert import torch_state_to_variables


def _bn_keys(sd, name, c):
    sd[f"{name}.weight"] = np.random.rand(c).astype(np.float32)
    sd[f"{name}.bias"] = np.random.rand(c).astype(np.float32)
    sd[f"{name}.running_mean"] = np.random.rand(c).astype(np.float32)
    sd[f"{name}.running_var"] = np.random.rand(c).astype(np.float32) + 0.5
    sd[f"{name}.num_batches_tracked"] = np.int64(0)


def _conv_keys(sd, name, cin, cout, k, wrapped, bias=False, groups=1):
    # wrap_lr_pad inserts ".1" for width-padded convs (model.py:42-55)
    key = f"{name}.1.weight" if wrapped else f"{name}.weight"
    sd[key] = (0.05 * np.random.randn(cout, cin // groups, k, k)).astype(np.float32)
    if bias:
        bkey = f"{name}.1.bias" if wrapped else f"{name}.bias"
        sd[bkey] = (0.05 * np.random.randn(cout)).astype(np.float32)


def _make_reference_style_state_dict(backbone="resnet50"):
    """Emit the exact key set the reference HorizonNet(resnet50, True)
    state_dict has (reference model.py structure + wrap_lr_pad renames)."""
    sd = {}
    pre = "feature_extractor.encoder"
    _conv_keys(sd, f"{pre}.conv1", 3, 64, 7, wrapped=True)
    _bn_keys(sd, f"{pre}.bn1", 64)

    layers = (3, 4, 6, 3)
    cin = 64
    for li, n_blocks in enumerate(layers):
        planes = 64 * 2 ** li
        for bi in range(n_blocks):
            t = f"{pre}.layer{li+1}.{bi}"
            _conv_keys(sd, f"{t}.conv1", cin if bi == 0 else planes * 4,
                       planes, 1, wrapped=False)
            _bn_keys(sd, f"{t}.bn1", planes)
            _conv_keys(sd, f"{t}.conv2", planes, planes, 3, wrapped=True)
            _bn_keys(sd, f"{t}.bn2", planes)
            _conv_keys(sd, f"{t}.conv3", planes, planes * 4, 1, wrapped=False)
            _bn_keys(sd, f"{t}.bn3", planes * 4)
            if bi == 0:
                _conv_keys(sd, f"{t}.downsample.0",
                           cin, planes * 4, 1, wrapped=False)
                _bn_keys(sd, f"{t}.downsample.1", planes * 4)
        cin = planes * 4

    # Height compression: 4 GHC stacks of 4 ConvCompressH
    chans = [256, 512, 1024, 2048]
    for i, c in enumerate(chans):
        seq = [c, c // 2, c // 2, c // 4, c // 8]
        for j in range(4):
            t = f"reduce_height_module.ghc_lst.{i}.layer.{j}.layers"
            _conv_keys(sd, f"{t}.0", seq[j], seq[j + 1], 3, wrapped=True,
                       bias=True)
            _bn_keys(sd, f"{t}.1", seq[j + 1])

    # bi-LSTM + head
    for layer in range(2):
        in_l = 1024
        for sfx in ("", "_reverse"):
            sd[f"bi_rnn.weight_ih_l{layer}{sfx}"] = \
                (0.02 * np.random.randn(4 * 512, in_l)).astype(np.float32)
            sd[f"bi_rnn.weight_hh_l{layer}{sfx}"] = \
                (0.02 * np.random.randn(4 * 512, 512)).astype(np.float32)
            sd[f"bi_rnn.bias_ih_l{layer}{sfx}"] = \
                (0.02 * np.random.randn(4 * 512)).astype(np.float32)
            sd[f"bi_rnn.bias_hh_l{layer}{sfx}"] = \
                (0.02 * np.random.randn(4 * 512)).astype(np.float32)
    sd["linear.weight"] = (0.02 * np.random.randn(12, 1024)).astype(np.float32)
    sd["linear.bias"] = (0.02 * np.random.randn(12)).astype(np.float32)
    sd["x_mean"] = np.zeros((1, 3, 1, 1), np.float32)
    sd["x_std"] = np.ones((1, 3, 1, 1), np.float32)
    return sd


@pytest.mark.heavy
def test_full_resnet50_state_dict_converts_and_applies():
    np.random.seed(0)
    sd = _make_reference_style_state_dict()
    variables = torch_state_to_variables(sd, "resnet50", use_rnn=True)

    # Converted tree must match the freshly-initialized tree exactly in
    # structure and shapes
    model = build_model("resnet50", use_rnn=True)
    # H=512 fixes the LSTM input width (c_last=1024); W can be small
    ref = init_model(model, jax.random.PRNGKey(0), (1, 512, 128, 3))

    def shapes(t):
        return jax.tree.map(lambda a: tuple(np.shape(a)), t)

    assert jax.tree.structure(shapes(ref["params"])) == \
        jax.tree.structure(shapes(variables["params"]))
    mismatches = jax.tree.map(
        lambda a, b: tuple(np.shape(a)) == tuple(np.shape(b)),
        ref["params"], variables["params"])
    assert all(jax.tree.leaves(mismatches))

    # And the model must run with the converted weights
    bon, cor = model.apply(variables, jnp.zeros((1, 512, 128, 3)),
                           train=False)
    assert bon.shape == (1, 2, 128)
    assert np.isfinite(np.asarray(bon)).all()


@pytest.mark.heavy
def test_converter_rejects_missing_keys():
    sd = _make_reference_style_state_dict()
    del sd["linear.weight"]
    with pytest.raises(KeyError):
        torch_state_to_variables(sd, "resnet50", use_rnn=True)


def _make_densenet_state_dict():
    """Reference-style key set for HorizonNet(densenet121, True)."""
    sd = {}
    pre = "feature_extractor.encoder.features"
    _conv_keys(sd, f"{pre}.conv0", 3, 64, 7, wrapped=True)
    _bn_keys(sd, f"{pre}.norm0", 64)
    growth, blocks, n_ch = 32, (6, 12, 24, 16), 64
    for bi, n_layers in enumerate(blocks):
        for li in range(n_layers):
            cin = n_ch + li * growth
            t = f"{pre}.denseblock{bi+1}.denselayer{li+1}"
            _bn_keys(sd, f"{t}.norm1", cin)
            _conv_keys(sd, f"{t}.conv1", cin, 4 * growth, 1, wrapped=False)
            _bn_keys(sd, f"{t}.norm2", 4 * growth)
            _conv_keys(sd, f"{t}.conv2", 4 * growth, growth, 3, wrapped=True)
        n_ch += n_layers * growth
        if bi < len(blocks) - 1:
            _bn_keys(sd, f"{pre}.transition{bi+1}.norm", n_ch)
            _conv_keys(sd, f"{pre}.transition{bi+1}.conv", n_ch, n_ch // 2, 1,
                       wrapped=False)
            n_ch //= 2
    _bn_keys(sd, f"{pre}.norm5", n_ch)

    # Height stage for densenet121 channels (256, 512, 1024, 1024)
    for i, c in enumerate([256, 512, 1024, 1024]):
        seq = [c, c // 2, c // 2, c // 4, c // 8]
        for j in range(4):
            t = f"reduce_height_module.ghc_lst.{i}.layer.{j}.layers"
            _conv_keys(sd, f"{t}.0", seq[j], seq[j + 1], 3, wrapped=True,
                       bias=True)
            _bn_keys(sd, f"{t}.1", seq[j + 1])

    # c_last for densenet121 at H=512: (256*8 + 512*4 + 1024*2 + 1024)/8 = 1088
    c_last = (256 * 8 + 512 * 4 + 1024 * 2 + 1024) // 8
    for layer in range(2):
        in_l = c_last if layer == 0 else 1024
        for sfx in ("", "_reverse"):
            sd[f"bi_rnn.weight_ih_l{layer}{sfx}"] = \
                (0.02 * np.random.randn(4 * 512, in_l)).astype(np.float32)
            sd[f"bi_rnn.weight_hh_l{layer}{sfx}"] = \
                (0.02 * np.random.randn(4 * 512, 512)).astype(np.float32)
            sd[f"bi_rnn.bias_ih_l{layer}{sfx}"] = \
                (0.02 * np.random.randn(4 * 512)).astype(np.float32)
            sd[f"bi_rnn.bias_hh_l{layer}{sfx}"] = \
                (0.02 * np.random.randn(4 * 512)).astype(np.float32)
    sd["linear.weight"] = (0.02 * np.random.randn(12, 1024)).astype(np.float32)
    sd["linear.bias"] = (0.02 * np.random.randn(12)).astype(np.float32)
    return sd


@pytest.mark.slow
def test_densenet121_state_dict_converts_and_applies():
    np.random.seed(1)
    sd = _make_densenet_state_dict()
    variables = torch_state_to_variables(sd, "densenet121", use_rnn=True)
    model = build_model("densenet121", use_rnn=True)
    ref = init_model(model, jax.random.PRNGKey(0), (1, 512, 128, 3))
    same = jax.tree.map(
        lambda a, b: tuple(np.shape(a)) == tuple(np.shape(b)),
        ref["params"], variables["params"])
    assert all(jax.tree.leaves(same))
    bon, cor = model.apply(variables, jnp.zeros((1, 512, 128, 3)),
                           train=False)
    assert bon.shape == (1, 2, 128)
    assert np.isfinite(np.asarray(bon)).all()
