"""Checkpoint-converter tests: build small torch modules with the reference's
parameter naming (including the LR_PAD ``.1`` infix), convert, and compare
numerics through my flax layers.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from horizonnet_tpu.models.torch_convert import _SD  # noqa: E402
from horizonnet_tpu.models.layers import WrapConv, BatchNorm  # noqa: E402
from horizonnet_tpu.ops.pad import wrap_pad_width  # noqa: E402


def _lr_pad_t(x, p=1):
    return torch.cat([x[..., -p:], x, x[..., :p]], dim=3)


def test_wrapconv_matches_torch_conv():
    """Wrap-padded conv vs torch conv on circularly pre-padded input."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 16, 5)).astype(np.float32)  # NHWC
    conv_t = tnn.Conv2d(5, 7, 3, stride=(2, 1), padding=(1, 0), bias=True)
    with torch.no_grad():
        ref = conv_t(_lr_pad_t(torch.from_numpy(x.transpose(0, 3, 1, 2)))).numpy()

    sd = _SD({f"c.{k}": v.detach().numpy() for k, v in conv_t.state_dict().items()})
    params = {"conv": sd.conv_b("c")}
    mod = WrapConv(7, (3, 3), (2, 1), (1, 1), use_bias=True)
    got = mod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.array(got).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_grouped_conv_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 6, 10, 8)).astype(np.float32)
    conv_t = tnn.Conv2d(8, 8, 3, padding=(1, 0), groups=4, bias=False)
    with torch.no_grad():
        ref = conv_t(_lr_pad_t(torch.from_numpy(x.transpose(0, 3, 1, 2)))).numpy()
    sd = _SD({f"c.{k}": v.detach().numpy() for k, v in conv_t.state_dict().items()})
    mod = WrapConv(8, (3, 3), (1, 1), (1, 1), groups=4)
    got = mod.apply({"params": {"conv": sd.conv("c")}}, jnp.asarray(x))
    np.testing.assert_allclose(np.array(got).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_batchnorm_matches_torch_eval():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 4, 6, 10)).astype(np.float32)
    bn_t = tnn.BatchNorm2d(10)
    with torch.no_grad():
        bn_t.running_mean.uniform_(-1, 1)
        bn_t.running_var.uniform_(0.5, 2)
        bn_t.weight.uniform_(0.5, 1.5)
        bn_t.bias.uniform_(-1, 1)
    bn_t.eval()
    with torch.no_grad():
        ref = bn_t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    sd = _SD({f"b.{k}": v.detach().numpy() for k, v in bn_t.state_dict().items()})
    p, s = sd.bn("b")
    got = BatchNorm().apply({"params": {"bn": p}, "batch_stats": {"bn": s}},
                            jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.array(got).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_sd_accessor_handles_lr_pad_infix():
    """wrap_lr_pad turns 'conv1.weight' into 'conv1.1.weight'; both resolve."""
    w = np.zeros((4, 3, 3, 3), np.float32)
    sd = _SD({"enc.conv1.1.weight": w})
    assert sd.get("enc.conv1.weight") is w
    sd2 = _SD({"enc.conv1.weight": w})
    assert sd2.get("enc.conv1.weight") is w
    with pytest.raises(KeyError):
        sd.get("enc.conv2.weight")


def test_convcompress_matches_torch_sequential():
    """ConvCompressH block: wrapped conv (bias) + BN + ReLU vs torch."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 8, 12, 6)).astype(np.float32)
    seq = tnn.Sequential(
        tnn.Conv2d(6, 4, 3, stride=(2, 1), padding=(1, 0), bias=True),
        tnn.BatchNorm2d(4),
        tnn.ReLU(),
    )
    seq.eval()
    with torch.no_grad():
        seq[1].running_mean.uniform_(-0.5, 0.5)
        seq[1].running_var.uniform_(0.5, 2)
        ref = seq(_lr_pad_t(torch.from_numpy(x.transpose(0, 3, 1, 2)))).numpy()

    # Reference-style names: layers.0.1.{weight,bias} (LR_PAD-wrapped conv)
    raw = {}
    for k, v in seq.state_dict().items():
        idx, leaf = k.split(".", 1)
        if idx == "0":
            raw[f"layers.0.1.{leaf}"] = v.detach().numpy()
        else:
            raw[f"layers.1.{leaf}"] = v.detach().numpy()
    sd = _SD(raw)

    from horizonnet_tpu.models.height import ConvCompressH
    params = {"conv": {"conv": sd.conv_b("layers.0")}}
    p, s = sd.bn("layers.1")
    params["bn"] = {"bn": p}
    got = ConvCompressH(4).apply(
        {"params": params, "batch_stats": {"bn": {"bn": s}}},
        jnp.asarray(x), False)
    np.testing.assert_allclose(np.array(got).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_load_checkpoint_formats(tmp_path):
    """load_torch_checkpoint must handle all three wild formats: (a) the
    self-describing {args,kwargs,state_dict} of misc/utils.py:49-58, (b)
    the training checkpoint.pth.tar {epoch,state_dict,optimizer,backbone}
    of train.py:33-37 (backbone at top level, no kwargs), and (c) a bare
    state_dict — plus DataParallel 'module.'-prefixed keys."""
    from horizonnet_tpu.models.torch_convert import load_torch_checkpoint

    w = torch.ones(2, 3)
    # (a) self-describing
    p = tmp_path / "a.pth"
    torch.save({"args": {}, "kwargs": {"backbone": "resnet18",
                                       "use_rnn": True},
                "state_dict": {"feature_extractor.conv1.weight": w}}, p)
    sd, kw = load_torch_checkpoint(str(p))
    assert kw["backbone"] == "resnet18"
    assert "feature_extractor.conv1.weight" in sd

    # (b) train-checkpoint format: top-level backbone honored
    p = tmp_path / "b.pth.tar"
    torch.save({"epoch": 7, "backbone": "resnet34",
                "best_valid_score": 0.5, "optimizer": {},
                "state_dict": {"module.feature_extractor.conv1.weight": w}},
               p)
    sd, kw = load_torch_checkpoint(str(p))
    assert kw["backbone"] == "resnet34"
    # DataParallel prefix stripped
    assert "feature_extractor.conv1.weight" in sd

    # (c) bare state_dict
    p = tmp_path / "c.pth"
    torch.save({"feature_extractor.conv1.weight": w}, p)
    sd, kw = load_torch_checkpoint(str(p))
    assert kw == {} and "feature_extractor.conv1.weight" in sd
    assert isinstance(sd["feature_extractor.conv1.weight"], np.ndarray)
