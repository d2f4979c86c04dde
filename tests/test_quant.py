"""Serving int8 quantization: layer folding math + end-to-end accuracy.

The int8 path is a serving-time transform (models/quant.py): a float
checkpoint's encoder Conv+BN pairs fold into QuantConvBN params and the
quant_int8=True model consumes them. These tests pin (a) the fold math
against the float layer pair, (b) the converted tree matching exactly
what the quant model expects, (c) end-to-end corner accuracy on the
committed trained golden.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "fixtures", "golden")
CKPT = os.path.join(FIXDIR, "resnet18_rnn_synth.ckpt")


def test_quant_conv_bn_matches_float_pair():
    """QuantConvBN with folded+quantized params reproduces WrapConv+BN
    (inference mode) within int8 PTQ error on realistic magnitudes."""
    from horizonnet_tpu.models.layers import (WrapConv, BatchNorm,
                                              QuantConvBN)
    from horizonnet_tpu.models.quant import _fold_quantize

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1.5, (2, 16, 32, 8)).astype(np.float32)
    kernel = rng.normal(0, 0.1, (3, 3, 8, 12)).astype(np.float32)
    bn_p = {"scale": rng.uniform(0.5, 1.5, 12).astype(np.float32),
            "bias": rng.normal(0, 0.2, 12).astype(np.float32)}
    bn_s = {"mean": rng.normal(0, 0.5, 12).astype(np.float32),
            "var": rng.uniform(0.2, 2.0, 12).astype(np.float32)}

    conv = WrapConv(12, (3, 3), (1, 1), (1, 1))
    bn = BatchNorm()
    y = bn.apply({"params": {"bn": {"scale": bn_p["scale"],
                                    "bias": bn_p["bias"]}},
                  "batch_stats": {"bn": {"mean": bn_s["mean"],
                                         "var": bn_s["var"]}}},
                 conv.apply({"params": {"conv": {"kernel": kernel}}},
                            jnp.asarray(x)), False)

    qp = _fold_quantize(kernel, bn_p, bn_s)
    yq = QuantConvBN(12, (3, 3), (1, 1), (1, 1)).apply(
        {"params": qp}, jnp.asarray(x))
    err = np.abs(np.asarray(yq) - np.asarray(y))
    rel = err.max() / (np.abs(np.asarray(y)).max() + 1e-9)
    assert rel < 0.03, rel


@pytest.mark.heavy
def test_quantized_tree_matches_model_expectation():
    """quantize_variables output must be exactly the tree a
    quant_int8=True model initializes (same paths, shapes, dtypes) —
    the contract that keeps the converter and the modules in sync."""
    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.registry import init_model
    from horizonnet_tpu.models.quant import quantize_variables

    model = build_model("resnet18", use_rnn=False)
    variables = init_model(model, jax.random.PRNGKey(0), (1, 64, 128, 3))
    vq = quantize_variables(variables)

    qmodel = build_model("resnet18", use_rnn=False, quant_int8=True)
    ref = init_model(qmodel, jax.random.PRNGKey(0), (1, 64, 128, 3))

    got = jax.tree.map(lambda a: (jnp.shape(a), jnp.asarray(a).dtype), vq)
    want = jax.tree.map(lambda a: (jnp.shape(a), jnp.asarray(a).dtype), ref)
    assert got == want

    # and the quant model actually runs on the converted tree
    x = np.zeros((1, 64, 128, 3), np.float32)
    bon, cor = qmodel.apply(vq, jnp.asarray(x), train=False)
    assert bon.shape == (1, 2, 128) and np.all(np.isfinite(bon))


@pytest.mark.skipif(not os.path.isfile(CKPT),
                    reason="golden fixtures not built")
@pytest.mark.heavy
def test_quant_golden_corners_close_to_float():
    """End-to-end: int8 serving corners on the trained golden stay
    within a few pixels of the float pipeline (the budget dct ingest
    already gets: <2 px)."""
    from PIL import Image
    from horizonnet_tpu.inference import inference
    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.quant import quantize_variables
    from horizonnet_tpu.train.checkpoint import load_trained_model

    model, variables = load_trained_model(CKPT)
    img = np.asarray(Image.open(os.path.join(FIXDIR, "val_room.png")),
                     np.float32)[None] / 255.0

    (cor_f, _, z1_f, _), = inference(model, variables, img,
                                     force_cuboid=True)
    qmodel = build_model("resnet18", use_rnn=True, quant_int8=True)
    vq = quantize_variables(variables)
    (cor_q, _, z1_q, _), = inference(qmodel, vq, img, force_cuboid=True)

    dpx = np.abs(cor_q - cor_f).max() * 512
    assert dpx < 4.0, f"int8 corners drifted {dpx:.2f}px from float"
    assert abs(z1_q - z1_f) < 0.05 * abs(z1_f) + 1.0, (z1_q, z1_f)
