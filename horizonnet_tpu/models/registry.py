"""Backbone registry and model construction (reference model.py:18-24)."""

import jax
import jax.numpy as jnp

from .horizonnet import HorizonNet

ENCODER_RESNET = [
    "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "resnext50_32x4d", "resnext101_32x8d",
]
ENCODER_DENSENET = [
    "densenet121", "densenet169", "densenet161", "densenet201",
]


def build_model(backbone: str = "resnet50", use_rnn: bool = True,
                dtype=jnp.float32, seam_pool: bool = False,
                bn_momentum: float = 0.1,
                lstm_impl: str = "scan",
                s2d_stem: bool = False,
                quant_int8: bool = False,
                fused_blocks: str = "") -> HorizonNet:
    if backbone not in ENCODER_RESNET + ENCODER_DENSENET:
        raise ValueError(f"unknown backbone {backbone!r}")
    if quant_int8 and s2d_stem:
        raise ValueError("quant_int8 and s2d_stem are mutually exclusive "
                         "(the quant stem is the plain 7x7 path)")
    if fused_blocks and backbone not in ENCODER_RESNET:
        raise ValueError("fused_blocks covers the resnet bottleneck "
                         "family (ops/pallas_block.py)")
    return HorizonNet(backbone=backbone, use_rnn=use_rnn, dtype=dtype,
                      seam_pool=seam_pool, bn_momentum=bn_momentum,
                      lstm_impl=lstm_impl, s2d_stem=s2d_stem,
                      quant_int8=quant_int8, fused_blocks=fused_blocks)


def init_model(model: HorizonNet, key, input_shape=(1, 512, 1024, 3)):
    """Initialize variables: returns {'params': ..., 'batch_stats': ...}.

    Runs on host CPU under one jit: eager init would dispatch thousands of
    tiny ops to the accelerator (catastrophic over a remote-TPU tunnel),
    and the forward pass at init time contributes nothing to the params.
    The caller device_puts the result where it wants it.
    """
    cpu = jax.local_devices(backend="cpu")[0]
    x = jnp.zeros(input_shape, jnp.float32)

    def init_fn(k, x):
        return model.init({"params": k}, x, train=False)

    with jax.default_device(cpu):
        return jax.jit(init_fn)(key, x)
