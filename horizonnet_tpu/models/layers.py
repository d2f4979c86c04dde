"""Shared NN layers: wrap-padded conv, batch norm, max pool (NHWC).

The reference wraps every Conv2d with horizontal circular padding
(model.py:27-55, wrap_lr_pad). Here the wrap is explicit in the conv layer.
MaxPool keeps zero/-inf edge padding exactly like torch (the reference does
NOT wrap-pad pooling — only convs).
"""

from typing import Tuple

import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from ..ops.pad import wrap_pad_width
from ..ops.lstm import matmul_precision


class WrapConv(nn.Module):
    """Conv2d with zero padding on H and circular (wrap) padding on W.

    NHWC. kernel: (kh, kw); strides (sh, sw); optional groups.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)  # (pad_h, pad_w)
    use_bias: bool = False
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ph, pw = self.padding
        if pw > 0:
            x = wrap_pad_width(x, pw, axis=2)  # NHWC width axis
        conv = nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=((ph, ph), (0, 0)),
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            dtype=self.dtype,
            precision=matmul_precision(self.dtype),
            name="conv",
        )
        return conv(x)


class QuantConvBN(nn.Module):
    """Serving-only int8 conv with its BatchNorm folded in.

    Parameters (built by models/quant.py quantize_variables from a float
    checkpoint — never trained directly): ``kernel_q`` int8
    [kh, kw, in/groups, out] symmetric per-out-channel, ``scale`` f32
    [out] (the per-channel weight step with the BN gamma/sigma folded
    in), ``bias`` f32 [out] (the folded BN shift). The activation is
    quantized per-tensor with a dynamic max-abs scale, the conv
    accumulates int8 x int8 -> int32 on the MXU's double-rate integer
    path, and the result is dequantized + biased in f32.

    Padding semantics match WrapConv (wrap on W, zeros on H) — zeros are
    exact in the quantized domain. Inference only: BN is folded, so
    there is no train mode.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)  # (pad_h, pad_w)
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1] // self.groups
        kq = self.param("kernel_q", nn.initializers.zeros,
                        (kh, kw, in_ch, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        ph, pw = self.padding
        if pw > 0:
            xq = wrap_pad_width(xq, pw, axis=2)
        y = lax.conv_general_dilated(
            xq, kq, self.strides, ((ph, ph), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * (scale * sx) + bias
        return out.astype(self.dtype)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch semantics (eps 1e-5, momentum 0.1).

    Stats update uses torch's convention: new = (1-m)*old + m*batch, with
    batch variance computed unbiased for the running estimate but biased for
    normalization (matches torch). flax's nn.BatchNorm uses momentum as the
    retention factor, so we pass 1 - 0.1.
    """

    momentum: float = 0.1
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,
            epsilon=self.eps,
            dtype=self.dtype,
            name="bn",
        )
        return bn(x)


def max_pool_same_as_torch(x, window=3, stride=2, padding=1, wrap_width=False):
    """torch MaxPool2d(kernel, stride, padding) on NHWC (pads with -inf).

    wrap_width=True circularly pads the width instead, making the pool
    seam-free. The reference (and torch checkpoints) use edge padding — the
    one place the reference CNN is NOT seam-equivariant — so the default
    stays torch-compatible; pass True when training from scratch
    (HorizonNet(seam_pool=True)) for exact roll equivariance.
    """
    # -inf exactly: JAX's reverse-mode rule for reduce_window only
    # recognizes max-pooling with a -inf identity
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    if wrap_width:
        x = wrap_pad_width(x, padding, axis=2)
        wpad = (0, 0)
    else:
        wpad = (padding, padding)
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), wpad, (0, 0)),
    )


def avg_pool_2x2(x):
    """torch AvgPool2d(2, 2) on NHWC (DenseNet transition layers)."""
    return lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    ) / 4.0
