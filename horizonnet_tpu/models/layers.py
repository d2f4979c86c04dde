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

from ..ops.pad import seam_layout, wrap_pad_width
from ..ops.lstm import matmul_precision


class _ConvParams(nn.Module):
    """Parameter holder keeping nn.Conv's tree layout (conv/kernel[,bias]).

    WrapConv applies the same kernel twice (main conv + seam strip), so
    the kernel is declared once here instead of inside two nn.Conv
    instances. Named "conv" by the caller, the checkpoint tree is
    byte-identical to the previous nn.Conv-based WrapConv — and init
    values too (same lecun_normal, same param path -> same fold of the
    init RNG).
    """

    shape: Tuple[int, int, int, int]
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            self.shape)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.shape[-1],)) if self.use_bias else None)
        return kernel, bias


class WrapConv(nn.Module):
    """Conv2d with zero padding on H and circular (wrap) padding on W.

    NHWC. kernel: (kh, kw); strides (sh, sw); optional groups.

    Seam handling: the default materializes the circular pad
    (ops.pad.wrap_pad_width) before the conv, like the reference's
    LR_PAD (model.py:27-55). ``seam_fix=True`` instead runs the conv
    with zero width padding baked into the conv op and recomputes only
    the seam-crossing output columns (1-2 per edge) from a
    ~(kw+sw)-column wrapped strip, written back in place — identical
    math (bit-exact, tests/test_model.py), designed to remove a
    presumed full-tensor pad copy. MEASURED NEGATIVE on v5e serving
    (round 4): 554.8 vs 616.4 panos/s device pipeline — XLA already
    fuses the pad concat into the conv input on TPU, so the strip
    convs + in-place updates only add overhead. Kept as an option for
    backends where pad concats do materialize.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)  # (pad_h, pad_w)
    use_bias: bool = False
    groups: int = 1
    dtype: jnp.dtype = jnp.float32
    seam_fix: bool = False

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        sh, sw = self.strides
        ph, pw = self.padding
        W = x.shape[2]
        kernel, bias = _ConvParams(
            (kh, kw, x.shape[-1] // self.groups, self.features),
            self.use_bias, name="conv")()

        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        prec = matmul_precision(self.dtype)

        def conv(inp, wpad):
            return lax.conv_general_dilated(
                inp, kd, (sh, sw), ((ph, ph), wpad),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups, precision=prec)

        layout = (seam_layout(W, kw, sw, pw)
                  if (pw > 0 and self.seam_fix) else None)
        if pw == 0:
            y = conv(xd, (0, 0))
        elif layout is None:
            y = conv(wrap_pad_width(xd, pw, axis=2), (0, 0))
        else:
            n_left, n_right, a, b = layout
            y = conv(xd, (pw, pw))
            strip = jnp.concatenate(
                [lax.slice_in_dim(xd, W - a, W, axis=2),
                 lax.slice_in_dim(xd, 0, b, axis=2)], axis=2)
            ys = conv(strip, (0, 0))
            y = lax.dynamic_update_slice_in_dim(
                y, ys[:, :, n_right:], 0, axis=2)
            if n_right:
                y = lax.dynamic_update_slice_in_dim(
                    y, ys[:, :, :n_right], y.shape[2] - n_right, axis=2)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


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
