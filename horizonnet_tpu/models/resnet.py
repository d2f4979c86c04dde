"""ResNet / ResNeXt encoder family with wrap-padded convs (NHWC).

Covers the reference's ENCODER_RESNET list (model.py:18-21): resnet18/34/50/
101/152, resnext50_32x4d, resnext101_32x8d. Architecture follows the
torchvision v1.5 convention (stride on the 3x3 conv of bottlenecks) so that
published .pth checkpoints convert weight-for-weight.

Forward returns the 4 feature maps at strides 4/8/16/32 (model.py:71-82).
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.lstm import matmul_precision
from ..ops.pad import wrap_pad_width
from .layers import (WrapConv, BatchNorm, QuantConvBN, _ConvParams,
                     max_pool_same_as_torch)


def _conv_bn(x, features, kernel_size, strides, padding, cname, bname,
             dtype, bn_momentum, quant, train, groups=1):
    """One Conv+BN unit, float or serving-int8.

    Float: WrapConv(name=cname) + BatchNorm(name=bname) — the canonical
    checkpoint tree. Quant: QuantConvBN(name=cname) with the BN folded
    into its params (models/quant.py quantize_variables converts one
    tree to the other); the bn module vanishes from the quant tree.
    """
    if quant:
        assert not train, "int8 path is serving-only (BN folded)"
        return QuantConvBN(features, kernel_size, strides, padding,
                           groups=groups, dtype=dtype, name=cname)(x)
    out = WrapConv(features, kernel_size, strides, padding, groups=groups,
                   dtype=dtype, name=cname)(x)
    return BatchNorm(momentum=bn_momentum, dtype=dtype, name=bname)(
        out, train)


class _StemKernelParams(nn.Module):
    """Owns the stem's [7, 7, 3, F] kernel at nn.Conv's param path."""

    features: int = 64

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (7, 7, 3, self.features), jnp.float32)


class S2DStemConv(nn.Module):
    """conv1 rewritten via space-to-depth: bit-compatible params, same math.

    The standard stem (7x7, stride 2, 3 input channels) is the classic
    low-arithmetic-intensity conv on TPUs: the MXU pads the 3-channel
    contraction up to its 128-lane tile. Rewriting input and kernel into
    2x2-phase space-to-depth form — x [B,H,W,3] -> [B,H/2,W/2,12], the
    zero-padded 8x8 kernel -> [4,4,12,F], stride 1 VALID — computes the
    identical sums (see test_model.py s2d equivalence) with 4x the
    contraction depth per MXU pass. The parameter stays the canonical
    [7,7,3,F] tensor at the same tree path (e.g. 'conv1/conv/kernel'),
    so every checkpoint (ours or converted torch, train/checkpoint.py)
    loads unchanged; the rearrangement is traced into the program.
    """

    dtype: jnp.dtype = jnp.float32
    features: int = 64

    @nn.compact
    def __call__(self, x):
        F = self.features
        w = _StemKernelParams(F, name="conv")()
        # 7x7 -> 8x8 (zero tap row/col), split into 2x2 phases
        w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
        wp = (w8.reshape(4, 2, 4, 2, 3, F)
              .transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, F))
        # pad exactly as WrapConv(7x7, s2, p3): wrap on W, zeros on H
        x = wrap_pad_width(x, 3, axis=2)
        x = jnp.pad(x, ((0, 0), (3, 3), (0, 0), (0, 0)))
        B, Hp, Wp, C = x.shape
        y = (x.reshape(B, Hp // 2, 2, Wp // 2, 2, C)
             .transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp // 2, Wp // 2, 4 * C))
        return jax.lax.conv_general_dilated(
            y.astype(self.dtype), wp.astype(self.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=matmul_precision(self.dtype))


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.1
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv_bn(x, self.planes, (3, 3), (self.stride, self.stride),
                       (1, 1), "conv1", "bn1", self.dtype, self.bn_momentum,
                       self.quant, train)
        out = nn.relu(out)
        out = _conv_bn(out, self.planes, (3, 3), (1, 1), (1, 1),
                       "conv2", "bn2", self.dtype, self.bn_momentum,
                       self.quant, train)
        if self.downsample:
            identity = _conv_bn(x, self.planes, (1, 1),
                                (self.stride, self.stride), (0, 0),
                                "downsample_conv", "downsample_bn",
                                self.dtype, self.bn_momentum, self.quant,
                                train)
        return nn.relu(out + identity)


class _FusedConvKernel(nn.Module):
    """Mirror of WrapConv's parameter tree (``<name>/conv/kernel``) for
    the fused-block path — same path, same initializer, so checkpoints
    and init RNG folds are identical to the unfused module."""

    shape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        return _ConvParams(self.shape, False, name="conv")()[0]


class _FusedBNInner(nn.Module):
    """Mirror of flax nn.BatchNorm's variables (scale/bias params +
    batch_stats mean/var), declared raw so the fused path can fold them
    into conv weights without running the layer."""

    ch: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.ch,))
        bias = self.param("bias", nn.initializers.zeros, (self.ch,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.ch,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.ch,), jnp.float32))
        return scale, bias, mean.value, var.value


class _FusedBNVars(nn.Module):
    """Named ``bnN``; nests the variables under ``bnN/bn/*`` like
    layers.BatchNorm does."""

    ch: int

    @nn.compact
    def __call__(self):
        return _FusedBNInner(self.ch, name="bn")()


class Bottleneck(nn.Module):
    planes: int            # base width; output is planes * 4
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.1
    quant: bool = False
    fused: str = ""   # "pallas" / "pallas_interpret": one-kernel block
                      # (serving only; identity blocks, groups=1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        if (self.fused and not train and self.stride == 1
                and not self.downsample and self.groups == 1
                and not self.quant):
            return self._fused_forward(x, width)
        identity = x
        out = _conv_bn(x, width, (1, 1), (1, 1), (0, 0), "conv1", "bn1",
                       self.dtype, self.bn_momentum, self.quant, train)
        out = nn.relu(out)
        out = _conv_bn(out, width, (3, 3), (self.stride, self.stride),
                       (1, 1), "conv2", "bn2", self.dtype, self.bn_momentum,
                       self.quant, train, groups=self.groups)
        out = nn.relu(out)
        out = _conv_bn(out, self.planes * 4, (1, 1), (1, 1), (0, 0),
                       "conv3", "bn3", self.dtype, self.bn_momentum,
                       self.quant, train)
        if self.downsample:
            identity = _conv_bn(x, self.planes * 4, (1, 1),
                                (self.stride, self.stride), (0, 0),
                                "downsample_conv", "downsample_bn",
                                self.dtype, self.bn_momentum, self.quant,
                                train)
        return nn.relu(out + identity)

    def _fused_forward(self, x, width):
        """Whole block as ONE Pallas kernel: every intermediate stays in
        VMEM, HBM sees one input read + one output write (the round-5
        roofline showed the unfused block is DMA-bound —
        ops/pallas_block.py). Parameters are declared through tree-
        mirroring holders, so the checkpoint layout is unchanged; the
        three inference-mode BNs are folded into the conv weights."""
        from ..ops.pallas_block import fold_conv_bn, fused_bottleneck
        cout = self.planes * 4
        cin = x.shape[-1]
        assert cin == cout, (cin, cout)  # identity blocks only
        k1 = _FusedConvKernel((1, 1, cin, width), name="conv1")()
        bn1 = _FusedBNVars(width, name="bn1")()
        k2 = _FusedConvKernel((3, 3, width, width), name="conv2")()
        bn2 = _FusedBNVars(width, name="bn2")()
        k3 = _FusedConvKernel((1, 1, width, cout), name="conv3")()
        bn3 = _FusedBNVars(cout, name="bn3")()
        w1, b1 = fold_conv_bn(k1, *bn1)
        w2, b2 = fold_conv_bn(k2, *bn2)
        w3, b3 = fold_conv_bn(k3, *bn3)
        return fused_bottleneck(x.astype(self.dtype), w1, b1, w2, b2,
                                w3, b3,
                                interpret=self.fused == "pallas_interpret")


_RESNET_SPECS = {
    # name: (block, layers, groups, base_width)
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1, 64),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 1, 64),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 1, 64),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 1, 64),
    "resnet152": (Bottleneck, (3, 8, 36, 3), 1, 64),
    "resnext50_32x4d": (Bottleneck, (3, 4, 6, 3), 32, 4),
    "resnext101_32x8d": (Bottleneck, (3, 4, 23, 3), 32, 8),
}


class ResNetEncoder(nn.Module):
    """Returns 4 feature maps at strides 4/8/16/32. x: [B, H, W, 3]."""

    backbone: str = "resnet50"
    dtype: jnp.dtype = jnp.float32
    seam_pool: bool = False  # wrap-pad the maxpool (exact seam equivariance)
    bn_momentum: float = 0.1
    s2d_stem: bool = False   # space-to-depth conv1 (same params, TPU win)
    quant: bool = False      # serving-only int8 convs (models/quant.py)
    fused_blocks: str = ""   # "pallas": one-kernel identity bottlenecks
                             # (serving only; ops/pallas_block.py)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        block, layers, groups, base_width = _RESNET_SPECS[self.backbone]
        if self.quant:
            assert not self.s2d_stem, \
                "quant stem is the plain 7x7 path (s2d_stem unsupported)"
            x = _conv_bn(x, 64, (7, 7), (2, 2), (3, 3), "conv1", "bn1",
                         self.dtype, self.bn_momentum, True, train)
        else:
            if self.s2d_stem:
                x = S2DStemConv(dtype=self.dtype, name="conv1")(x)
            else:
                x = WrapConv(64, (7, 7), (2, 2), (3, 3), dtype=self.dtype,
                             name="conv1")(x)
            x = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                          name="bn1")(x, train)
        x = nn.relu(x)
        x = max_pool_same_as_torch(x, 3, 2, 1, wrap_width=self.seam_pool)

        feats = []
        planes = 64
        for li, n_blocks in enumerate(layers):
            stride = 1 if li == 0 else 2
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                if block is Bottleneck:
                    need_ds = bi == 0 and (s != 1 or li == 0)
                    x = Bottleneck(planes, s, need_ds, groups, base_width,
                                   self.dtype, self.bn_momentum, self.quant,
                                   self.fused_blocks,
                                   name=f"layer{li+1}_{bi}")(x, train)
                else:
                    need_ds = bi == 0 and s != 1
                    x = BasicBlock(planes, s, need_ds, self.dtype,
                                   self.bn_momentum, self.quant,
                                   name=f"layer{li+1}_{bi}")(x, train)
            feats.append(x)
            planes *= 2
        return feats


def resnet_feature_channels(backbone: str) -> Tuple[int, int, int, int]:
    block, _, _, _ = _RESNET_SPECS[backbone]
    mult = 4 if block is Bottleneck else 1
    return tuple(c * mult for c in (64, 128, 256, 512))
