"""ResNet / ResNeXt encoder family with wrap-padded convs (NHWC).

Covers the reference's ENCODER_RESNET list (model.py:18-21): resnet18/34/50/
101/152, resnext50_32x4d, resnext101_32x8d. Architecture follows the
torchvision v1.5 convention (stride on the 3x3 conv of bottlenecks) so that
published .pth checkpoints convert weight-for-weight.

Forward returns the 4 feature maps at strides 4/8/16/32 (model.py:71-82).
"""

from typing import Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .layers import WrapConv, BatchNorm, max_pool_same_as_torch


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = WrapConv(self.planes, (3, 3), (self.stride, self.stride), (1, 1),
                       dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = WrapConv(self.planes, (3, 3), (1, 1), (1, 1),
                       dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype, name="bn2")(out, train)
        if self.downsample:
            identity = WrapConv(self.planes, (1, 1), (self.stride, self.stride),
                                (0, 0), dtype=self.dtype, name="downsample_conv")(x)
            identity = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype, name="downsample_bn")(identity, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int            # base width; output is planes * 4
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = WrapConv(width, (1, 1), dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = WrapConv(width, (3, 3), (self.stride, self.stride), (1, 1),
                       groups=self.groups, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype, name="bn2")(out, train)
        out = nn.relu(out)
        out = WrapConv(self.planes * 4, (1, 1), dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype, name="bn3")(out, train)
        if self.downsample:
            identity = WrapConv(self.planes * 4, (1, 1),
                                (self.stride, self.stride), (0, 0),
                                dtype=self.dtype, name="downsample_conv")(x)
            identity = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype, name="downsample_bn")(identity, train)
        return nn.relu(out + identity)


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

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        block, layers, groups, base_width = _RESNET_SPECS[self.backbone]
        x = WrapConv(64, (7, 7), (2, 2), (3, 3), dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype, name="bn1")(x, train)
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
                                   self.dtype, self.bn_momentum,
                                   name=f"layer{li+1}_{bi}")(x, train)
                else:
                    need_ds = bi == 0 and s != 1
                    x = BasicBlock(planes, s, need_ds, self.dtype,
                                   self.bn_momentum,
                                   name=f"layer{li+1}_{bi}")(x, train)
            feats.append(x)
            planes *= 2
        return feats


def resnet_feature_channels(backbone: str) -> Tuple[int, int, int, int]:
    block, _, _, _ = _RESNET_SPECS[backbone]
    mult = 4 if block is Bottleneck else 1
    return tuple(c * mult for c in (64, 128, 256, 512))
