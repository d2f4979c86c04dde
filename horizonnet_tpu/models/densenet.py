"""DenseNet encoder family with wrap-padded convs (NHWC).

Covers ENCODER_DENSENET (model.py:22-24): densenet121/169/161/201. The
reference taps features at children indices 4, 6, 8, 11 of the torchvision
``features`` sequential (model.py:102-108): the raw outputs of dense blocks
1-3 (before their transition layers) and the final norm5 output with an
extra ReLU.
"""

from typing import Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .layers import WrapConv, BatchNorm, max_pool_same_as_torch, avg_pool_2x2
from .resnet import S2DStemConv

_DENSENET_SPECS = {
    # name: (growth_rate, block_config, num_init_features)
    "densenet121": (32, (6, 12, 24, 16), 64),
    "densenet169": (32, (6, 12, 32, 32), 64),
    "densenet201": (32, (6, 12, 48, 32), 64),
    "densenet161": (48, (6, 12, 36, 24), 96),
}
_BN_SIZE = 4


class DenseLayer(nn.Module):
    growth_rate: int
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype, name="norm1")(x, train)
        out = nn.relu(out)
        out = WrapConv(_BN_SIZE * self.growth_rate, (1, 1),
                       dtype=self.dtype, name="conv1")(out)
        out = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype, name="norm2")(out, train)
        out = nn.relu(out)
        out = WrapConv(self.growth_rate, (3, 3), (1, 1), (1, 1),
                       dtype=self.dtype, name="conv2")(out)
        return jnp.concatenate([x, out], axis=-1)


class DenseNetEncoder(nn.Module):
    """Returns 4 feature maps at strides 4/8/16/32. x: [B, H, W, 3]."""

    backbone: str = "densenet121"
    dtype: jnp.dtype = jnp.float32
    seam_pool: bool = False
    bn_momentum: float = 0.1
    s2d_stem: bool = False   # space-to-depth conv0 (same params, TPU win)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        growth, blocks, init_feat = _DENSENET_SPECS[self.backbone]
        if self.s2d_stem:
            x = S2DStemConv(self.dtype, init_feat, name="conv0")(x)
        else:
            x = WrapConv(init_feat, (7, 7), (2, 2), (3, 3),
                         dtype=self.dtype, name="conv0")(x)
        x = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype, name="norm0")(x, train)
        x = nn.relu(x)
        x = max_pool_same_as_torch(x, 3, 2, 1, wrap_width=self.seam_pool)

        feats = []
        n_ch = init_feat
        for bi, n_layers in enumerate(blocks):
            for li in range(n_layers):
                x = DenseLayer(growth, self.dtype, self.bn_momentum,
                               name=f"denseblock{bi+1}_layer{li+1}")(x, train)
            n_ch += n_layers * growth
            if bi < len(blocks) - 1:
                feats.append(x)  # raw dense-block output, pre-transition
                x = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype, name=f"transition{bi+1}_norm")(x, train)
                x = nn.relu(x)
                n_ch = n_ch // 2
                x = WrapConv(n_ch, (1, 1), dtype=self.dtype,
                             name=f"transition{bi+1}_conv")(x)
                x = avg_pool_2x2(x)
        x = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype, name="norm5")(x, train)
        feats = [feats[0], feats[1], feats[2], nn.relu(x)]
        return feats


def densenet_feature_channels(backbone: str) -> Tuple[int, int, int, int]:
    growth, blocks, init_feat = _DENSENET_SPECS[backbone]
    chans = []
    n_ch = init_feat
    for bi, n_layers in enumerate(blocks):
        n_ch += n_layers * growth
        if bi < len(blocks) - 1:
            chans.append(n_ch)
            n_ch = n_ch // 2
    chans.append(n_ch)
    return tuple(chans)
