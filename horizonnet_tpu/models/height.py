"""Height-compression stage: 4 multi-scale maps -> per-column feature.

Reference behavior (model.py:123-179): each encoder map passes through 4x
[Conv k3 stride (2,1) + BN + ReLU] halving height each time with channel
schedule c -> c/2 -> c/2 -> c/4 -> c/out_scale, then is wrap-resized to
out_w columns, flattened (C*H per column) and concatenated across the 4
scales into [B, c_last, out_w].
"""

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .layers import WrapConv, BatchNorm
from ..ops.resize import wrap_resize_width


class ConvCompressH(nn.Module):
    """Conv k3 stride (2,1) + BN + ReLU: halves height, keeps width."""

    out_c: int
    ks: int = 3
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.ks % 2 == 1
        p = self.ks // 2
        x = WrapConv(self.out_c, (self.ks, self.ks), (2, 1), (p, p),
                     use_bias=True, dtype=self.dtype, name="conv")(x)
        x = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype, name="bn")(x, train)
        return nn.relu(x)


class GlobalHeightConv(nn.Module):
    """4x height halving then seam-free width resize to out_w (NHWC)."""

    in_c: int
    out_c: int
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, out_w: int, train: bool = False):
        x = ConvCompressH(self.in_c // 2, dtype=self.dtype,
                          bn_momentum=self.bn_momentum, name="c0")(x, train)
        x = ConvCompressH(self.in_c // 2, dtype=self.dtype,
                          bn_momentum=self.bn_momentum, name="c1")(x, train)
        x = ConvCompressH(self.in_c // 4, dtype=self.dtype,
                          bn_momentum=self.bn_momentum, name="c2")(x, train)
        x = ConvCompressH(self.out_c, dtype=self.dtype,
                          bn_momentum=self.bn_momentum, name="c3")(x, train)
        # Resize width in NHWC (MXU matmul over axis 2), then lay out as
        # [B, C, H', out_w] for the channel-major column flatten the
        # reference uses (model.py:175-178)
        x = wrap_resize_width(x, out_w, axis=2)
        return jnp.transpose(x, (0, 3, 1, 2))


class GlobalHeightStage(nn.Module):
    """Fuse the 4 encoder scales into one [B, c_last, out_w] feature."""

    channels: Sequence[int]      # (c1, c2, c3, c4)
    out_scale: int = 8
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, feats, out_w: int, train: bool = False):
        assert len(feats) == 4
        bs = feats[0].shape[0]
        cols = []
        for i, (f, c) in enumerate(zip(feats, self.channels)):
            y = GlobalHeightConv(c, c // self.out_scale, dtype=self.dtype,
                                 bn_momentum=self.bn_momentum,
                                 name=f"ghc{i}")(f, out_w, train)
            # [B, C, H', out_w] -> flatten channel*height per column
            cols.append(y.reshape(bs, -1, out_w))
        return jnp.concatenate(cols, axis=1)  # [B, c_last, out_w]
