"""HorizonNet: encoder + height compression + 1D recurrent head.

Reference behavior (model.py:185-281):
- normalize input by ImageNet mean/std
- encoder -> 4 feature maps -> GlobalHeightStage -> [B, c_last, W/4]
- bi-LSTM (2 layers, hidden 512, dropout 0.5) over the W/4 columns, then
  dropout + Linear(1024 -> 3*step_cols); each column emits step_cols=4
  output columns, reshaped to [B, 3, W]
- head bias init: cor=-1, ceiling bon=-0.478, floor bon=0.425
- outputs: bon [B, 2, W] (boundary angles), cor [B, 1, W] (corner logit)
- no-RNN variant: per-column MLP c_last -> 512 -> 3*step_cols

TPU-first deltas: NHWC, shape-polymorphic (the 512x1024 input contract is
asserted at the CLI boundary, not baked into the graph), bi-LSTM as a
single fused-matmul scan, optional bf16 compute with f32 params.
"""

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from .resnet import ResNetEncoder, resnet_feature_channels
from .densenet import DenseNetEncoder, densenet_feature_channels
from .height import GlobalHeightStage
from ..ops.lstm import bilstm, matmul_precision

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _head_bias_init(step_cols):
    def init(key, shape, dtype=jnp.float32):
        del key
        assert shape == (3 * step_cols,)
        b = np.zeros(shape, np.float32)
        b[0 * step_cols:1 * step_cols] = -1.0     # cor logit prior
        b[1 * step_cols:2 * step_cols] = -0.478   # ceiling boundary prior
        b[2 * step_cols:3 * step_cols] = 0.425    # floor boundary prior
        return jnp.asarray(b, dtype)
    return init


class BiLSTM(nn.Module):
    """flax wrapper holding the scan-LSTM parameters (PyTorch layout)."""

    input_size: int
    hidden_size: int = 512
    num_layers: int = 2
    dropout: float = 0.5
    impl: str = "scan"   # "pallas": fused VMEM-resident serving kernel

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = 1.0 / np.sqrt(self.hidden_size)
        u = nn.initializers.uniform(scale=2 * k)  # U(0, 2k); shift to (-k, k)

        def uinit(key, shape, dtype=jnp.float32):
            return u(key, shape, dtype) - k

        params = []
        for layer in range(self.num_layers):
            in_l = self.input_size if layer == 0 else 2 * self.hidden_size
            params.append({
                "w_ih": self.param(f"l{layer}_w_ih", uinit,
                                   (2, 4 * self.hidden_size, in_l)),
                "w_hh": self.param(f"l{layer}_w_hh", uinit,
                                   (2, 4 * self.hidden_size, self.hidden_size)),
                "b": self.param(f"l{layer}_b", uinit,
                                (2, 4 * self.hidden_size)),
            })
        rng = self.make_rng("dropout") if (train and self.dropout > 0) else None
        if train:
            # The serving kernel ("pallas") has no VJP; training takes the
            # scan unless the differentiable fused path is asked for
            impl = self.impl if self.impl.startswith("pallas_train") \
                else "scan"
        else:
            # Eval under a pallas_train config uses the lighter serving
            # kernel (no residual outputs)
            impl = {"pallas_train": "pallas",
                    "pallas_train_interpret": "pallas_interpret"
                    }.get(self.impl, self.impl)
        return bilstm(x, params, self.hidden_size,
                      self.dropout if train else 0.0, rng, impl=impl)


class HorizonNet(nn.Module):
    backbone: str = "resnet50"
    use_rnn: bool = True
    out_scale: int = 8
    step_cols: int = 4
    rnn_hidden_size: int = 512
    seam_pool: bool = False   # wrap-padded maxpool: exact seam equivariance
    bn_momentum: float = 0.1  # torch semantics (--bn_momentum override)
    dtype: jnp.dtype = jnp.float32
    lstm_impl: str = "scan"   # "pallas" for the fused serving kernel
    s2d_stem: bool = False    # space-to-depth conv1 (resnet; same params)
    quant_int8: bool = False  # serving-only int8 encoder (models/quant.py)
    fused_blocks: str = ""    # "pallas": one-kernel identity bottlenecks
                              # (resnet serving only; ops/pallas_block.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, H, W, 3] float in [0, 1]. Returns (bon [B,2,W], cor [B,1,W])."""
        B, H, W, _ = x.shape
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        x = x.astype(self.dtype)

        if self.backbone.startswith("res"):
            feats = ResNetEncoder(self.backbone, self.dtype, self.seam_pool,
                                  self.bn_momentum, self.s2d_stem,
                                  self.quant_int8, self.fused_blocks,
                                  name="encoder")(x, train)
            channels = resnet_feature_channels(self.backbone)
        elif self.backbone.startswith("dense"):
            if self.quant_int8:
                raise NotImplementedError(
                    "quant_int8 covers the resnet family (the FLOPs-"
                    "dominant encoders); densenet stays float")
            feats = DenseNetEncoder(self.backbone, self.dtype, self.seam_pool,
                                    self.bn_momentum, self.s2d_stem,
                                    name="encoder")(x, train)
            channels = densenet_feature_channels(self.backbone)
        else:
            raise NotImplementedError(self.backbone)

        out_w = W // self.step_cols
        feature = GlobalHeightStage(channels, self.out_scale, self.dtype,
                                    self.bn_momentum,
                                    name="height")(feats, out_w, train)
        # feature: [B, c_last, out_w]

        if self.use_rnn:
            seq = jnp.transpose(feature, (2, 0, 1))  # [out_w, B, c_last]
            seq = BiLSTM(input_size=feature.shape[1],
                         hidden_size=self.rnn_hidden_size,
                         impl=self.lstm_impl,
                         name="bi_rnn")(seq, train)
            seq = nn.Dropout(0.5, deterministic=not train)(seq)
            out = nn.Dense(3 * self.step_cols,
                           bias_init=_head_bias_init(self.step_cols),
                           dtype=self.dtype,
                           precision=matmul_precision(self.dtype),
                           name="linear")(seq)     # [out_w, B, 3*sc]
            out = out.reshape(out_w, B, 3, self.step_cols)
            out = jnp.transpose(out, (1, 2, 0, 3)).reshape(B, 3, out_w * self.step_cols)
        else:
            seq = jnp.transpose(feature, (0, 2, 1))  # [B, out_w, c_last]
            seq = nn.Dense(self.rnn_hidden_size, dtype=self.dtype,
                           precision=matmul_precision(self.dtype),
                           name="linear_0")(seq)
            seq = nn.relu(seq)
            seq = nn.Dropout(0.5, deterministic=not train)(seq)
            out = nn.Dense(3 * self.step_cols,
                           bias_init=_head_bias_init(self.step_cols),
                           dtype=self.dtype,
                           precision=matmul_precision(self.dtype),
                           name="linear_1")(seq)   # [B, out_w, 3*sc]
            out = out.reshape(B, out_w, 3, self.step_cols)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, 3, out_w * self.step_cols)

        out = out.astype(jnp.float32)
        cor = out[:, :1]   # [B, 1, W]
        bon = out[:, 1:]   # [B, 2, W]
        return bon, cor
