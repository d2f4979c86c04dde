"""Model zoo: encoders + height compression + the HorizonNet 1D head.

Reference surface: model.py (HorizonNet, Resnet, Densenet, ConvCompressH,
GlobalHeightConv, GlobalHeightStage, ENCODER_RESNET, ENCODER_DENSENET).
TPU-first re-design: NHWC layout, functional flax modules, wrap padding as
an explicit op (not monkey-patching), the bi-LSTM as a fused-matmul scan.
"""

from .registry import ENCODER_RESNET, ENCODER_DENSENET, build_model
from .horizonnet import HorizonNet

__all__ = ["ENCODER_RESNET", "ENCODER_DENSENET", "build_model", "HorizonNet"]
