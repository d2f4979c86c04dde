"""XLA/Pallas compute primitives for the pano pipeline.

- ``pad``: horizontal wrap padding (the equirect seam is periodic).
- ``resample``: batched bilinear gather-resampling with wrap addressing —
  the single primitive behind pano-stretch augmentation, vanishing-point
  rotation warps, perspective view cutting and floor-plane rasterization.
- ``filters``: circular windowed max / peak finding.
- ``resize``: half-pixel-center bilinear width resize (torch
  ``align_corners=False`` semantics) used by the height-compression stage.
- ``lstm``: bidirectional multi-layer LSTM as fused-matmul ``lax.scan``
  (PyTorch gate semantics), plus the Pallas fused kernel.
"""

from .pad import wrap_pad_width
from .resample import bilinear_wrap_sample, bilinear_sample_nhwc
from .filters import circular_max_filter_1d, find_peaks_np, find_peaks_device
from .resize import resize_width_bilinear, wrap_resize_width
from .lstm import bilstm, lstm_params_init, torch_lstm_state_to_params

__all__ = [
    "wrap_pad_width",
    "bilinear_wrap_sample",
    "bilinear_sample_nhwc",
    "circular_max_filter_1d",
    "find_peaks_np",
    "find_peaks_device",
    "resize_width_bilinear",
    "wrap_resize_width",
    "bilstm",
    "lstm_params_init",
    "torch_lstm_state_to_params",
]
