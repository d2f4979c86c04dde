"""Post-training int8 quantization of the encoder for serving.

Converts a float checkpoint's variables into the tree the
``quant_int8=True`` model (resnet family) consumes: every encoder
Conv+BN pair becomes one QuantConvBN (models/layers.py) whose params are

- ``kernel_q``: int8, symmetric per-out-channel — the BN-folded kernel
  ``W * gamma/sqrt(var+eps)`` rounded to its per-channel step,
- ``scale``: f32 [out] — that per-channel step (dequantization factor),
- ``bias``: f32 [out] — the folded BN shift ``beta - mean*gamma/sigma``.

Height compression, the LSTM head and the linear head stay float: the
resnet encoder carries ~90% of the forward FLOPs (SURVEY.md §6), and the
head's logits are precision-sensitive. Activation scales are dynamic
per-tensor inside QuantConvBN, so no calibration pass is needed.

This is a one-way serving-time transform — checkpoints on disk stay
float (train/checkpoint.py is unchanged). The reference has no
quantization story; this is a TPU-native extra riding the MXU's
double-rate int8 path.
"""

from collections.abc import Mapping

import numpy as np
import jax.numpy as jnp

# Conv module name -> its BatchNorm sibling inside one block/stem scope
_PAIR = {"conv1": "bn1", "conv2": "bn2", "conv3": "bn3",
         "downsample_conv": "downsample_bn"}
_BN_NAMES = frozenset(_PAIR.values())


def _fold_quantize(kernel, bn_p, bn_s, eps=1e-5):
    """(float kernel [kh,kw,in,out], bn params, bn stats) -> quant leaves."""
    w = np.asarray(kernel, np.float64)
    g = np.asarray(bn_p["scale"], np.float64) / np.sqrt(
        np.asarray(bn_s["var"], np.float64) + eps)
    bias = (np.asarray(bn_p["bias"], np.float64)
            - np.asarray(bn_s["mean"], np.float64) * g)
    wf = w * g                                   # fold gamma/sigma per oc
    step = np.abs(wf).max(axis=(0, 1, 2))
    step = np.maximum(step, 1e-12) / 127.0
    kq = np.clip(np.rint(wf / step), -127, 127).astype(np.int8)
    return {"kernel_q": jnp.asarray(kq),
            "scale": jnp.asarray(step, jnp.float32),
            "bias": jnp.asarray(bias, jnp.float32)}


def _quant_tree(params, stats, eps):
    out = {}
    for key, val in params.items():
        if key in _PAIR and _PAIR[key] in params:
            out[key] = _fold_quantize(val["conv"]["kernel"],
                                      params[_PAIR[key]]["bn"],
                                      stats[_PAIR[key]]["bn"], eps)
        elif key in _BN_NAMES:
            continue                              # folded into its conv
        elif isinstance(val, Mapping):
            out[key] = _quant_tree(val, stats.get(key, {}), eps)
        else:
            out[key] = val
    return out


def quantize_variables(variables, eps=1e-5):
    """Float HorizonNet variables -> variables for quant_int8=True.

    The encoder subtree is folded+quantized and its batch_stats dropped;
    everything else (height, head, their stats) passes through
    unchanged. ``eps`` must match the BatchNorm epsilon the checkpoint
    trained with (models/layers.py BatchNorm default 1e-5).
    """
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    assert "encoder" in params, sorted(params)
    params["encoder"] = _quant_tree(params["encoder"],
                                    stats.get("encoder", {}), eps)
    stats.pop("encoder", None)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    out.update({k: v for k, v in variables.items()
                if k not in ("params", "batch_stats")})
    return out
