"""Convert reference PyTorch HorizonNet checkpoints to flax variables.

The reference saves self-describing checkpoints {args, kwargs:{backbone,
use_rnn}, state_dict} (misc/utils.py:49-58). This module maps that
state_dict onto horizonnet_tpu.models.HorizonNet variables so published
models can be evaluated for IoU parity.

Key-name notes (reference model.py:42-55): wrap_lr_pad replaces every
width-padded Conv2d with Sequential(LR_PAD, conv), which inserts a ``.1``
segment into those parameter names (e.g. ``encoder.conv1.1.weight``). The
converter therefore looks keys up by *either* form.

Layout conversions:
- conv weight OIHW -> HWIO
- grouped conv: torch keeps [O, I/g, kh, kw]; flax expects the same split
  semantics via feature_group_count, so the transpose is identical
- linear weight [out, in] -> [in, out]
- BN: weight->scale, bias->bias, running_mean/var -> batch_stats
"""

from typing import Dict

import numpy as np
import jax.numpy as jnp

from .resnet import _RESNET_SPECS
from .densenet import _DENSENET_SPECS
from ..ops.lstm import torch_lstm_state_to_params


def load_torch_checkpoint(path):
    """Load a reference .pth; returns (state_dict, kwargs) as numpy."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in ckpt:
        sd = ckpt["state_dict"]
        kwargs = dict(ckpt.get("kwargs", {}))
        # The reference's training checkpoint (checkpoint.pth.tar,
        # train.py:33-37) has no kwargs dict but stores the backbone name
        # at the top level — honor it so --pth checkpoint.pth.tar works.
        if "backbone" not in kwargs and "backbone" in ckpt:
            kwargs["backbone"] = ckpt["backbone"]
        # DataParallel checkpoints carry a 'module.' prefix when saved
        # without .module unwrapping; strip it (train.py:337-344 unwraps,
        # but finetune flows in the wild often don't).
        if sd and all(k.startswith("module.") for k in sd):
            sd = {k[len("module."):]: v for k, v in sd.items()}
    else:
        sd, kwargs = ckpt, {}
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    return sd, kwargs


class _SD:
    """state_dict accessor tolerant of the LR_PAD Sequential ``.1`` infix."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.used = set()

    def get(self, key):
        base, leaf = key.rsplit(".", 1)
        for k in (key, f"{base}.1.{leaf}"):
            if k in self.sd:
                self.used.add(k)
                return self.sd[k]
        raise KeyError(key)

    def conv(self, key):
        w = self.get(key + ".weight")
        return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}

    def conv_b(self, key):
        out = self.conv(key)
        out["bias"] = jnp.asarray(self.get(key + ".bias"))
        return out

    def bn(self, key):
        return (
            {"scale": jnp.asarray(self.get(key + ".weight")),
             "bias": jnp.asarray(self.get(key + ".bias"))},
            {"mean": jnp.asarray(self.get(key + ".running_mean")),
             "var": jnp.asarray(self.get(key + ".running_var"))},
        )

    def dense(self, key):
        return {"kernel": jnp.asarray(self.get(key + ".weight").T),
                "bias": jnp.asarray(self.get(key + ".bias"))}


def _convert_resnet(sd: _SD, backbone: str):
    from .resnet import Bottleneck

    block, layers, _, _ = _RESNET_SPECS[backbone]
    params, stats = {}, {}

    def put(name, conv=None, bn=None):
        if conv is not None:
            params[name] = {"conv": conv}
        if bn is not None:
            p, s = bn
            params[name] = {"bn": p}
            stats[name] = {"bn": s}

    pre = "feature_extractor.encoder"
    put("conv1", conv=sd.conv(f"{pre}.conv1"))
    put("bn1", bn=sd.bn(f"{pre}.bn1"))

    for li, n_blocks in enumerate(layers):
        for bi in range(n_blocks):
            t = f"{pre}.layer{li+1}.{bi}"
            name = f"layer{li+1}_{bi}"
            blk_p, blk_s = {}, {}
            n_convs = 3 if block is Bottleneck else 2
            for ci in range(1, n_convs + 1):
                blk_p[f"conv{ci}"] = {"conv": sd.conv(f"{t}.conv{ci}")}
                p, s = sd.bn(f"{t}.bn{ci}")
                blk_p[f"bn{ci}"] = {"bn": p}
                blk_s[f"bn{ci}"] = {"bn": s}
            if f"{t}.downsample.0.weight" in sd.sd or f"{t}.downsample.0.1.weight" in sd.sd:
                blk_p["downsample_conv"] = {"conv": sd.conv(f"{t}.downsample.0")}
                p, s = sd.bn(f"{t}.downsample.1")
                blk_p["downsample_bn"] = {"bn": p}
                blk_s["downsample_bn"] = {"bn": s}
            params[name] = blk_p
            stats[name] = blk_s
    return params, stats


def _convert_densenet(sd: _SD, backbone: str):
    _, blocks, _ = _DENSENET_SPECS[backbone]
    params, stats = {}, {}
    pre = "feature_extractor.encoder.features"

    params["conv0"] = {"conv": sd.conv(f"{pre}.conv0")}
    p, s = sd.bn(f"{pre}.norm0")
    params["norm0"] = {"bn": p}
    stats["norm0"] = {"bn": s}

    for bi, n_layers in enumerate(blocks):
        for li in range(n_layers):
            t = f"{pre}.denseblock{bi+1}.denselayer{li+1}"
            name = f"denseblock{bi+1}_layer{li+1}"
            lp, ls = {}, {}
            for which in ("1", "2"):
                p, s = sd.bn(f"{t}.norm{which}")
                lp[f"norm{which}"] = {"bn": p}
                ls[f"norm{which}"] = {"bn": s}
                lp[f"conv{which}"] = {"conv": sd.conv(f"{t}.conv{which}")}
            params[name] = lp
            stats[name] = ls
        if bi < len(blocks) - 1:
            t = f"{pre}.transition{bi+1}"
            p, s = sd.bn(f"{t}.norm")
            params[f"transition{bi+1}_norm"] = {"bn": p}
            stats[f"transition{bi+1}_norm"] = {"bn": s}
            params[f"transition{bi+1}_conv"] = {"conv": sd.conv(f"{t}.conv")}
    p, s = sd.bn(f"{pre}.norm5")
    params["norm5"] = {"bn": p}
    stats["norm5"] = {"bn": s}
    return params, stats


def torch_state_to_variables(state_dict: Dict[str, np.ndarray], backbone: str,
                             use_rnn: bool = True):
    """Full reference state_dict -> {'params': ..., 'batch_stats': ...}."""
    sd = _SD(state_dict)

    if backbone.startswith("res"):
        enc_p, enc_s = _convert_resnet(sd, backbone)
    else:
        enc_p, enc_s = _convert_densenet(sd, backbone)

    # Height compression: reduce_height_module.ghc_lst.{i}.layer.{j}.layers.{0,1}
    h_p, h_s = {}, {}
    for i in range(4):
        gp, gs = {}, {}
        for j in range(4):
            t = f"reduce_height_module.ghc_lst.{i}.layer.{j}.layers"
            p, s = sd.bn(f"{t}.1")
            # ConvCompressH = WrapConv("conv") + BatchNorm("bn"), each
            # wrapping its flax primitive of the same name
            gp[f"c{j}"] = {"conv": {"conv": sd.conv_b(f"{t}.0")},
                           "bn": {"bn": p}}
            gs[f"c{j}"] = {"bn": {"bn": s}}
        h_p[f"ghc{i}"] = gp
        h_s[f"ghc{i}"] = gs

    params = {"encoder": enc_p, "height": h_p}
    stats = {"encoder": enc_s, "height": h_s}

    if use_rnn:
        lstm = torch_lstm_state_to_params(state_dict, "bi_rnn.", num_layers=2,
                                          bidirectional=True)
        rnn_p = {}
        for layer, lp in enumerate(lstm):
            rnn_p[f"l{layer}_w_ih"] = lp["w_ih"]
            rnn_p[f"l{layer}_w_hh"] = lp["w_hh"]
            rnn_p[f"l{layer}_b"] = lp["b"]
        for k in state_dict:
            if k.startswith("bi_rnn."):
                sd.used.add(k)
        params["bi_rnn"] = rnn_p
        params["linear"] = sd.dense("linear")
    else:
        params["linear_0"] = sd.dense("linear.0")
        params["linear_1"] = sd.dense("linear.3")

    return {"params": params, "batch_stats": stats}


def load_reference_model(path):
    """One-call loader: .pth path -> (model, variables)."""
    from .registry import build_model

    sd, kwargs = load_torch_checkpoint(path)
    backbone = kwargs.get("backbone", "resnet50")
    use_rnn = kwargs.get("use_rnn", True)
    model = build_model(backbone, use_rnn)
    variables = torch_state_to_variables(sd, backbone, use_rnn)
    return model, variables
