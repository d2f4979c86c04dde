"""Checkpoint save/load: self-describing, reference-compatible semantics.

Two formats mirror the reference (SURVEY.md §5 checkpoint/resume):
- ``save_model`` / ``load_trained_model``: {args, kwargs:{backbone,
  use_rnn}, params, batch_stats} — reconstructs the architecture without
  CLI flags (misc/utils.py:49-65). Serialized with flax msgpack + a JSON
  sidecar header in one file.
- ``save_checkpoint``: adds optimizer state / epoch / best score for
  training resume (train.py:33-37); unlike the reference, loading it DOES
  restore optimizer state.

PyTorch ``.pth`` checkpoints from the reference are loaded transparently by
``load_trained_model`` via models.torch_convert.
"""

import json
import os
import shutil
import struct as _struct

import jax
import numpy as np
from flax import serialization

_MAGIC = b"HZTPU1\x00\x00"


def _write(path, header: dict, payload_tree):
    # to_state_dict turns optimizer tuples/namedtuples into plain dicts
    # (msgpack's strict packer rejects tuples)
    payload_tree = serialization.to_state_dict(payload_tree)
    blob = serialization.msgpack_serialize(
        jax.tree.map(np.asarray, payload_tree))
    head = json.dumps(header).encode()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(_struct.pack("<Q", len(head)))
        f.write(head)
        f.write(blob)
    os.replace(tmp, path)


def _read(path):
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a horizonnet_tpu checkpoint")
        (n,) = _struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(n).decode())
        payload = serialization.msgpack_restore(f.read())
    return header, payload


def save_model(path, variables, backbone, use_rnn, args=None):
    """Inference checkpoint (misc/utils.py:49-58 equivalent)."""
    _write(path,
           {"kind": "model", "kwargs": {"backbone": backbone,
                                        "use_rnn": use_rnn},
            "args": args or {}},
           {"params": variables["params"],
            "batch_stats": variables.get("batch_stats", {})})


def load_trained_model(path):
    """Returns (model, variables). Accepts ours or reference .pth."""
    from ..models.registry import build_model

    with open(path, "rb") as f:
        magic = f.read(8)
    if magic != _MAGIC:
        # Reference torch checkpoint
        from ..models.torch_convert import load_reference_model
        return load_reference_model(path)
    header, payload = _read(path)
    kw = header["kwargs"]
    model = build_model(kw["backbone"], kw["use_rnn"])

    def upcast(a):
        # float16 is a storage-only format (e.g. the committed golden
        # checkpoint); compute dtype is the model's
        a = np.asarray(a)
        return a.astype(np.float32) if a.dtype == np.float16 else a

    return model, {"params": jax.tree.map(upcast, payload["params"]),
                   "batch_stats": jax.tree.map(
                       upcast, payload.get("batch_stats", {}))}


def save_checkpoint(ckpt_dir, state, backbone, use_rnn, epoch,
                    best_valid_score, is_best, args=None):
    """Training checkpoint + best-model copy (train.py:33-37 equivalent)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, "checkpoint.ckpt")
    _write(path,
           {"kind": "train", "kwargs": {"backbone": backbone,
                                        "use_rnn": use_rnn},
            "epoch": epoch, "best_valid_score": float(best_valid_score),
            "args": args or {}},
           {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step)})
    if is_best:
        shutil.copyfile(path, os.path.join(ckpt_dir, f"best_model_{epoch}.ckpt"))
    return path


def load_checkpoint(path, state):
    """Restore a TrainState (incl. optimizer — unlike the reference, which
    silently restarts the optimizer on --pth resume, SURVEY.md §5)."""
    header, payload = _read(path)
    opt_state = serialization.from_state_dict(state.opt_state,
                                              payload["opt_state"])
    new_state = state.replace(
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=opt_state,
        step=jax.numpy.asarray(payload["step"]))
    return new_state, header
