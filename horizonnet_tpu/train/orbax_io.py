"""Orbax checkpoint backend: async, production-scale saves.

The default checkpoint format (train/checkpoint.py) is a single
self-describing msgpack file, mirroring the reference's semantics
(SURVEY.md §5 checkpoint/resume). This module adds an orbax backend for
large-scale training: async writes off the training thread, per-array
storage, atomic directory commits. Metadata (backbone/use_rnn/epoch/best
score) travels in a JSON sidecar inside the checkpoint directory.
"""

import json
import os

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint_orbax(ckpt_dir, state, backbone, use_rnn, epoch,
                          best_valid_score, args=None):
    """Write one orbax checkpoint under ckpt_dir/step_{epoch}."""
    ocp = _ocp()
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{epoch}"))
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
        "step": np.asarray(state.step),
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    with open(os.path.join(path, "horizonnet_meta.json"), "w") as f:
        json.dump({"kwargs": {"backbone": backbone, "use_rnn": use_rnn},
                   "epoch": epoch,
                   "best_valid_score": float(best_valid_score),
                   "args": args or {}}, f)
    return path


def load_checkpoint_orbax(path, state):
    """Restore a TrainState (template ``state`` supplies the structure)."""
    ocp = _ocp()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
    }
    with ocp.StandardCheckpointer() as ckptr:
        payload = ckptr.restore(os.path.abspath(path), template)
    with open(os.path.join(path, "horizonnet_meta.json")) as f:
        meta = json.load(f)
    new_state = state.replace(params=payload["params"],
                              batch_stats=payload["batch_stats"],
                              opt_state=payload["opt_state"],
                              step=jax.numpy.asarray(payload["step"]))
    return new_state, meta
