"""Bidirectional multi-layer LSTM as a fused-matmul ``lax.scan``.

TPU-native replacement for the cuDNN LSTM the reference uses for its 1D
sequence head (model.py:221-227): 2 layers, hidden 512, bidirectional,
dropout between layers, sequence-first over the 256 pano columns.

Design (MXU-first):
- The input projection x @ W_ih^T for ALL timesteps is one big batched
  matmul ([T*B, I] x [I, 4H]) hoisted out of the recurrence.
- Both directions run in ONE scan: direction is a leading axis of the
  carried state and the per-step recurrent matmul is a single batched
  einsum, halving scan overhead and doubling the matmul batch.
- Gate order follows PyTorch (i, f, g, o) so published checkpoints convert
  weight-for-weight.

The recurrent matmul is [B, H] x [H, 4H] per direction per step. The
scan form is the differentiable training path; for serving, the fused
Pallas kernel in ops/pallas_lstm.py (impl="pallas") keeps h/c and W_hh
in VMEM across all 256 steps instead of re-reading the weights from HBM
every step.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def matmul_precision(dtype):
    """Full f32 precision for f32 operands; MXU-native fast path otherwise.

    JAX's default matmul precision truncates f32 operands to bf16 passes;
    when the caller feeds f32 they expect f32 math (cuDNN parity), while the
    production path feeds bf16 and takes the fast path regardless.
    """
    return lax.Precision.HIGHEST if dtype == jnp.float32 else None


def lstm_params_init(key, input_size, hidden_size, num_layers=2,
                     bidirectional=True, dtype=jnp.float32):
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init, PyTorch-style.

    Returns a list (per layer) of dicts with stacked direction-leading
    weights: w_ih [D, 4H, I_l], w_hh [D, 4H, H], b [D, 4H] (= b_ih + b_hh
    folded together at conversion time; at init both halves are sampled so
    we sample a sum-equivalent pair).
    """
    D = 2 if bidirectional else 1
    k = 1.0 / jnp.sqrt(hidden_size)
    layers = []
    for layer in range(num_layers):
        in_l = input_size if layer == 0 else hidden_size * D
        key, *ks = jax.random.split(key, 5)
        u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -k, k)
        layers.append({
            "w_ih": u(ks[0], (D, 4 * hidden_size, in_l)),
            "w_hh": u(ks[1], (D, 4 * hidden_size, hidden_size)),
            "b": u(ks[2], (D, 4 * hidden_size)) + u(ks[3], (D, 4 * hidden_size)),
        })
    return layers


def _bidir_layer(x, p, hidden_size, impl="scan"):
    """One bidirectional layer. x: [T, B, I] -> [T, B, 2H].

    impl: "scan" (lax.scan recurrence, differentiable — the training
    path) or "pallas" / "pallas_interpret" (fused VMEM-resident kernel,
    ops/pallas_lstm.py — the serving path; W_hh and h/c never leave
    VMEM across the 256 steps).
    """
    T, B, _ = x.shape
    D = p["w_ih"].shape[0]
    H = hidden_size

    prec = matmul_precision(x.dtype)
    # Params follow the input compute dtype (bf16 params in the bf16 path
    # keeps every matmul on the fast MXU path and the scan carry stable)
    w_ih = p["w_ih"].astype(x.dtype)
    b = p["b"].astype(x.dtype)
    # Hoisted input projection for every step and both directions:
    # [T, B, I] x [D, I, 4H] -> [T, D, B, 4H]
    xw = jnp.einsum("tbi,dgi->tdbg", x, w_ih, precision=prec) \
        + b[None, :, None, :]
    if D == 2:
        # Reverse direction consumes the sequence back-to-front
        xw = jnp.stack([xw[:, 0], xw[::-1, 1]], axis=1)

    w_hh_t = jnp.swapaxes(p["w_hh"], 1, 2).astype(x.dtype)  # [D, H, 4H]

    if impl in ("pallas", "pallas_interpret"):
        from .pallas_lstm import bilstm_recurrence_pallas
        ys = bilstm_recurrence_pallas(xw, w_hh_t,
                                      interpret=impl == "pallas_interpret")
        if D == 2:
            return jnp.concatenate([ys[:, 0], ys[::-1, 1]], axis=-1)
        return ys[:, 0]

    if impl in ("pallas_train", "pallas_train_interpret"):
        # Differentiable fused recurrence (custom VJP, forward + reverse
        # Pallas kernels) — the training-path twin of impl="pallas"
        from .pallas_lstm import bilstm_recurrence_trainable
        ys = bilstm_recurrence_trainable(
            xw, w_hh_t, impl == "pallas_train_interpret")
        if D == 2:
            return jnp.concatenate([ys[:, 0], ys[::-1, 1]], axis=-1)
        return ys[:, 0]

    def step(carry, xw_t):
        h, c = carry  # [D, B, H]
        gates = xw_t + jnp.einsum("dbh,dhg->dbg", h, w_hh_t, precision=prec)
        i = jax.nn.sigmoid(gates[..., 0 * H:1 * H])
        f = jax.nn.sigmoid(gates[..., 1 * H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H:4 * H])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((D, B, H), x.dtype)
    c0 = jnp.zeros((D, B, H), x.dtype)
    _, ys = jax.lax.scan(step, (h0, c0), xw)  # ys: [T, D, B, H]

    if D == 2:
        fwd = ys[:, 0]
        bwd = ys[::-1, 1]
        return jnp.concatenate([fwd, bwd], axis=-1)
    return ys[:, 0]


def bilstm(x, params, hidden_size, dropout_rate=0.0,
           dropout_rng: Optional[jax.Array] = None, impl="scan"):
    """Multi-layer bidirectional LSTM. x: [T, B, I] -> [T, B, 2H].

    Dropout (rate 0.5 in the reference) applies between layers only, matching
    PyTorch nn.LSTM(dropout=...) semantics — never after the last layer.
    """
    h = x
    n = len(params)
    for li, p in enumerate(params):
        h = _bidir_layer(h, p, hidden_size, impl=impl)
        if dropout_rate > 0.0 and dropout_rng is not None and li < n - 1:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, h.shape)
            h = jnp.where(keep, h / (1.0 - dropout_rate), 0.0)
    return h


def torch_lstm_state_to_params(state_dict, prefix, num_layers=2,
                               bidirectional=True):
    """Convert torch nn.LSTM state_dict tensors to this module's params.

    Torch names: {prefix}weight_ih_l{k}[_reverse] etc. Biases b_ih and b_hh
    are always summed in the cell, so they fold into one vector.
    """
    import numpy as np

    D = 2 if bidirectional else 1
    layers = []
    for layer in range(num_layers):
        w_ih, w_hh, b = [], [], []
        for d in range(D):
            sfx = "_reverse" if d == 1 else ""
            w_ih.append(np.asarray(state_dict[f"{prefix}weight_ih_l{layer}{sfx}"]))
            w_hh.append(np.asarray(state_dict[f"{prefix}weight_hh_l{layer}{sfx}"]))
            b.append(np.asarray(state_dict[f"{prefix}bias_ih_l{layer}{sfx}"]) +
                     np.asarray(state_dict[f"{prefix}bias_hh_l{layer}{sfx}"]))
        layers.append({
            "w_ih": jnp.asarray(np.stack(w_ih)),
            "w_hh": jnp.asarray(np.stack(w_hh)),
            "b": jnp.asarray(np.stack(b)),
        })
    return layers
