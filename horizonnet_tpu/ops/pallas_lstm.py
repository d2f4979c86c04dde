"""Fused bidirectional LSTM recurrence as a Pallas TPU kernel.

Replaces the ``lax.scan`` recurrence of ops/lstm.py:_bidir_layer (the
reference's cuDNN LSTM, model.py:221-227) for the serving path. Why a
kernel: under scan, XLA re-reads the recurrent weights from HBM on every
one of the T=256 steps (W_hh is 2x512x2048 — ~2 MB bf16 — so the scan
moves ~0.5 GB of weight traffic per forward); here W_hh, h and c stay
resident in VMEM across the whole sequence and only the per-step gate
inputs stream in, double-buffered by the Pallas grid pipeline.

Contract (mirrors the scan path exactly):
  xw   [T, D, B, 4H]  hoisted input projections + bias, direction d=1
                      already time-reversed (as _bidir_layer builds them)
  w_hh [D, H, 4H]     recurrent weights, transposed
  ->   [T, D, B, H]   per-step hidden states (d=1 still time-reversed)

Gate order i, f, g, o (PyTorch), zero initial state. The cell runs in
f32 regardless of input dtype (the MXU accumulates bf16 operands in f32
natively; carrying h/c in f32 costs nothing and keeps long-sequence
drift below bf16's 2^-8 ulp).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bilstm_kernel(xw_ref, w_ref, out_ref, h_ref, c_ref, *, hidden):
    t = pl.program_id(0)
    H = hidden
    D = w_ref.shape[0]

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    for d in range(D):  # static unroll: two [B,H] x [H,4H] MXU dots
        gates = xw_ref[0, d].astype(jnp.float32) + jnp.dot(
            h_ref[d], w_ref[d].astype(jnp.float32),
            preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
        c = f * c_ref[d] + i * g
        h = o * jnp.tanh(c)
        h_ref[d] = h
        c_ref[d] = c
        out_ref[0, d] = h.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bilstm_recurrence_pallas(xw, w_hh_t, interpret=False):
    """Run the fused recurrence. xw: [T, D, B, 4H]; w_hh_t: [D, H, 4H].

    Returns ys [T, D, B, H] in xw's dtype. ``interpret=True`` runs the
    kernel in the Pallas interpreter (for CPU-backed tests).
    """
    T, D, B, G = xw.shape
    H = G // 4
    assert w_hh_t.shape == (D, H, G), (w_hh_t.shape, (D, H, G))

    kernel = functools.partial(_bilstm_kernel, hidden=H)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, D, B, G), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H, G), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, B, H), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, D, B, H), xw.dtype),
        scratch_shapes=[
            pltpu.VMEM((D, B, H), jnp.float32),
            pltpu.VMEM((D, B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw, w_hh_t)
