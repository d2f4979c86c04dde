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


def _bilstm_train_fwd_kernel(xw_ref, w_ref, out_ref, gates_ref, cs_ref,
                             h_ref, c_ref, *, hidden):
    """Forward kernel that also emits per-step residuals for the VJP:
    post-activation gates (i,f,g,o) and the cell-state sequence."""
    t = pl.program_id(0)
    H = hidden
    D = w_ref.shape[0]

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    for d in range(D):
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
        acts = jnp.concatenate([i, f, g, o], axis=-1)
        gates_ref[0, d] = acts.astype(gates_ref.dtype)
        cs_ref[0, d] = c.astype(cs_ref.dtype)


def _bilstm_bwd_kernel(gates_ref, cs_ref, cprev_ref, dy_ref, wT_ref,
                       dxw_ref, dh_ref, dc_ref, *, hidden):
    """Reverse-time backward recurrence. Grid step j visits t = T-1-j
    (in_specs index maps do the reversal); dh/dc carries live in VMEM
    scratch; the only HBM traffic per step is the residual blocks.

    Math (standard LSTM VJP, gate order i,f,g,o):
      dh   = dy_t + dh_carry
      tc   = tanh(c_t)
      da_o = dh*tc * o*(1-o)
      dc   = dh*o*(1-tc^2) + dc_carry
      da_f = dc*c_{t-1} * f*(1-f)
      da_i = dc*g * i*(1-i)
      da_g = dc*i * (1-g^2)
      dxw_t = [da_i, da_f, da_g, da_o]
      dh_carry = dxw_t @ W^T      (the one MXU dot per step)
      dc_carry = dc * f
    """
    j = pl.program_id(0)
    H = hidden
    D = wT_ref.shape[0]

    @pl.when(j == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)

    for d in range(D):
        acts = gates_ref[0, d].astype(jnp.float32)
        i = acts[:, 0 * H:1 * H]
        f = acts[:, 1 * H:2 * H]
        g = acts[:, 2 * H:3 * H]
        o = acts[:, 3 * H:4 * H]
        c_t = cs_ref[0, d].astype(jnp.float32)
        c_prev = cprev_ref[0, d].astype(jnp.float32)

        dh = dy_ref[0, d].astype(jnp.float32) + dh_ref[d]
        tc = jnp.tanh(c_t)
        da_o = dh * tc * o * (1.0 - o)
        dc = dh * o * (1.0 - tc * tc) + dc_ref[d]
        da_f = dc * c_prev * f * (1.0 - f)
        da_i = dc * g * i * (1.0 - i)
        da_g = dc * i * (1.0 - g * g)
        da = jnp.concatenate([da_i, da_f, da_g, da_o], axis=-1)
        dxw_ref[0, d] = da.astype(dxw_ref.dtype)
        dh_ref[d] = jnp.dot(da, wT_ref[d].astype(jnp.float32),
                            preferred_element_type=jnp.float32)
        dc_ref[d] = dc * f


@functools.partial(jax.jit, static_argnames=("interpret",))
def _train_fwd(xw, w_hh_t, interpret=False):
    T, D, B, G = xw.shape
    H = G // 4
    kernel = functools.partial(_bilstm_train_fwd_kernel, hidden=H)
    ys, gates, cs = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, D, B, G), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H, G), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, D, B, H), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, B, G), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, B, H), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, D, B, H), xw.dtype),
            jax.ShapeDtypeStruct((T, D, B, G), xw.dtype),
            jax.ShapeDtypeStruct((T, D, B, H), xw.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, B, H), jnp.float32),
            pltpu.VMEM((D, B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw, w_hh_t)
    return ys, gates, cs


@functools.partial(jax.jit, static_argnames=("interpret",))
def _train_bwd(w_hh_t, ys, gates, cs, dys, interpret=False):
    T, D, B, G = gates.shape
    H = G // 4
    w_hh_T = jnp.swapaxes(w_hh_t, 1, 2)              # [D, 4H, H]
    zrow = jnp.zeros_like(cs[:1])
    c_prev = jnp.concatenate([zrow, cs[:-1]], axis=0)
    h_prev = jnp.concatenate([jnp.zeros_like(ys[:1]), ys[:-1]], axis=0)

    kernel = functools.partial(_bilstm_bwd_kernel, hidden=H)
    rev = lambda j: (T - 1 - j, 0, 0, 0)             # noqa: E731
    dxw = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, D, B, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, G, H), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, B, G), rev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, D, B, G), gates.dtype),
        scratch_shapes=[
            pltpu.VMEM((D, B, H), jnp.float32),
            pltpu.VMEM((D, B, H), jnp.float32),
        ],
        interpret=interpret,
    )(gates, cs, c_prev, dys, w_hh_T)

    # Weight gradient as ONE big MXU contraction over (T, B) — no need to
    # accumulate it inside the sequential kernel:
    #   dW[d, h, g] = sum_{t,b} h_prev[t,d,b,h] * da[t,d,b,g]
    dW = jnp.einsum("tdbh,tdbg->dhg",
                    h_prev.astype(jnp.float32), dxw.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    return dxw, dW.astype(w_hh_t.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bilstm_recurrence_trainable(xw, w_hh_t, interpret=False):
    """Differentiable fused recurrence (same contract as
    bilstm_recurrence_pallas): the training-path twin. Forward saves the
    per-step gate activations + cell states as VJP residuals; backward is
    a second Pallas kernel running the reverse-time recurrence with the
    dh/dc carries VMEM-resident (one [B,4H]x[4H,H] MXU dot per step).
    The weight gradient is contracted outside the kernel as one
    [H, T*B] x [T*B, 4H] matmul per direction.
    """
    ys, _, _ = _train_fwd(xw, w_hh_t, interpret=interpret)
    return ys


def _trainable_fwd(xw, w_hh_t, interpret=False):
    ys, gates, cs = _train_fwd(xw, w_hh_t, interpret=interpret)
    return ys, (w_hh_t, ys, gates, cs)


def _trainable_bwd(interpret, res, dys):
    w_hh_t, ys, gates, cs = res
    dxw, dW = _train_bwd(w_hh_t, ys, gates, cs,
                         dys.astype(gates.dtype), interpret=interpret)
    return dxw.astype(gates.dtype), dW


bilstm_recurrence_trainable.defvjp(_trainable_fwd, _trainable_bwd)


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
