"""Fused ResNet bottleneck block as one Pallas TPU kernel (serving only).

Why: the round-5 roofline (README "Serving MFU and the roofline that pins
it") showed the batch-64 serving program is HBM-bandwidth-bound — 75.8% of
device self-time is DMA, and the largest op groups are the early-stage
bottleneck convs whose intermediate activations ([B, H, W, width] between
conv1/conv2/conv3) are written to and re-read from HBM between fusions.
XLA cannot keep them resident: each conv is a separate fusion root. This
kernel computes an entire identity bottleneck block (ref model.py:61-91 —
torchvision Bottleneck: 1x1 -> 3x3 -> 1x1 with BN+ReLU between, residual
add, final ReLU) per spatial tile with every intermediate in VMEM, so HBM
sees exactly one read of the input tile (+2 halo rows) and one write of
the output tile.

Design (TPU-first, not a translation):
- NHWC, full-width tiles: the pano wrap axis (W) stays inside the tile,
  so the 3x3 conv's circular W-padding (WrapConv semantics,
  ref model.py:27-55) is a VMEM concat — no halo DMA on W at all.
- H halo (zero padding, like WrapConv's H zeros): the two neighbor rows
  per tile are precomputed OUTSIDE the kernel as a tiny [B, nH, 2, W, C]
  strided-slice tensor (2/TH of the input re-read, <2% traffic), so every
  kernel input uses plain auto-pipelined BlockSpecs — Pallas double-
  buffers all loads; no manual DMA or semaphores.
- The three convs are dot_generals on the MXU: the 1x1s contract C
  directly; the 3x3 is 9 shifted [TH*W, width] x [width, width] matmuls
  accumulated in f32.
- BatchNorm is inference-mode affine (running stats) and is folded into
  the conv weights/biases by the caller (fold_conv_bn) — the kernel sees
  only (w, b) pairs. This is serving-only by construction, like
  models/layers.py QuantConvBN.

Numerics: accumulation in f32 with one cast to the activation dtype after
each conv+ReLU — the unfused path rounds at the same three points (conv
output, BN output in model dtype), so outputs match the unfused block to
activation-dtype tolerance (exact-ish in f32; see tests/test_pallas_block.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_conv_bn(kernel, gamma, beta, mean, var, eps=1e-5):
    """Fold an inference-mode BatchNorm into the preceding conv.

    kernel: [kh, kw, Cin, Cout] (no conv bias in the resnet family);
    BN(conv(x)) == conv'(x) + b' with conv' = kernel * s and
    b' = beta - mean * s, s = gamma / sqrt(var + eps). Returns
    (folded_kernel f32, bias f32 [Cout]).
    """
    s = gamma / jnp.sqrt(var + eps)
    return (kernel.astype(jnp.float32) * s, beta - mean * s)


def _block_kernel(xc_ref, xh_ref, w1_ref, w2_ref, w3_ref,
                  b1_ref, b2_ref, b3_ref, o_ref):
    dt = o_ref.dtype
    f32 = jnp.float32
    xc = xc_ref[0]                                     # [TH, W, C]
    TH, W, _ = xc.shape
    xt = jnp.concatenate([xh_ref[0, 0, 0:1], xc, xh_ref[0, 0, 1:2]],
                         axis=0)                       # [TH+2, W, C]

    # conv1 (1x1) + folded BN + ReLU, over the haloed rows so conv2's
    # 3x3 sees real neighbor activations (zeros at the H edges)
    m = jax.lax.dot_general(xt, w1_ref[:], (((2,), (0,)), ((), ())),
                            preferred_element_type=f32)
    m = jnp.maximum(m + b1_ref[0], 0.0).astype(dt)     # [TH+2, W, Wd]
    # At the feature map's global top/bottom, conv2's zero padding is
    # zero in POST-conv1 activation space — but the halo input row there
    # is zeros, which conv1+bias maps to relu(b1) != 0. Zero those rows.
    i = pl.program_id(1)
    row = jax.lax.broadcasted_iota(jnp.int32, (m.shape[0], 1, 1), 0)
    keep = ((row > 0) | (i > 0)) & (
        (row < m.shape[0] - 1) | (i < pl.num_programs(1) - 1))
    m = jnp.where(keep, m, 0)

    # conv2 (3x3, wrap W / zero H) as 9 shifted MXU matmuls
    mw = jnp.concatenate([m[:, -1:], m, m[:, :1]], axis=1)  # wrap cols
    acc = jnp.zeros((TH, W, w2_ref.shape[-1]), f32) + b2_ref[0]
    for dy in range(3):
        for dx in range(3):
            acc = acc + jax.lax.dot_general(
                mw[dy:dy + TH, dx:dx + W], w2_ref[dy, dx],
                (((2,), (0,)), ((), ())), preferred_element_type=f32)
    m2 = jnp.maximum(acc, 0.0).astype(dt)              # [TH, W, Wd]

    # conv3 (1x1) + folded BN + residual + ReLU
    y = jax.lax.dot_general(m2, w3_ref[:], (((2,), (0,)), ((), ())),
                            preferred_element_type=f32)
    y = y + b3_ref[0] + xc.astype(f32)
    o_ref[0] = jnp.maximum(y, 0.0).astype(dt)


def _tile_rows(H, C):
    """Rows per tile: sized so tile + intermediates + weights fit VMEM
    (~16 MB) across the resnet50/101/152 stage shapes."""
    TH = 8 if C >= 2048 else 16
    while H % TH:
        TH //= 2
    return max(TH, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, interpret=False):
    """One identity bottleneck block (stride 1, no downsample, groups=1).

    x: [B, H, W, C]; w1 [1,1,C,Wd] / w2 [3,3,Wd,Wd] / w3 [1,1,Wd,C]
    folded conv kernels (fold_conv_bn), b* their f32 biases. Returns
    relu(conv3(relu(conv2(relu(conv1(x))))) + x) with WrapConv padding
    semantics (wrap W, zero H) in x.dtype.
    """
    B, H, W, C = x.shape
    Wd = w1.shape[-1]
    assert w1.shape == (1, 1, C, Wd) and w3.shape == (1, 1, Wd, C), (
        w1.shape, w3.shape)
    assert w2.shape == (3, 3, Wd, Wd), w2.shape
    TH = _tile_rows(H, C)
    nH = H // TH

    # Halo rows, precomputed as strided slices (2/TH of x re-read):
    # tile i consumes rows [i*TH-1, (i+1)*TH] — its top halo is the last
    # row of tile i-1, its bottom halo the first row of tile i+1; the
    # outermost rows are zeros (WrapConv zero-pads H).
    zrow = jnp.zeros((B, 1, W, C), x.dtype)
    if nH > 1:
        top = jnp.concatenate([zrow, x[:, TH - 1::TH][:, :nH - 1]], axis=1)
        bot = jnp.concatenate([x[:, TH::TH], zrow], axis=1)
    else:
        top, bot = zrow, zrow
    xh = jnp.stack([top, bot], axis=2)                 # [B, nH, 2, W, C]

    dt = x.dtype
    w1d, w2d, w3d = (w.astype(dt) for w in (w1, w2, w3))
    b1r, b2r, b3r = (jnp.asarray(b, jnp.float32)[None] for b in (b1, b2, b3))

    return pl.pallas_call(
        _block_kernel,
        grid=(B, nH),
        in_specs=[
            pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, W, C), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Wd), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, Wd, Wd), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wd, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Wd), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Wd), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), dt),
        # Double-buffered in/out tiles + the f32 conv3 accumulator put the
        # stage-1 tile at ~20 MB — above the 16 MB default scoped-vmem
        # cap but well inside the chip's physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(x, xh, w1d[0, 0], w2d, w3d[0, 0], b1r, b2r, b3r)
