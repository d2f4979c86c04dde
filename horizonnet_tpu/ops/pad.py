"""Horizontal wrap padding: the equirectangular seam is periodic.

The reference monkey-patches every Conv2d to prepend an LR_PAD module
(model.py:27-55) — a circular pad before EVERY conv. The default here
(`wrap_pad_width` + conv, models/layers.py WrapConv) expresses the same
thing functionally, and XLA:TPU fuses the pad concat into the conv
input — VERIFIED EMPIRICALLY in round 4: an alternative that avoids the
concat entirely (zero-padded conv + recomputing only the seam-crossing
output columns from a tiny wrapped strip, `seam_layout` +
WrapConv(seam_fix=True)) measured 10% SLOWER on the v5e serving
pipeline (554.8 vs 616.4 panos/s), showing the concat was never
materialized there. The seam path is kept, bit-exact and tested, for
backends where pad concats do cost a copy.
"""

import jax.numpy as jnp


def wrap_pad_width(x, pad: int, axis: int = -1):
    """Circularly pad ``x`` along ``axis`` by ``pad`` on each side.

    Equivalent to the reference's lr_pad (model.py:27-29): the left pad is a
    copy of the rightmost columns and vice versa.
    """
    if pad == 0:
        return x
    left = jnp.take(x, jnp.arange(x.shape[axis] - pad, x.shape[axis]), axis=axis)
    right = jnp.take(x, jnp.arange(0, pad), axis=axis)
    return jnp.concatenate([left, x, right], axis=axis)


def seam_layout(W: int, kw: int, sw: int, pw: int):
    """Geometry of the seam-correction strip for a width-wrapped conv.

    For a conv of kernel width ``kw``, width stride ``sw`` and symmetric
    wrap padding ``pw`` over input width ``W``, the zero-padded conv
    already produces the correct output everywhere except the output
    columns whose window crosses the seam. Those outputs are exactly the
    ones a single VALID conv over the wrapped strip
    ``concat(x[..., W-a:], x[..., :b])`` reproduces, in order
    [right-edge cols..., left-edge cols...].

    Returns (n_left, n_right, a, b), or None when the fast path's
    alignment preconditions don't hold (caller falls back to the
    materialized wrap pad):
    - pw == (kw-1)/2 (odd kernel, torch-style symmetric padding), and
    - W % sw == 0 so the strip's stride phase continues the main conv's.
    """
    if pw <= 0 or kw % 2 == 0 or 2 * pw != kw - 1 or W % sw != 0:
        return None
    w_out = (W + 2 * pw - kw) // sw + 1
    if w_out * sw != W:
        return None
    n_left = -(-pw // sw)                       # ceil(pw / sw)
    j_r0 = (W - kw + pw) // sw + 1              # first seam-crossing right col
    n_right = w_out - j_r0
    a = W - (j_r0 * sw - pw)                    # right-end input cols
    b = (n_left - 1) * sw - pw + kw             # wrapped left input cols
    if n_left + n_right >= w_out or a > W or b > W or a < 0 or b < 0:
        return None
    assert a + b == (n_left + n_right - 1) * sw + kw, (a, b, n_left, n_right)
    return n_left, n_right, a, b
