"""Half-pixel-center bilinear width resize (torch align_corners=False).

The height-compression stage resizes each feature map's width to out_w with
a one-column wrap pad and edge trim (model.py:151-156). Heights are left
untouched, so this implements the 1D (width-only) case as an explicit
two-tap gather — exact torch semantics, cheap on TPU, no antialiasing.
"""

import jax.numpy as jnp

from .pad import wrap_pad_width


def resize_width_bilinear(x, out_w):
    """Resize the last axis of ``x`` [..., W] to out_w.

    Output center j samples input coordinate (j + 0.5) * W/out_w - 0.5,
    clamped to [0, W-1] (torch align_corners=False convention).
    """
    in_w = x.shape[-1]
    if in_w == out_w:
        return x
    scale = in_w / out_w
    coords = (jnp.arange(out_w) + 0.5) * scale - 0.5
    coords = jnp.clip(coords, 0.0, in_w - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_w - 1)
    w = (coords - lo).astype(x.dtype)
    return jnp.take(x, lo, axis=-1) * (1 - w) + jnp.take(x, hi, axis=-1) * w


def wrap_resize_width(x, out_w):
    """Wrap-pad one column each side, resize to out_w + 2*factor, trim.

    Exactly the reference's GlobalHeightConv tail (model.py:151-156): the
    wrap pad makes the interpolation seam-free, the trim removes the padded
    region at the upsampled scale. Requires out_w % W == 0.
    """
    in_w = x.shape[-1]
    assert out_w % in_w == 0, (out_w, in_w)
    factor = out_w // in_w
    x = wrap_pad_width(x, 1)
    x = resize_width_bilinear(x, out_w + 2 * factor)
    return x[..., factor:-factor]
