"""Half-pixel-center bilinear width resize (torch align_corners=False).

The height-compression stage resizes each feature map's width to out_w with
a one-column wrap pad and edge trim (model.py:151-156).

TPU design note: a gather along the minor-most (lane) axis lowers to a
scalar gather loop on TPU and measured ~6 seconds for the 4 resizes of the
height stage. Bilinear resize is a linear map, so it is instead expressed
as a matmul with a constant two-banded interpolation matrix — the MXU eats
it, and XLA constant-folds the matrix construction.
"""

import numpy as np
import jax.numpy as jnp
from jax import lax


def _interp_matrix(in_w: int, out_w: int) -> np.ndarray:
    """[in_w, out_w] matrix M with out = x @ M (torch align_corners=False)."""
    coords = (np.arange(out_w) + 0.5) * (in_w / out_w) - 0.5
    coords = np.clip(coords, 0.0, in_w - 1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, in_w - 1)
    w = coords - lo
    M = np.zeros((in_w, out_w), np.float32)
    cols = np.arange(out_w)
    M[lo, cols] += 1.0 - w
    M[hi, cols] += w
    return M


def resize_width_bilinear(x, out_w, axis=-1):
    """Resize ``axis`` of x to out_w via a constant-matrix matmul."""
    in_w = x.shape[axis]
    if in_w == out_w:
        return x
    M = jnp.asarray(_interp_matrix(in_w, out_w), x.dtype)
    moved = jnp.moveaxis(x, axis, -1)
    prec = lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    out = jnp.einsum("...w,wo->...o", moved, M, precision=prec)
    return jnp.moveaxis(out, -1, axis)


def wrap_resize_width(x, out_w, axis=-1):
    """Wrap-pad one column each side, resize to out_w + 2*factor, trim.

    Exactly the reference's GlobalHeightConv tail (model.py:151-156): the
    wrap pad makes the interpolation seam-free, the trim removes the padded
    region at the upsampled scale. Requires out_w % W == 0. The pad + trim
    fold into the interpolation matrix (single fused matmul).
    """
    in_w = x.shape[axis]
    assert out_w % in_w == 0, (out_w, in_w)
    factor = out_w // in_w
    if factor == 1 and in_w == out_w:
        # Still not identity: the reference resizes the padded signal
        pass
    M_full = _interp_matrix(in_w + 2, out_w + 2 * factor)
    M = M_full[:, factor:-factor]                       # trim columns
    # Fold the circular pad into the matrix rows: padded row 0 is the last
    # input column, padded row in_w+1 is the first
    M_fold = np.zeros((in_w, out_w + 0), np.float32)
    M_fold += M[1:in_w + 1]
    M_fold[in_w - 1] += M[0]
    M_fold[0] += M[in_w + 1]
    Mj = jnp.asarray(M_fold, x.dtype)
    moved = jnp.moveaxis(x, axis, -1)
    prec = lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    out = jnp.einsum("...w,wo->...o", moved, Mj, precision=prec)
    return jnp.moveaxis(out, -1, axis)
