"""Horizontal wrap padding: the equirectangular seam is periodic.

The reference monkey-patches every Conv2d to prepend an LR_PAD module
(model.py:27-55). Here wrap padding is an explicit functional op applied by
the conv wrappers in horizonnet_tpu.models; XLA fuses the concat into the
convolution's input window.
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
