"""Batched bilinear gather-resampling with periodic (wrap) addressing.

This is the core image-warping primitive of the framework — the TPU-native
replacement for scipy.ndimage.map_coordinates(order=1, mode='wrap') which the
reference calls per channel, per image, on host for:

- pano-stretch augmentation (misc/panostretch.py:99-102)
- vanishing-point rotation warps (misc/pano_lsd_align.py:101-122)
- perspective view cutting (misc/pano_lsd_align.py:174-226)
- floor-plane rasterization (misc/post_proc.py:10-19)

Design: one fused gather of the 4 neighbor taps + lerp, vectorized over the
full pixel grid and batch. Addressing is periodic with period N (true
equirect wrap). NOTE: scipy's mode='wrap' uses period N-1 (the last sample
aliases the first); that is a sub-pixel approximation of the true periodic
image that only differs within one pixel of the seam. We deliberately use
the geometrically-correct period-N wrap ('grid-wrap' in scipy terms).
"""

import jax
import jax.numpy as jnp


def bilinear_wrap_sample(img, coords_y, coords_x):
    """Sample ``img`` [H, W] or [H, W, C] at float coords with periodic wrap.

    coords_y/coords_x: arrays of any matching shape S. Returns S (+ [C]).
    """
    H, W = img.shape[0], img.shape[1]
    y0 = jnp.floor(coords_y)
    x0 = jnp.floor(coords_x)
    wy = (coords_y - y0)[..., None] if img.ndim == 3 else (coords_y - y0)
    wx = (coords_x - x0)[..., None] if img.ndim == 3 else (coords_x - x0)

    y0i = jnp.mod(y0.astype(jnp.int32), H)
    y1i = jnp.mod(y0i + 1, H)
    x0i = jnp.mod(x0.astype(jnp.int32), W)
    x1i = jnp.mod(x0i + 1, W)

    # Flatten to one gather per tap (TPU-friendly: single big take)
    flat = img.reshape((H * W,) + img.shape[2:])
    def tap(yi, xi):
        return jnp.take(flat, (yi * W + xi).reshape(-1), axis=0).reshape(
            coords_y.shape + img.shape[2:])

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x1i)
    v10 = tap(y1i, x0i)
    v11 = tap(y1i, x1i)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def bilinear_sample_nhwc(imgs, coords_y, coords_x):
    """Batched variant: imgs [B, H, W, C], coords [B, ...] -> [B, ..., C]."""
    return jax.vmap(bilinear_wrap_sample)(imgs, coords_y, coords_x)
