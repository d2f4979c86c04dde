"""Panorama rotation by a 3x3 rotation (VP alignment warp) on device.

Reference behavior: misc/pano_lsd_align.py:125-171 (rotatePanorama): for
each output pixel, compute its sphere direction, rotate back through
R^-1 (R = inv(vp.T) when built from a VP triplet), and sample the source
pano bilinearly. One fused device gather here, instead of the reference's
border-padded host resample (whose bottom-row wrap has a known copy-from-
row-0 typo, pano_lsd_align.py:163, not reproduced).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.resample import bilinear_wrap_sample


def _rotate_f32(img, Rinv, H, W):
    """Traced warp body shared by the float and uint8 entry points."""
    xs = ((jnp.arange(1, W + 1, dtype=jnp.float32) - W / 2 - 0.5)
          / W * 2 * np.pi)
    ys = -((jnp.arange(1, H + 1, dtype=jnp.float32) - H / 2 - 0.5)
           / H * np.pi)
    u = jnp.broadcast_to(xs[None, :], (H, W))
    v = jnp.broadcast_to(ys[:, None], (H, W))
    # planeID=1 sphere direction
    x = jnp.cos(v) * jnp.sin(u)
    y = jnp.cos(v) * jnp.cos(u)
    z = jnp.sin(v)
    xyz = jnp.stack([x, y, z], -1)            # [H, W, 3]
    # old = Rinv @ new per pixel (row-vector form: xyz @ Rinv^T).
    # HIGHEST precision: the default matmul path truncates f32 operands
    # to bf16 passes, which costs ~0.3px of warp coordinate accuracy
    from jax import lax
    old = jnp.einsum("hwc,dc->hwd", xyz, Rinv.astype(jnp.float32),
                     precision=lax.Precision.HIGHEST)
    ox, oy, oz = old[..., 0], old[..., 1], old[..., 2]
    norm_xy = jnp.maximum(jnp.sqrt(ox ** 2 + oy ** 2), 1e-6)
    norm = jnp.sqrt(ox ** 2 + oy ** 2 + oz ** 2)
    ov = jnp.arcsin(jnp.clip(oz / norm, -1, 1))
    ou = jnp.arcsin(jnp.clip(ox / norm_xy, -1, 1))
    ou = jnp.where((oy < 0) & (ou >= 0), np.pi - ou, ou)
    ou = jnp.where((oy < 0) & (ou < 0), -np.pi - ou, ou)
    Px = (ou + np.pi) / (2 * np.pi) * W + 0.5
    Py = (-ov + np.pi / 2) / np.pi * H + 0.5
    return bilinear_wrap_sample(img, Py - 1.0, Px - 1.0)


# Module-level jits (NOT closures per call): the jit cache is keyed by
# function identity, so a per-call ``@jax.jit`` re-traces + recompiles on
# every pano — over the remote tunnel that is a compile-cache round-trip
# per call.
@jax.jit
def _rot_jit(img, Rinv):
    H, W = img.shape[:2]
    return _rotate_f32(img, Rinv, H, W)


@jax.jit
def _rot_u8_jit(img, Rinv):
    H, W = img.shape[:2]
    out = _rotate_f32(img.astype(jnp.float32), Rinv, H, W)
    return jnp.clip(jnp.floor(out), 0, 255).astype(jnp.uint8)


def rotate_panorama(img, vp=None, R=None, backend=None):
    """img: [H, W, C]; vp: (3,3) VP rows or R: explicit rotation."""
    from .views import preprocess_backend
    if preprocess_backend(backend) == "host":
        from .host_resample import rotate_panorama_host
        return rotate_panorama_host(img, vp=vp, R=R)
    if R is None:
        R = np.linalg.inv(np.asarray(vp, np.float64).T)
    Rinv = np.linalg.inv(R)
    return np.asarray(_rot_jit(jnp.asarray(img), jnp.asarray(Rinv)))


def rotate_panorama_uint8(img_u8, vp=None, R=None, backend=None):
    """uint8-in / uint8-out VP alignment warp: [H, W, C] 0..255.

    Device backend keeps the whole f32 interpolation on device and the
    final ``floor(x)`` quantization there too, so both directions of the
    host<->device transfer are 1 byte/channel instead of 4 (the PNGs the
    preprocess CLI reads and writes are uint8 anyway). Values match the
    float path + host quantization except for the rare interpolated
    pixel landing within f32 rounding of an integer boundary (+-1 LSB).
    """
    from .views import preprocess_backend
    if preprocess_backend(backend) == "host":
        from .host_resample import rotate_panorama_uint8_host
        return rotate_panorama_uint8_host(img_u8, vp=vp, R=R)
    if R is None:
        R = np.linalg.inv(np.asarray(vp, np.float64).T)
    Rinv = np.linalg.inv(R)
    return np.asarray(_rot_u8_jit(jnp.asarray(img_u8), jnp.asarray(Rinv)))
