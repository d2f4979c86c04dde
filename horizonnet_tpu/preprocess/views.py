"""Batched perspective view cutting: 26 views in one device gather.

The reference cuts views one at a time on host (separatePano/imgLookAt,
misc/pano_lsd_align.py:174-245), each a full map_coordinates resample.
Here the source-coordinate math for all views is vmapped and the pano is
sampled once — a single [V, S, S] wrap-bilinear gather on device.

View set (panoEdgeDetection, pano_lsd_align.py:818-827): 12 horizon views
every 30 deg, 12 at elevation +-45 deg, 2 poles; fov pi/3, 320 px.
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.resample import bilinear_wrap_sample


def preprocess_backend(backend=None):
    """Resolve the warp backend: 'host' (numpy, default) or 'device'.

    Every stage around these warps (LSD, merge, Hough, refit) is host
    work, so the device path only pays off when the host<->device link
    is fast and the host is the bottleneck — on this sandbox's tunnel
    (~25-35 MB/s once a program is loaded) the host path is ~10x faster
    end to end. HORIZONNET_PREPROCESS_BACKEND overrides.
    """
    b = backend or os.environ.get("HORIZONNET_PREPROCESS_BACKEND", "host")
    if b not in ("host", "device"):
        raise ValueError(f"unknown preprocess backend {b!r}")
    return b


def view_directions():
    xh = np.arange(-np.pi, np.pi * 5 / 6, np.pi / 6)
    yh = np.zeros(len(xh))
    xp = np.array([-3, -2, -1, 0, 1, 2, -3, -2, -1, 0, 1, 2]) / 3 * np.pi
    yp = np.array([1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1]) / 4 * np.pi
    x = np.concatenate([xh, xp, [0, 0]])
    y = np.concatenate([yh, yp, [np.pi / 2, -np.pi / 2]])
    return x, y


VIEW_DIRECTIONS = view_directions()


def _view_source_coords(vx, vy, size, fov, sphereH, sphereW):
    """Pano source pixel coords (y, x) for one perspective view.

    Tangent-plane ray construction matching imgLookAt
    (pano_lsd_align.py:174-225): pixel offsets (TX, TY) from the view
    center, focal r = S/2/tan(fov/2); tilt by vy around the horizontal
    axis, then pan by vx.
    """
    t = jnp.arange(1, size + 1, dtype=jnp.float32) - 0.5 - size / 2
    TX = jnp.broadcast_to(t[None, :], (size, size))   # column offset
    TY = jnp.broadcast_to(t[:, None], (size, size))   # row offset
    r = size / 2 / np.tan(fov / 2)

    R = jnp.sqrt(TY ** 2 + r ** 2)
    ang_y = jnp.arctan(-TY / r) + vy

    X = jnp.sin(ang_y) * R
    Y = -jnp.cos(ang_y) * R
    Z = TX

    flip = jnp.abs(ang_y) > np.pi / 2

    ang_x = jnp.arctan2(Z, -Y)  # atan(Z/-Y) with quadrant fix below
    # Reference uses atan(Z/-Y) then adds pi where |ang_y|>pi/2; emulate
    # with plain arctan to keep identical branch structure
    ang_x = jnp.arctan(Z / -Y)
    ang_x = jnp.where(flip, ang_x + np.pi, ang_x)

    RZY = jnp.sqrt(Z ** 2 + Y ** 2)
    ang_y2 = jnp.arctan(X / RZY)
    ang_x = ang_x + vx

    below = ang_y2 < -np.pi / 2
    ang_y2 = jnp.where(below, -np.pi - ang_y2, ang_y2)
    ang_x = jnp.where(below, ang_x + np.pi, ang_x)

    ang_x = jnp.mod(ang_x + np.pi, 2 * np.pi) - np.pi

    Px = (ang_x + np.pi) / (2 * np.pi) * sphereW + 0.5
    Py = (-ang_y2 + np.pi / 2) / np.pi * sphereH + 0.5
    # to 0-based sample coordinates
    return Py - 1.0, Px - 1.0


def cut_views(pano, size=320, fov=np.pi / 3, directions=None, backend=None):
    """Cut all views at once. pano: [H, W, C] float. Returns [V, S, S, C].

    Wrap-addressing replaces the reference's 2-column pad + clamp; the two
    agree everywhere except sub-pixel at the seam, where wrap is exact.
    """
    if preprocess_backend(backend) == "host":
        from .host_resample import cut_views_host
        return cut_views_host(pano, size=size, fov=fov,
                              directions=directions)
    if directions is None:
        xs, ys = VIEW_DIRECTIONS
    else:
        xs, ys = directions
    return _cut_jit(jnp.asarray(pano), jnp.asarray(xs, jnp.float32),
                    jnp.asarray(ys, jnp.float32), size, float(fov))


# Module-level jit (NOT a closure per call): the jit cache is keyed by
# function identity, so a fresh ``@jax.jit`` inside the entry point would
# re-trace + recompile on EVERY pano — over the remote tunnel that is a
# compile-cache round-trip per call and was most of this stage's cost.
@functools.partial(jax.jit, static_argnames=("size", "fov"))
def _cut_jit(pano, xs, ys, size, fov):
    H, W = pano.shape[:2]

    def one(vx, vy):
        py, px = _view_source_coords(vx, vy, size, fov, H, W)
        return bilinear_wrap_sample(pano, py, px)

    return jax.vmap(one)(xs, ys)


def rgb_to_gray(views):
    """ITU-R 601 luma (cv2 RGB2GRAY weights): [.., 3] -> [..].

    Elementwise form (not @): the default matmul path would truncate f32
    to bf16, costing ~1/255 of gray precision right at LSD's quantization
    threshold.
    """
    w = jnp.asarray([0.299, 0.587, 0.114], views.dtype)
    return (views * w).sum(-1)


def cut_views_gray(pano, size=320, fov=np.pi / 3, directions=None,
                   backend=None):
    """Cut all views and reduce to grayscale in ONE program.

    Host backend (default): fixed precomputed gather tables, f32 out.
    Device backend: one fused cut+luma gather; returns [V, S, S] luma
    only, f16 — the VP pipeline needs just the grays for LSD, and fusing
    the reduction before the download cuts the host<-device traffic 4x
    vs materializing the RGB views ([V,S,S,3] f32) and graying on a
    second pass.
    """
    if preprocess_backend(backend) == "host":
        from .host_resample import cut_views_gray_host
        return cut_views_gray_host(pano, size=size, fov=fov,
                                   directions=directions)
    if directions is None:
        xs, ys = VIEW_DIRECTIONS
    else:
        xs, ys = directions
    return _cut_gray_jit(jnp.asarray(pano), jnp.asarray(xs, jnp.float32),
                         jnp.asarray(ys, jnp.float32), size, float(fov))


@functools.partial(jax.jit, static_argnames=("size", "fov"))
def _cut_gray_jit(pano, xs, ys, size, fov):
    # Module-level jit for the same per-call-recompile reason as _cut_jit.
    H, W = pano.shape[:2]
    pano = pano.astype(jnp.float32)   # uint8 panos upload 4x cheaper

    def one(vx, vy):
        py, px = _view_source_coords(vx, vy, size, fov, H, W)
        return rgb_to_gray(bilinear_wrap_sample(pano, py, px))

    g = jax.vmap(one)(xs, ys)
    # f16 halves the host<-device bytes (the dominant cost of this
    # stage on a thin link); at the 0..255 luma scale f16 rounds by
    # <= ~0.12 gray levels — an order below LSD's quant=0.7 error
    # model, so detections are unchanged (golden-VP slow test pins
    # the end-to-end angle)
    return g.astype(jnp.float16)
