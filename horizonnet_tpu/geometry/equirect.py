"""Equirectangular pixel <-> angle <-> floor-plane transforms.

Conventions (identical to the reference, cited per function):

- A pano is H x W (canonically 512 x 1024). Pixel centers sit at +0.5.
- Longitude u in (-pi, pi]: u = ((x + 0.5)/W - 0.5) * 2*pi.
- Two latitude conventions coexist in the reference and both are kept,
  explicitly named:
    * "down-positive" v (misc/panostretch.py:32): v = ((y+0.5)/H - 0.5)*pi,
      so the floor (bottom of image) has v > 0. Used by the boundary/label
      pipeline and pano-stretch.
    * "up-positive" v (misc/post_proc.py:26): the negation, so the ceiling
      has v > 0. Used by the Manhattan floor-plane fitting.
- Floor-plane projection places the camera at the (floorW/2-0.5,
  floorH/2-0.5) pixel with x to the right (sin u) and y downward (-cos u)
  (misc/post_proc.py:30-40).

Every function accepts numpy or jax.numpy arrays/scalars and computes with
the matching backend, so host post-processing and on-device kernels share
one implementation.
"""

import math

import numpy as np

PI = math.pi


def _xp(*arrays):
    """Pick the array namespace (numpy or jax.numpy) from the arguments."""
    for a in arrays:
        if type(a).__module__.startswith("jax"):
            import jax.numpy as jnp

            return jnp
    return np


def coorx2u(x, w=1024):
    """Pixel column -> longitude. Ref: misc/panostretch.py:28, post_proc.py:22."""
    return ((x + 0.5) / w - 0.5) * (2 * PI)


def coory2v(y, h=512):
    """Pixel row -> down-positive latitude. Ref: misc/panostretch.py:32."""
    return ((y + 0.5) / h - 0.5) * PI


def coory2v_up(y, h=512):
    """Pixel row -> up-positive latitude. Ref: misc/post_proc.py:26."""
    return -((y + 0.5) / h - 0.5) * PI


def u2coorx(u, w=1024):
    """Longitude -> pixel column. Ref: misc/panostretch.py:36."""
    return (u / (2 * PI) + 0.5) * w - 0.5


def v2coory(v, h=512):
    """Down-positive latitude -> pixel row. Ref: misc/panostretch.py:40."""
    return (v / PI + 0.5) * h - 0.5


def v_up2coory(v, h=512):
    """Up-positive latitude -> pixel row. Ref: misc/post_proc.py:63-64."""
    return (-v / PI + 0.5) * h - 0.5


def uv2xy(u, v, z=-50):
    """(u, down-positive v) on a horizontal plane at height z -> plan (x, y).

    x = c*cos(u), y = c*sin(u) with c = z / tan(v).
    Ref: misc/panostretch.py:44-48.
    """
    xp = _xp(u, v)
    c = z / xp.tan(v)
    return c * xp.cos(u), c * xp.sin(u)


def coor2xy(coor, z=50, coorW=1024, coorH=512, floorW=1024, floorH=512):
    """Pixel (col,row) pairs -> floor-plane image coords, up-positive v.

    Ref: misc/post_proc.py:30-40 (np_coor2xy). ``coor`` is (..., 2).
    """
    xp = _xp(coor)
    coor = xp.asarray(coor)
    u = coorx2u(coor[..., 0], coorW)
    v = coory2v_up(coor[..., 1], coorH)
    c = z / xp.tan(v)
    x = c * xp.sin(u) + floorW / 2 - 0.5
    y = -c * xp.cos(u) + floorH / 2 - 0.5
    return xp.stack([x, y], axis=-1)


def xy2coor(xy, z=50, coorW=1024, coorH=512, floorW=1024, floorH=512):
    """Floor-plane image coords -> pixel (col,row). Ref: misc/post_proc.py:53-66."""
    xp = _xp(xy)
    xy = xp.asarray(xy)
    x = xy[..., 0] - floorW / 2 + 0.5
    y = xy[..., 1] - floorH / 2 + 0.5
    u = xp.arctan2(x, -y)
    v = xp.arctan(z / xp.sqrt(x ** 2 + y ** 2))
    coorx = (u / (2 * PI) + 0.5) * coorW - 0.5
    coory = (-v / PI + 0.5) * coorH - 0.5
    return xp.stack([coorx, coory], axis=-1)


def x_u_solve_y(x, u, floorW=1024, floorH=512):
    """Given a wall plane x=const and a ray longitude u, solve plan-y.

    Ref: misc/post_proc.py:43-45 (np_x_u_solve_y).
    """
    xp = _xp(x, u)
    c = (x - floorW / 2 + 0.5) / xp.sin(u)
    return -c * xp.cos(u) + floorH / 2 - 0.5


def y_u_solve_x(y, u, floorW=1024, floorH=512):
    """Given a wall plane y=const and a ray longitude u, solve plan-x.

    Ref: misc/post_proc.py:48-50 (np_y_u_solve_x).
    """
    xp = _xp(y, u)
    c = -(y - floorH / 2 + 0.5) / xp.cos(u)
    return c * xp.sin(u) + floorW / 2 - 0.5


def get_z1(coory0, coory1, z0=50, coorH=512):
    """Height of the second plane given rows of both boundaries and z0.

    Ref: misc/post_proc.py:101-106.
    """
    xp = _xp(coory0, coory1)
    v0 = coory2v_up(xp.asarray(coory0), coorH)
    v1 = coory2v_up(xp.asarray(coory1), coorH)
    c0 = z0 / xp.tan(v0)
    return c0 * xp.tan(v1)


def infer_coory(coory0, h, z0=50, coorH=512):
    """Row of the plane at z0+h implied by the boundary rows on plane z0.

    Ref: misc/post_proc.py:126-131.
    """
    xp = _xp(coory0)
    v0 = coory2v_up(xp.asarray(coory0), coorH)
    c0 = z0 / xp.tan(v0)
    v1 = xp.arctan2(z0 + h, c0)
    return (-v1 / PI + 0.5) * coorH - 0.5


def mean_percentile(vec, p1=25, p2=75, axis=None):
    """Robust mean of the inter-percentile band. Ref: misc/post_proc.py:69-72.

    axis=None reduces the whole array (host parity path); an int axis
    gives the batched jnp form used by the fused device postprocess.
    """
    xp = _xp(vec)
    if xp is np:
        assert axis is None, "axis batching is a jnp-path feature"
        vmin = np.percentile(vec, p1)
        vmax = np.percentile(vec, p2)
        return vec[(vmin <= vec) & (vec <= vmax)].mean()
    # jnp path: masked mean (static shape)
    keep = axis is not None
    vmin = xp.percentile(vec, p1, axis=axis, keepdims=keep)
    vmax = xp.percentile(vec, p2, axis=axis, keepdims=keep)
    mask = (vmin <= vec) & (vec <= vmax)
    return (xp.sum(xp.where(mask, vec, 0.0), axis)
            / xp.maximum(xp.sum(mask, axis), 1))


def refine_by_fix_z(coory0, coory1, z0=50, coorH=512):
    """Refine the second boundary assuming the first lies on plane z0.

    Returns (refined coory1, robust z1). Ref: misc/post_proc.py:109-123.
    """
    xp = _xp(coory0, coory1)
    v0 = coory2v_up(xp.asarray(coory0), coorH)
    v1 = coory2v_up(xp.asarray(coory1), coorH)
    c0 = z0 / xp.tan(v0)
    z1 = c0 * xp.tan(v1)
    z1_mean = mean_percentile(z1)
    v1_refine = xp.arctan2(z1_mean, c0)
    coory1_refine = (-v1_refine / PI + 0.5) * coorH - 0.5
    return coory1_refine, z1_mean


def uv_meshgrid(w, h, xp=np):
    """Per-pixel (u, down-positive v) grid. Ref: misc/panostretch.py:6-11."""
    us = coorx2u(xp.arange(w, dtype=xp.float64 if xp is np else xp.float32), w)
    vs = coory2v(xp.arange(h, dtype=xp.float64 if xp is np else xp.float32), h)
    return xp.broadcast_to(us[None, :], (h, w)), xp.broadcast_to(vs[:, None], (h, w))
