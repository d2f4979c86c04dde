"""On-device batched augmentation: stretch + flip + roll + gamma as ONE kernel.

The reference runs scipy map_coordinates per channel per sample in DataLoader
workers (dataset.py:69-105, panostretch.py:99-102) — the known training
bottleneck (SURVEY.md §3.3). Here the three geometric augmentations compose
into a single warp field, so each output pixel costs one 4-tap gather + one
pow, batched over the full device batch under jit.

Composition (output -> source): roll by dx, then flip, then stretch:
  c1 = (j - dx) mod W ; c2 = W-1-c1 if flip ; (y, x) = stretch_grid(c2, i).

Labels (bon, y_cor, corners) are synthesized on host from the analytically
transformed corners (data/labels.py) — tiny 1D work.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.resample import bilinear_wrap_sample
from .labels import cor2xybound, stretched_corners


def _stretch_grid(H, W, kx, ky):
    """Source sampling grid of pano-stretch (ref panostretch.py:91-96).

    Returns (refy [H,W], refx [H,W]) source pixel coords.
    """
    us = ((jnp.arange(W) + 0.5) / W - 0.5) * (2 * jnp.pi)
    vs = ((jnp.arange(H) + 0.5) / H - 0.5) * jnp.pi
    sin_u, cos_u = jnp.sin(us), jnp.cos(us)
    tan_v = jnp.tan(vs)
    u0 = jnp.arctan2(sin_u * kx / ky, cos_u)                     # [W]
    ratio = jnp.sin(u0) / sin_u * ky                              # [W]
    v0 = jnp.arctan(tan_v[:, None] * ratio[None, :])              # [H,W]
    refx = (u0 / (2 * jnp.pi) + 0.5) * W - 0.5                    # [W]
    refy = (v0 / jnp.pi + 0.5) * H - 0.5                          # [H,W]
    return refy, jnp.broadcast_to(refx[None, :], (H, W))


def _augment_one(img, kx, ky, flip, dx, gamma_p):
    """img [H,W,3] float [0,1] or uint8; scalars kx,ky,gamma_p; flip; dx."""
    if img.dtype == jnp.uint8:
        # uint8 crosses the host->device link 4x cheaper; normalize here
        img = img.astype(jnp.float32) / 255.0
    H, W, _ = img.shape
    refy, refx = _stretch_grid(H, W, kx, ky)

    cols = jnp.arange(W)
    c1 = jnp.mod(cols - dx, W)
    c2 = jnp.where(flip, W - 1 - c1, c1)
    src_y = refy[:, c2]
    src_x = jnp.broadcast_to(refx[0, c2][None, :], (H, W))

    out = bilinear_wrap_sample(img, src_y, src_x)
    return jnp.power(jnp.clip(out, 0.0, 1.0), gamma_p)


@jax.jit
def batched_augment_images(imgs, kx, ky, flip, dx, gamma_p):
    """imgs [B,H,W,3] float [0,1] or uint8; per-sample param vectors [B]."""
    return jax.vmap(_augment_one)(imgs, kx, ky, flip, dx, gamma_p)


@functools.partial(jax.jit, static_argnums=(1, 2))
def batched_augment_images_dct(packed, H, W, kx, ky, flip, dx, gamma_p):
    """Compressed-wire variant: packed [B, wire] int8 (ops/dct.py).

    The dct decode (dequant + partial IDCT + color) and the augmentation
    warp fuse into ONE device program, so a training host on a slow link
    uploads ~11x fewer bytes than uint8 RGB (144 KiB vs 1.5 MB per
    512x1024 pano) — the input-bound rows of the README train table
    collapse to device-resident speed.
    """
    from ..ops.dct import unpack_dct_to_rgb

    imgs = unpack_dct_to_rgb(packed, H, W)
    return jax.vmap(_augment_one)(imgs, kx, ky, flip, dx, gamma_p)


@functools.partial(jax.jit, static_argnums=(1, 2))
def batched_augment_images_dct4(packed, H, W, kx, ky, flip, dx, gamma_p):
    """Block-floating-point nibble wire variant (ops/dct.py dct4):
    ~17x fewer upload bytes than uint8 RGB (88 KiB vs 1.5 MB per
    512x1024 pano); the nibble unpack + dequant + IDCT + color decode
    fuses into the same device program as the augmentation warp."""
    from ..ops.dct import unpack_dct4_to_rgb

    imgs = unpack_dct4_to_rgb(packed, H, W)
    return jax.vmap(_augment_one)(imgs, kx, ky, flip, dx, gamma_p)


def sample_aug_params(rng: np.random.Generator, cor, W,
                      flip=True, rotate=True, gamma=True, stretch=True,
                      max_stretch=2.0):
    """Sample one sample's augmentation parameters (host RNG).

    Stretch factors are clipped by the room extents exactly as the
    reference (dataset.py:70-82). Returns dict of python scalars.
    """
    kx = ky = 1.0
    if stretch:
        xmin, ymin, xmax, ymax = cor2xybound(cor, W)
        kx = rng.uniform(1.0, max_stretch)
        ky = rng.uniform(1.0, max_stretch)
        if rng.integers(2) == 0:
            kx = max(1 / kx, min(0.5 / xmin, 1.0))
        else:
            kx = min(kx, max(10.0 / xmax, 1.0))
        if rng.integers(2) == 0:
            ky = max(1 / ky, min(0.5 / ymin, 1.0))
        else:
            ky = min(ky, max(10.0 / ymax, 1.0))
    do_flip = bool(flip and rng.integers(2) == 0)
    dx = int(rng.integers(W)) if rotate else 0
    p = 1.0
    if gamma:
        p = rng.uniform(1, 2)
        if rng.integers(2) == 0:
            p = 1 / p
    return {"kx": kx, "ky": ky, "flip": do_flip, "dx": dx, "p": p}


def transform_corners(cor, params, W):
    """Apply the same aug to the corner list (host, analytic).

    Mirrors the reference's per-aug corner updates (dataset.py:82,91,98).
    """
    cor = np.asarray(cor, np.float64).copy()
    if params["kx"] != 1.0 or params["ky"] != 1.0:
        cor = stretched_corners(cor, params["kx"], params["ky"], W)
    if params["flip"]:
        cor[:, 0] = W - 1 - cor[:, 0]
    if params["dx"]:
        cor[:, 0] = (cor[:, 0] + params["dx"]) % W
    return cor


def augment_batch(imgs, cors, rng: np.random.Generator, H, W,
                  wire="uint8", **flags):
    """Full batched augmentation: device images + host labels.

    imgs: [B,H,W,3] float32/uint8; cors: list of (2N,2) corner arrays.
    wire: "uint8" uploads the raw pixels; "dct" packs the compressed
    zig-zag DCT wire format on host (ops/dct.py, lossy ~35 dB) and the
    device decodes it fused with the warp; "dct4" is the block-floating-
    point nibble wire (~17x fewer bytes than uint8) — for training hosts
    whose accelerator link is the bottleneck.
    Returns (aug_imgs [B,H,W,3] jax, aug_cors list, params list).
    """
    B = imgs.shape[0]
    ps = [sample_aug_params(rng, cors[b], W, **flags) for b in range(B)]
    kx = jnp.asarray([p["kx"] for p in ps], jnp.float32)
    ky = jnp.asarray([p["ky"] for p in ps], jnp.float32)
    flip = jnp.asarray([p["flip"] for p in ps], bool)
    dx = jnp.asarray([p["dx"] for p in ps], jnp.int32)
    gp = jnp.asarray([p["p"] for p in ps], jnp.float32)
    if wire in ("dct", "dct4"):
        from ..ops.dct import pack_dct, pack_dct4

        imgs = np.asarray(imgs)
        if imgs.dtype != np.uint8:
            imgs = np.clip(np.rint(imgs * 255.0), 0, 255).astype(np.uint8)
        if wire == "dct4":
            out = batched_augment_images_dct4(pack_dct4(imgs), H, W,
                                              kx, ky, flip, dx, gp)
        else:
            out = batched_augment_images_dct(pack_dct(imgs), H, W,
                                             kx, ky, flip, dx, gp)
    else:
        assert wire == "uint8", wire
        out = batched_augment_images(jnp.asarray(imgs), kx, ky, flip, dx, gp)
    aug_cors = [transform_corners(cors[b], ps[b], W) for b in range(B)]
    return out, aug_cors, ps
