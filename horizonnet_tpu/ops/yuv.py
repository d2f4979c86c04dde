"""YUV 4:2:0 ingest: host packing + on-device reconstruction.

Serving input format for bandwidth-constrained links: real pano sources
are JPEG/video, whose decoded form is YUV with 2x2-subsampled chroma —
shipping those planes to the device costs 0.75 MB per 512x1024 pano
(half of RGB uint8) and the device rebuilds RGB inside the compiled
program. Full-range BT.601 fixed-point forward (host), float inverse
(device); round-trip error is ~1-2/255 per channel plus chroma
subsampling, far below the model's input sensitivity (the corner outputs
match the RGB path to sub-pixel — tests/test_yuv.py).

Wire layout: one uint8 array [B, 6, H/2, W/2] — planes 0..3 are the four
polyphase components of Y (Y[0::2,0::2], Y[0::2,1::2], Y[1::2,0::2],
Y[1::2,1::2]), planes 4..5 are the subsampled Cb, Cr.
"""

import numpy as np
import jax.numpy as jnp


def pack_yuv420(rgb):
    """Host: RGB uint8 [B, H, W, 3] -> packed uint8 [B, 6, H/2, W/2].

    Fixed-point BT.601 full-range (integer-only: the pack sits on the
    serving hot path of a slow host).
    """
    rgb = np.asarray(rgb)
    assert rgb.dtype == np.uint8 and rgb.ndim == 4 and rgb.shape[-1] == 3
    B, H, W, _ = rgb.shape
    assert H % 2 == 0 and W % 2 == 0
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    y = (77 * r + 150 * g + 29 * b + 128) >> 8
    cb = 128 + (((b - y) * 144 + 128) >> 8)
    cr = 128 + (((r - y) * 183 + 128) >> 8)

    out = np.empty((B, 6, H // 2, W // 2), np.uint8)
    out[:, 0] = y[:, 0::2, 0::2]
    out[:, 1] = y[:, 0::2, 1::2]
    out[:, 2] = y[:, 1::2, 0::2]
    out[:, 3] = y[:, 1::2, 1::2]
    # Chroma: 2x2 box mean with rounding
    for k, c in ((4, cb), (5, cr)):
        out[:, k] = np.clip(
            (c[:, 0::2, 0::2] + c[:, 0::2, 1::2]
             + c[:, 1::2, 0::2] + c[:, 1::2, 1::2] + 2) >> 2, 0, 255)
    return out


def unpack_yuv420_to_rgb(packed):
    """Device: packed uint8 [B, 6, H/2, W/2] -> RGB float32 [B,H,W,3] in
    [0, 1]. Inverse of pack_yuv420 (nearest-neighbor chroma upsample)."""
    B, six, h2, w2 = packed.shape
    x = packed.astype(jnp.float32)
    # Pixel-shuffle the four Y phases back to full resolution
    t = jnp.stack([x[:, 0], x[:, 1], x[:, 2], x[:, 3]], -1)
    t = t.reshape(B, h2, w2, 2, 2)
    y = t.transpose(0, 1, 3, 2, 4).reshape(B, 2 * h2, 2 * w2)
    cb = jnp.repeat(jnp.repeat(x[:, 4], 2, -2), 2, -1) - 128.0
    cr = jnp.repeat(jnp.repeat(x[:, 5], 2, -2), 2, -1) - 128.0
    # Inverse of the fixed-point forward: 256/183, 256/144 and the
    # 77/150/29 luma weights (invert what the host actually applied,
    # not the textbook 1.402/1.772/0.299 constants)
    r = y + cr * (256.0 / 183.0)
    b = y + cb * (256.0 / 144.0)
    g = (y - (77.0 / 256.0) * r - (29.0 / 256.0) * b) * (256.0 / 150.0)
    rgb = jnp.stack([r, g, b], -1)
    return jnp.clip(rgb / 255.0, 0.0, 1.0)
