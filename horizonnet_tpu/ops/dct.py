"""Compressed DCT ingest: JPEG-like wire format decoded on device.

The serving bottleneck on bandwidth-constrained hosts is ingest bytes
(see README "Serving"): yuv420 planes cost 0.75 MB per 512x1024 pano.
This format ships quantized zonal DCT coefficients instead — the form a
JPEG/video decoder's entropy stage naturally produces — and the device
performs dequantization, the partial inverse DCT (two small matmuls per
8x8 block, batched over all blocks: pure MXU work), chroma upsampling
and the YCbCr->RGB transform inside the compiled serving program.

Wire layout: ONE int8 array ``[B, NB, k, k]`` where the first H/8*W/8
blocks are the luma plane's 8x8 tiles in row-major order and the
remaining 2 * H/16*W/16 are the 2x2-subsampled Cb then Cr tiles. Each
tile keeps only the top-left ``k x k`` (low-frequency) zone of its 8x8
DCT, quantized by the JPEG standard tables at the chosen quality. Bytes
per 512x1024 pano: k=4 -> 192 KiB (3.9x less than yuv420), k=5 ->
300 KiB, k=6 -> 432 KiB.

The zonal (fixed-k) truncation is what makes the format device-friendly:
static shapes, no entropy coding on the wire, and the IDCT collapses to
``X = C_k^T F C_k`` with a [k, 8] basis — one einsum over [B*NB, k, k].
In a real deployment the client (or the serving host's entropy decoder)
produces these coefficients straight from the JPEG bitstream; here
``pack_dct`` builds them from raw RGB, playing the client's role like
``pack_yuv420`` does (ops/yuv.py).

Color transform: identical fixed-point BT.601 full-range pair as
ops/yuv.py, so dct and yuv420 ingest share the same color contract.
"""

import functools

import numpy as np
import jax.numpy as jnp

# JPEG Annex K quantization tables (quality 50), top-left 8x8
_JPEG_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.float64)
_JPEG_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], np.float64)


@functools.lru_cache(maxsize=None)
def _dct_basis(k):
    """Orthonormal DCT-II basis rows 0..k-1: C[u, x], shape [k, 8]."""
    x = np.arange(8)
    u = np.arange(k)[:, None]
    c = np.cos((2 * x[None, :] + 1) * u * np.pi / 16)
    c *= np.where(u == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))
    return c


@functools.lru_cache(maxsize=None)
def _quant_steps(k, quality):
    """(luma [k,k], chroma [k,k]) step tables at a JPEG quality factor.

    Standard IJG scaling; the DC step is floored at 8 so the orthonormal
    DC range (+-1024 around the -128-centered block) always fits int8 —
    a saturated DC would clamp whole blocks.
    """
    assert 1 <= quality <= 100
    s = 5000 / quality if quality < 50 else 200 - 2 * quality
    out = []
    for table in (_JPEG_LUMA, _JPEG_CHROMA):
        steps = np.floor((table[:k, :k] * s + 50) / 100)
        steps = np.maximum(steps, 1.0)
        steps[0, 0] = max(steps[0, 0], 8.0)
        out.append(steps)
    return tuple(out)


def dct_wire_shape(B, H, W, k):
    """Shape of the packed int8 wire array for a [B, H, W, 3] batch."""
    assert H % 16 == 0 and W % 16 == 0
    nb = (H // 8) * (W // 8) + 2 * (H // 16) * (W // 16)
    return (B, nb, k, k)


def _blockify(plane):
    """[B, H, W] -> [B, H/8*W/8, 8, 8] row-major tiles (numpy)."""
    B, H, W = plane.shape
    t = plane.reshape(B, H // 8, 8, W // 8, 8)
    return t.transpose(0, 1, 3, 2, 4).reshape(B, -1, 8, 8)


def pack_dct(rgb, k=4, quality=87):
    """Host/client: RGB uint8 [B, H, W, 3] -> int8 [B, NB, k, k].

    Forward color transform is the exact fixed-point pair of
    ops/yuv.py pack_yuv420; the DCT runs per 8x8 tile with the block
    centered at -128 and quantizes the k x k zone by the JPEG tables.
    """
    rgb = np.asarray(rgb)
    assert rgb.dtype == np.uint8 and rgb.ndim == 4 and rgb.shape[-1] == 3
    B, H, W, _ = rgb.shape
    assert H % 16 == 0 and W % 16 == 0
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    y = (77 * r + 150 * g + 29 * b + 128) >> 8
    cb = 128 + (((b - y) * 144 + 128) >> 8)
    cr = 128 + (((r - y) * 183 + 128) >> 8)
    # 2x2 box-mean chroma subsample (same as pack_yuv420)
    cb = np.clip((cb[:, 0::2, 0::2] + cb[:, 0::2, 1::2]
                  + cb[:, 1::2, 0::2] + cb[:, 1::2, 1::2] + 2) >> 2, 0, 255)
    cr = np.clip((cr[:, 0::2, 0::2] + cr[:, 0::2, 1::2]
                  + cr[:, 1::2, 0::2] + cr[:, 1::2, 1::2] + 2) >> 2, 0, 255)

    C = _dct_basis(k).astype(np.float32)
    luma_q, chroma_q = _quant_steps(k, quality)
    out = []
    for plane, steps in ((y, luma_q), (cb, chroma_q), (cr, chroma_q)):
        # f32 is plenty: the quantization step (>= 1, DC >= 8) dwarfs the
        # ~1e-3 f32 rounding of an 8x8 DCT, and it packs ~2x faster on
        # the serving host
        blocks = _blockify(plane.astype(np.float32) - 128.0)
        coefs = np.einsum("ux,bnxy,vy->bnuv", C, blocks, C,
                          optimize=True)
        q = np.rint(coefs / steps.astype(np.float32))
        out.append(np.clip(q, -128, 127))
    return np.concatenate(out, axis=1).astype(np.int8)


def unpack_dct_to_rgb(packed, H=512, W=1024, k=4, quality=87):
    """Device: int8 [B, NB, k, k] -> RGB float32 [B, H, W, 3] in [0, 1].

    Dequant + partial IDCT (X = C_k^T F C_k) + tile reassembly + nearest
    chroma upsample + the inverse fixed-point color transform of
    ops/yuv.py unpack_yuv420_to_rgb.
    """
    B, nb, kk, _ = packed.shape
    assert (kk == k and nb == dct_wire_shape(B, H, W, k)[1]), (
        packed.shape, (H, W, k))
    n_y = (H // 8) * (W // 8)
    n_c = (H // 16) * (W // 16)
    C = jnp.asarray(_dct_basis(k), jnp.float32)
    luma_q, chroma_q = _quant_steps(k, quality)
    steps = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(luma_q, jnp.float32), (n_y, k, k)),
        jnp.broadcast_to(jnp.asarray(chroma_q, jnp.float32),
                         (2 * n_c, k, k))], axis=0)

    coefs = packed.astype(jnp.float32) * steps[None]
    blocks = jnp.einsum("ux,bnuv,vy->bnxy", C, coefs, C,
                        preferred_element_type=jnp.float32) + 128.0

    def assemble(tiles, h, w):
        t = tiles.reshape(B, h // 8, w // 8, 8, 8)
        return t.transpose(0, 1, 3, 2, 4).reshape(B, h, w)

    y = assemble(blocks[:, :n_y], H, W)
    cb = assemble(blocks[:, n_y:n_y + n_c], H // 2, W // 2)
    cr = assemble(blocks[:, n_y + n_c:], H // 2, W // 2)
    cb = jnp.repeat(jnp.repeat(cb, 2, -2), 2, -1) - 128.0
    cr = jnp.repeat(jnp.repeat(cr, 2, -2), 2, -1) - 128.0

    r = y + cr * (256.0 / 183.0)
    b = y + cb * (256.0 / 144.0)
    g = (y - (77.0 / 256.0) * r - (29.0 / 256.0) * b) * (256.0 / 150.0)
    rgb = jnp.stack([r, g, b], -1)
    return jnp.clip(rgb / 255.0, 0.0, 1.0)
