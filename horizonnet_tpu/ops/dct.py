"""Compressed DCT ingest: JPEG-like wire format decoded on device.

The serving bottleneck on bandwidth-constrained hosts is ingest bytes
(see README "Serving"): yuv420 planes cost 0.75 MB per 512x1024 pano.
This format ships quantized zonal DCT coefficients instead — the form a
JPEG/video decoder's entropy stage naturally produces — and the device
performs dequantization, the partial inverse DCT, chroma upsampling and
the YCbCr->RGB transform inside the compiled serving program.

Wire layout: ONE flat int8 array ``[B, NY*luma_m + 2*NC*chroma_m]``
(NY = H/8*W/8 luma tiles, NC = H/16*W/16 tiles per 2x2-subsampled
chroma plane, row-major). Each 8x8 tile keeps its first ``m``
coefficients in JPEG **zig-zag order** — the energy-compaction order —
quantized by the JPEG standard tables at the chosen quality. Luma and
chroma budgets are independent: room-layout geometry lives in luma
edges, so chroma tolerates a far smaller zone. Bytes per 512x1024 pano:
(luma_m=15, chroma_m=6) -> 144 KiB, (10, 4) -> 96 KiB; yuv420 is
768 KiB.

The zonal (fixed-m) truncation is what makes the format device-friendly:
static shapes, no entropy coding on the wire. Dequantization and the
partial IDCT collapse into ONE constant matmul per plane — coefficient j
contributes ``step_j * outer(C[u_j], C[v_j])`` to its 8x8 tile, so
``tiles = coefs @ M`` with ``M [m, 64]`` (pure MXU work batched over all
tiles). In a real deployment the client (or the serving host's entropy
decoder) produces these coefficients straight from the JPEG bitstream;
here ``pack_dct`` builds them from raw RGB, playing the client's role
like ``pack_yuv420`` does (ops/yuv.py).

Color transform: identical fixed-point BT.601 full-range pair as
ops/yuv.py, so dct and yuv420 ingest share the same color contract.
"""

import functools

import numpy as np
import jax.numpy as jnp

# JPEG Annex K quantization tables (quality 50), full 8x8
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

DEFAULT_LUMA_M = 15   # complete u+v<=4 anti-diagonal triangle
DEFAULT_CHROMA_M = 6  # u+v<=2 triangle
DEFAULT_QUALITY = 87


@functools.lru_cache(maxsize=None)
def zigzag_uv(m):
    """First ``m`` (u, v) positions of the JPEG zig-zag scan of an 8x8."""
    assert 1 <= m <= 64
    order = []
    for d in range(15):
        diag = [(d - v, v) for v in range(d + 1) if d - v < 8 and v < 8]
        # canonical JPEG scan: odd anti-diagonals run top-right->bottom-left
        # ((0,1) then (1,0)), even ones bottom-left->top-right
        order.extend(diag[::-1] if d % 2 else diag)
    uv = np.array(order[:m])
    return uv[:, 0], uv[:, 1]


@functools.lru_cache(maxsize=None)
def _dct_basis_full():
    """Orthonormal DCT-II basis C[u, x], shape [8, 8]."""
    x = np.arange(8)
    u = np.arange(8)[:, None]
    c = np.cos((2 * x[None, :] + 1) * u * np.pi / 16)
    c *= np.where(u == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))
    return c


@functools.lru_cache(maxsize=None)
def _quant_steps(m, quality, chroma):
    """[m] quantization steps along the zig-zag at a JPEG quality factor.

    Standard IJG scaling; the DC step is floored at 8 so the orthonormal
    DC range (+-1024 around the -128-centered block) always fits int8 —
    a saturated DC would clamp whole blocks.
    """
    assert 1 <= quality <= 100
    s = 5000 / quality if quality < 50 else 200 - 2 * quality
    table = _JPEG_CHROMA if chroma else _JPEG_LUMA
    u, v = zigzag_uv(m)
    steps = np.floor((table[u, v] * s + 50) / 100)
    steps = np.maximum(steps, 1.0)
    steps[0] = max(steps[0], 8.0)
    return steps


@functools.lru_cache(maxsize=None)
def _codec_matrices(m, quality, chroma):
    """(analysis [64, m], synthesis [m, 64]) with quantization folded in.

    Coefficient j is the projection of the (-128-centered) 8x8 tile onto
    ``outer(C[u_j], C[v_j])`` divided by its quantization step; synthesis
    is the transpose basis scaled back by the step. f32 is plenty: the
    step (>= 1, DC >= 8) dwarfs the ~1e-3 f32 rounding of an 8x8 DCT.
    """
    C = _dct_basis_full()
    u, v = zigzag_uv(m)
    basis = (C[u][:, :, None] * C[v][:, None, :]).reshape(m, 64)
    steps = _quant_steps(m, quality, chroma)
    ana = (basis / steps[:, None]).T.astype(np.float32)
    syn = (basis * steps[:, None]).astype(np.float32)
    return ana, syn


def dct_wire_shape(B, H, W, luma_m=DEFAULT_LUMA_M, chroma_m=DEFAULT_CHROMA_M):
    """Shape of the packed int8 wire array for a [B, H, W, 3] batch."""
    assert H % 16 == 0 and W % 16 == 0
    n_y = (H // 8) * (W // 8)
    n_c = (H // 16) * (W // 16)
    return (B, n_y * luma_m + 2 * n_c * chroma_m)


def _blockify(plane):
    """[B, H, W] -> [B, H/8*W/8, 64] row-major tiles (numpy)."""
    B, H, W = plane.shape
    t = plane.reshape(B, H // 8, 8, W // 8, 8)
    return t.transpose(0, 1, 3, 2, 4).reshape(B, -1, 64)


def _rgb_to_ycc420(rgb):
    """Host: RGB uint8 [B, H, W, 3] -> (y, cb, cr) planes, chroma 2x2
    box-subsampled.

    The single source of the wire color contract: the exact fixed-point
    BT.601 full-range pair of ops/yuv.py pack_yuv420, shared by pack_dct
    and pack_dct4 so the two wires cannot diverge.
    """
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    y = (77 * r + 150 * g + 29 * b + 128) >> 8
    cb = 128 + (((b - y) * 144 + 128) >> 8)
    cr = 128 + (((r - y) * 183 + 128) >> 8)
    cb = np.clip((cb[:, 0::2, 0::2] + cb[:, 0::2, 1::2]
                  + cb[:, 1::2, 0::2] + cb[:, 1::2, 1::2] + 2) >> 2, 0, 255)
    cr = np.clip((cr[:, 0::2, 0::2] + cr[:, 0::2, 1::2]
                  + cr[:, 1::2, 0::2] + cr[:, 1::2, 1::2] + 2) >> 2, 0, 255)
    return y, cb, cr


def pack_dct(rgb, luma_m=DEFAULT_LUMA_M, chroma_m=DEFAULT_CHROMA_M,
             quality=DEFAULT_QUALITY):
    """Host/client: RGB uint8 [B, H, W, 3] -> flat int8 wire array.

    Forward color transform is the exact fixed-point pair of
    ops/yuv.py pack_yuv420; each 8x8 tile (centered at -128) keeps its
    first ``m`` zig-zag DCT coefficients quantized by the JPEG tables.
    """
    rgb = np.asarray(rgb)
    assert rgb.dtype == np.uint8 and rgb.ndim == 4 and rgb.shape[-1] == 3
    B, H, W, _ = rgb.shape
    assert H % 16 == 0 and W % 16 == 0
    y, cb, cr = _rgb_to_ycc420(rgb)

    out = []
    for plane, m, chroma in ((y, luma_m, False), (cb, chroma_m, True),
                             (cr, chroma_m, True)):
        ana, _ = _codec_matrices(m, quality, chroma)
        blocks = _blockify(plane.astype(np.float32) - 128.0)
        q = np.rint(blocks.reshape(-1, 64) @ ana)
        out.append(np.clip(q, -128, 127).reshape(B, -1))
    return np.concatenate(out, axis=1).astype(np.int8)


def _synthesize(coefs, B, m, quality, chroma, h, w):
    """[B, n, m] float32 quantized-domain coefs -> [B, h, w] plane."""
    _, syn = _codec_matrices(m, quality, chroma)
    tiles = jnp.einsum("bnm,mp->bnp", coefs.astype(jnp.float32),
                       jnp.asarray(syn),
                       preferred_element_type=jnp.float32) + 128.0
    t = tiles.reshape(B, h // 8, w // 8, 8, 8)
    return t.transpose(0, 1, 3, 2, 4).reshape(B, h, w)


def _ycc_to_rgb(y, cb, cr):
    """Inverse of the fixed-point BT.601 pair used by pack_dct/pack_yuv420
    (chroma already upsampled and centered)."""
    r = y + cr * (256.0 / 183.0)
    b = y + cb * (256.0 / 144.0)
    g = (y - (77.0 / 256.0) * r - (29.0 / 256.0) * b) * (256.0 / 150.0)
    rgb = jnp.stack([r, g, b], -1)
    return jnp.clip(rgb / 255.0, 0.0, 1.0)


def unpack_dct_to_rgb(packed, H=512, W=1024, luma_m=DEFAULT_LUMA_M,
                      chroma_m=DEFAULT_CHROMA_M, quality=DEFAULT_QUALITY):
    """Device: flat int8 wire array -> RGB float32 [B, H, W, 3] in [0, 1].

    Dequant + partial IDCT as ONE [m, 64] matmul per plane + tile
    reassembly + nearest chroma upsample + the inverse fixed-point color
    transform of ops/yuv.py unpack_yuv420_to_rgb.
    """
    B = packed.shape[0]
    assert packed.shape == dct_wire_shape(B, H, W, luma_m, chroma_m), (
        packed.shape, (H, W, luma_m, chroma_m))
    n_y = (H // 8) * (W // 8)
    n_c = (H // 16) * (W // 16)

    def decode(coefs, n, m, chroma, h, w):
        return _synthesize(coefs.reshape(B, n, m), B, m, quality,
                           chroma, h, w)

    y_end = n_y * luma_m
    c_len = n_c * chroma_m
    y = decode(packed[:, :y_end], n_y, luma_m, False, H, W)
    cb = decode(packed[:, y_end:y_end + c_len], n_c, chroma_m, True,
                H // 2, W // 2)
    cr = decode(packed[:, y_end + c_len:], n_c, chroma_m, True,
                H // 2, W // 2)
    cb = jnp.repeat(jnp.repeat(cb, 2, -2), 2, -1) - 128.0
    cr = jnp.repeat(jnp.repeat(cr, 2, -2), 2, -1) - 128.0
    return _ycc_to_rgb(y, cb, cr)


# ---------------------------------------------------------------------------
# dct4: block-floating-point nibble wire (int8 DC + per-tile 4-bit shift +
# int4 AC mantissas)
#
# Measured on the demo panos, plain int4 AC clamps 1-10% of tiles — exactly
# the edge tiles room geometry lives in. Instead each tile stores its AC
# coefficients as 4-bit mantissas under ONE shared power-of-two exponent
# (0..7): smooth tiles (the vast majority; shift 0, |q| <= 7) decode
# BIT-IDENTICALLY to the int8 dct path, edge tiles trade AC precision for
# range like any block-adaptive quantizer. Bytes per tile: 1 (DC int8) +
# ceil(m/2) (m nibbles: shift + m-1 mantissas, zero-padded) — (15, 6)
# lands at 88 KiB/pano vs dct's 144, on a wire whose cost model is pure
# bytes (see docs/serving.md). Device decode is a handful of int8 shift
# ops fused ahead of the same synthesis matmul.


def dct4_wire_shape(B, H, W, luma_m=DEFAULT_LUMA_M,
                    chroma_m=DEFAULT_CHROMA_M):
    """Shape of the packed int8 dct4 wire array for a [B, H, W, 3] batch."""
    assert H % 16 == 0 and W % 16 == 0
    n_y = (H // 8) * (W // 8)
    n_c = (H // 16) * (W // 16)
    return (B, n_y * (1 + (luma_m + 1) // 2)
            + 2 * n_c * (1 + (chroma_m + 1) // 2))


def _bfp_pack_plane(q, m):
    """[Ntiles, m] unclipped quantized-domain coefs -> int8 tile bytes.

    Layout per tile: [DC int8][nibble pairs], nibble stream =
    (shift, mant_1 .. mant_{m-1}, 0-pad), low nibble first.
    """
    n = q.shape[0]
    dc = np.clip(np.rint(q[:, 0]), -128, 127)
    qac = q[:, 1:]
    ma = np.abs(qac).max(1) if m > 1 else np.zeros(n)
    with np.errstate(divide="ignore"):
        s = np.ceil(np.log2(np.maximum(ma, 1e-12) / 7.5)).astype(np.int64)
    s = np.clip(s, 0, 7)
    # rounding can still land a mantissa on 8; bump the exponent once
    bump = np.rint(ma / np.exp2(s)) > 7
    s[bump] = np.minimum(s[bump] + 1, 7)
    mant = np.clip(np.rint(qac / np.exp2(s)[:, None]), -7, 7)
    nib = np.concatenate([s[:, None], mant], 1)
    if nib.shape[1] % 2:
        nib = np.pad(nib, ((0, 0), (0, 1)))
    nibu = (nib.astype(np.int16) & 0xF).astype(np.uint8)
    packed = (nibu[:, 0::2] | (nibu[:, 1::2] << 4)).view(np.int8)
    dc8 = dc.astype(np.int8)[:, None]
    return np.concatenate([dc8, packed], 1).reshape(n, -1)


def pack_dct4(rgb, luma_m=DEFAULT_LUMA_M, chroma_m=DEFAULT_CHROMA_M,
              quality=DEFAULT_QUALITY):
    """Host/client: RGB uint8 [B, H, W, 3] -> flat int8 dct4 wire array.

    Same color transform / zig-zag / quantization as pack_dct; the AC
    coefficients of each tile are block-floating-point encoded (see
    module comment above dct4_wire_shape).
    """
    rgb = np.asarray(rgb)
    assert rgb.dtype == np.uint8 and rgb.ndim == 4 and rgb.shape[-1] == 3
    B, H, W, _ = rgb.shape
    assert H % 16 == 0 and W % 16 == 0
    y, cb, cr = _rgb_to_ycc420(rgb)

    out = []
    for plane, m, chroma in ((y, luma_m, False), (cb, chroma_m, True),
                             (cr, chroma_m, True)):
        ana, _ = _codec_matrices(m, quality, chroma)
        blocks = _blockify(plane.astype(np.float32) - 128.0)
        q = blocks.reshape(-1, 64) @ ana
        out.append(_bfp_pack_plane(q, m).reshape(B, -1))
    return np.concatenate(out, axis=1).astype(np.int8)


def unpack_dct4_to_rgb(packed, H=512, W=1024, luma_m=DEFAULT_LUMA_M,
                       chroma_m=DEFAULT_CHROMA_M, quality=DEFAULT_QUALITY):
    """Device: flat int8 dct4 wire array -> RGB float32 [B, H, W, 3].

    Nibble unpack + per-tile power-of-two dequant (pure int8/int32 shift
    arithmetic, fused by XLA ahead of the same synthesis matmul as
    unpack_dct_to_rgb)."""
    B = packed.shape[0]
    assert packed.shape == dct4_wire_shape(B, H, W, luma_m, chroma_m), (
        packed.shape, (H, W, luma_m, chroma_m))
    n_y = (H // 8) * (W // 8)
    n_c = (H // 16) * (W // 16)

    def decode(tiles_i8, n, m, chroma, h, w):
        tb = 1 + (m + 1) // 2
        t = tiles_i8.reshape(B, n, tb)
        dc = t[..., 0].astype(jnp.float32)
        nb = t[..., 1:]
        # int8 arithmetic shifts: lo nibble sign-extends via <<4 then >>4,
        # hi nibble via >>4
        lo = jnp.right_shift(jnp.left_shift(nb, 4), 4)
        hi = jnp.right_shift(nb, 4)
        nibs = jnp.stack([lo, hi], -1).reshape(B, n, 2 * (tb - 1))
        # encoder shifts are 0..7 by construction (_bfp_pack_plane clips),
        # so the sign-extended lo nibble is already the exponent
        shift = nibs[..., 0].astype(jnp.int32)                  # 0..7
        mant = nibs[..., 1:m].astype(jnp.float32)               # [B,n,m-1]
        scale = jnp.left_shift(jnp.int32(1), shift).astype(jnp.float32)
        coefs = jnp.concatenate([dc[..., None], mant * scale[..., None]],
                                -1)
        return _synthesize(coefs, B, m, quality, chroma, h, w)

    y_tb = 1 + (luma_m + 1) // 2
    c_tb = 1 + (chroma_m + 1) // 2
    y_end = n_y * y_tb
    c_len = n_c * c_tb
    y = decode(packed[:, :y_end], n_y, luma_m, False, H, W)
    cb = decode(packed[:, y_end:y_end + c_len], n_c, chroma_m, True,
                H // 2, W // 2)
    cr = decode(packed[:, y_end + c_len:], n_c, chroma_m, True,
                H // 2, W // 2)
    cb = jnp.repeat(jnp.repeat(cb, 2, -2), 2, -1) - 128.0
    cr = jnp.repeat(jnp.repeat(cr, 2, -2), 2, -1) - 128.0
    return _ycc_to_rgb(y, cb, cr)
