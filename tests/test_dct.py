"""Compressed DCT ingest: round-trip fidelity + serving-path equivalence.

The dct wire format (ops/dct.py) is lossy by design (zig-zag zonal
truncation + JPEG-table quantization); the contract is (a) the byte
budget — (luma_m=15, chroma_m=6) is 5.3x smaller than yuv420 — and
(b) reconstruction error small enough that model outputs and final
corners track the RGB path (pinned on the committed demo pano in
test_golden_ckpt.py and here on the raw reconstruction + a small-model
forward).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from horizonnet_tpu.ops.dct import (DEFAULT_CHROMA_M, DEFAULT_LUMA_M,
                                    DEFAULT_QUALITY, dct_wire_shape,
                                    pack_dct, unpack_dct_to_rgb, zigzag_uv)
from tests.test_yuv import _smooth_image


def test_zigzag_order():
    """First diagonals of the JPEG zig-zag: DC, then (0,1),(1,0), then
    (2,0),(1,1),(0,2) — the canonical scan from the JPEG spec."""
    u, v = zigzag_uv(10)
    got = list(zip(u.tolist(), v.tolist()))
    assert got == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2),
                   (0, 3), (1, 2), (2, 1), (3, 0)]


def test_wire_shape_and_bytes():
    B, H, W = 2, 512, 1024
    shape = dct_wire_shape(B, H, W)
    n_y, n_c = 8192, 2048
    assert shape == (2, n_y * DEFAULT_LUMA_M + 2 * n_c * DEFAULT_CHROMA_M)
    per_pano = shape[1]
    assert per_pano == 147456                     # 144 KiB
    yuv_bytes = 6 * (H // 2) * (W // 2)
    assert yuv_bytes / per_pano > 5.3             # 5.3x fewer bytes


def test_pack_unpack_roundtrip_quality():
    rng = np.random.default_rng(0)
    img = _smooth_image(rng, B=1, H=64, W=128)
    packed = pack_dct(img)
    assert packed.shape == dct_wire_shape(1, 64, 128)
    assert packed.dtype == np.int8
    rec = np.asarray(unpack_dct_to_rgb(jnp.asarray(packed), 64, 128)) * 255.0
    err = np.abs(rec - img.astype(np.float64))
    psnr = 10 * np.log10(255.0 ** 2 / np.mean(err ** 2))
    assert psnr > 30, psnr


def test_roundtrip_quality_on_demo_pano():
    """Real content: the committed reference demo pano at two budgets."""
    from PIL import Image

    img = np.asarray(Image.open(
        "/root/reference/assets/preprocessed/demo_aligned_rgb.png"))
    img = img[None, ..., :3]
    for (ym, cm), min_psnr in (((DEFAULT_LUMA_M, DEFAULT_CHROMA_M), 27.0),
                               ((10, 4), 25.0)):
        packed = pack_dct(img, luma_m=ym, chroma_m=cm)
        rec = np.asarray(unpack_dct_to_rgb(
            jnp.asarray(packed), 512, 1024, ym, cm)) * 255.0
        err = rec - img.astype(np.float64)
        psnr = 10 * np.log10(255.0 ** 2 / np.mean(err ** 2))
        assert psnr > min_psnr, (ym, cm, psnr)


def test_dc_saturation_guard():
    """Solid black/white blocks exercise the extreme DC; the floored DC
    step must keep int8 from clamping (a clamped DC shifts whole tiles)."""
    img = np.zeros((1, 32, 32, 3), np.uint8)
    img[:, :16] = 255
    packed = pack_dct(img, quality=95)
    rec = np.asarray(unpack_dct_to_rgb(jnp.asarray(packed), 32, 32,
                                       quality=95)) * 255.0
    assert abs(rec[0, :8].mean() - 255.0) < 6.0
    assert abs(rec[0, -8:].mean() - 0.0) < 6.0


@pytest.mark.heavy
def test_engine_dct_matches_float_path():
    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.registry import init_model
    from horizonnet_tpu.inference import InferenceEngine

    model = build_model("resnet18", use_rnn=True)
    variables = init_model(model, jax.random.PRNGKey(0), (1, 64, 128, 3))
    variables = jax.tree.map(np.asarray, variables)
    rng = np.random.default_rng(1)
    img = _smooth_image(rng, B=2)

    engf = InferenceEngine(model, variables, batch_size=2, H=64, W=128)
    engd = InferenceEngine(model, variables, batch_size=2, H=64, W=128,
                           input_format="dct")
    bon_f, cor_f = engf(img.astype(np.float32) / 255.0)
    bon_d, cor_d = engd(pack_dct(img))
    # Lossy ingest must not meaningfully move the raw outputs
    assert np.abs(np.asarray(bon_d) - np.asarray(bon_f)).max() < 0.05
    assert np.abs(np.asarray(cor_d) - np.asarray(cor_f)).max() < 0.05


def test_budget_monotonicity():
    """Spending more zig-zag coefficients must monotonically improve
    reconstruction on real content — the energy-compaction order is the
    point of the scan; a regression here means a scrambled layout."""
    from PIL import Image

    img = np.asarray(Image.open(
        "/root/reference/assets/preprocessed/demo_aligned_rgb.png"))
    img = img[None, ..., :3]

    def psnr(ym, cm):
        packed = pack_dct(img, luma_m=ym, chroma_m=cm)
        rec = np.asarray(unpack_dct_to_rgb(
            jnp.asarray(packed), 512, 1024, ym, cm)) * 255.0
        err = rec - img.astype(np.float64)
        return 10 * np.log10(255.0 ** 2 / np.mean(err ** 2))

    p = [psnr(6, 3), psnr(10, 4), psnr(15, 6), psnr(21, 10)]
    assert p == sorted(p), p


# ---------------------------------------------------------------------------
# dct4: block-floating-point nibble wire


def test_dct4_wire_shape_and_bytes():
    from horizonnet_tpu.ops.dct import dct4_wire_shape

    B, H, W = 2, 512, 1024
    shape = dct4_wire_shape(B, H, W)
    n_y, n_c = 8192, 2048
    # per tile: 1 DC byte + ceil(m/2) nibble-pair bytes
    assert shape == (2, n_y * 9 + 2 * n_c * 4)
    assert shape[1] == 90112                       # 88 KiB
    assert dct_wire_shape(B, H, W)[1] / shape[1] > 1.6


def test_dct4_smooth_tiles_match_dct_exactly():
    """Tiles whose AC coefficients fit int4 (shift 0) must decode
    BIT-IDENTICALLY to the int8 dct path — the BFP exponent only spends
    precision where int8 dct would have had headroom to spare."""
    from horizonnet_tpu.ops.dct import pack_dct4, unpack_dct4_to_rgb

    rng = np.random.default_rng(0)
    base = rng.uniform(90, 160, (1, 8, 16, 3))
    img = np.clip(np.kron(base, np.ones((1, 16, 16, 1))), 0,
                  255).astype(np.uint8)[:, :128, :256]
    a = np.asarray(unpack_dct_to_rgb(jnp.asarray(pack_dct(img)), 128, 256))
    b = np.asarray(unpack_dct4_to_rgb(jnp.asarray(pack_dct4(img)),
                                      128, 256))
    assert np.array_equal(a, b)


def test_dct4_roundtrip_quality_on_demo_pano():
    """Real content: dct4 must stay within ~1.5 dB of the int8 dct path
    at the same (15, 6) budget while spending 1.6x fewer bytes."""
    from PIL import Image

    from horizonnet_tpu.ops.dct import pack_dct4, unpack_dct4_to_rgb

    img = np.asarray(Image.open(
        "/root/reference/assets/preprocessed/demo_aligned_rgb.png"))
    img = img[None, ..., :3]

    def psnr(rec):
        err = rec - img.astype(np.float64)
        return 10 * np.log10(255.0 ** 2 / np.mean(err ** 2))

    p8 = psnr(np.asarray(unpack_dct_to_rgb(
        jnp.asarray(pack_dct(img)), 512, 1024)) * 255.0)
    p4 = psnr(np.asarray(unpack_dct4_to_rgb(
        jnp.asarray(pack_dct4(img)), 512, 1024)) * 255.0)
    assert p4 > 30.0, p4
    assert p8 - p4 < 1.5, (p8, p4)


def test_dct4_edge_tile_range():
    """A solid black/white step exercises the largest AC coefficients;
    the per-tile exponent must carry them without int4 clamping damage."""
    from horizonnet_tpu.ops.dct import pack_dct4, unpack_dct4_to_rgb

    img = np.zeros((1, 32, 32, 3), np.uint8)
    img[:, :, 16:] = 255
    rec = np.asarray(unpack_dct4_to_rgb(jnp.asarray(pack_dct4(img)),
                                        32, 32)) * 255.0
    assert abs(rec[0, :, :8].mean() - 0.0) < 16.0
    assert abs(rec[0, :, -8:].mean() - 255.0) < 16.0


@pytest.mark.heavy
def test_engine_dct4_matches_float_path():
    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.registry import init_model
    from horizonnet_tpu.inference import InferenceEngine
    from horizonnet_tpu.ops.dct import pack_dct4

    model = build_model("resnet18", use_rnn=True)
    variables = init_model(model, jax.random.PRNGKey(0), (1, 64, 128, 3))
    variables = jax.tree.map(np.asarray, variables)
    rng = np.random.default_rng(1)
    img = _smooth_image(rng, B=2)

    engf = InferenceEngine(model, variables, batch_size=2, H=64, W=128)
    engd = InferenceEngine(model, variables, batch_size=2, H=64, W=128,
                           input_format="dct4")
    bon_f, cor_f = engf(img.astype(np.float32) / 255.0)
    bon_d, cor_d = engd(pack_dct4(img))
    assert np.abs(np.asarray(bon_d) - np.asarray(bon_f)).max() < 0.05
    assert np.abs(np.asarray(cor_d) - np.asarray(cor_f)).max() < 0.05
