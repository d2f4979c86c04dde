"""Compressed DCT ingest: round-trip fidelity + serving-path equivalence.

The dct wire format (ops/dct.py) is lossy by design (zonal truncation +
JPEG-table quantization); the contract is (a) the byte budget — k=4 is
3.9x smaller than yuv420 — and (b) reconstruction error small enough
that model outputs and final corners track the RGB path (pinned on the
committed demo pano in test_cli.py's golden flow and here on the raw
reconstruction + a small-model forward).
"""

import numpy as np
import jax
import jax.numpy as jnp

from horizonnet_tpu.ops.dct import (pack_dct, unpack_dct_to_rgb,
                                    dct_wire_shape)
from tests.test_yuv import _smooth_image


def test_wire_shape_and_bytes():
    B, H, W = 2, 512, 1024
    shape = dct_wire_shape(B, H, W, 4)
    assert shape == (2, 8192 + 2 * 2048, 4, 4)
    per_pano = np.prod(shape[1:])
    assert per_pano == 196608                     # 192 KiB
    yuv_bytes = 6 * (H // 2) * (W // 2)
    assert yuv_bytes / per_pano == 4.0            # 4x fewer bytes


def test_pack_unpack_roundtrip_quality():
    rng = np.random.default_rng(0)
    img = _smooth_image(rng, B=1, H=64, W=128)
    packed = pack_dct(img, k=4, quality=87)
    assert packed.shape == dct_wire_shape(1, 64, 128, 4)
    assert packed.dtype == np.int8
    rec = np.asarray(unpack_dct_to_rgb(jnp.asarray(packed), 64, 128,
                                       4, 87)) * 255.0
    err = np.abs(rec - img.astype(np.float64))
    psnr = 10 * np.log10(255.0 ** 2 / np.mean(err ** 2))
    assert psnr > 30, psnr


def test_roundtrip_quality_on_demo_pano():
    """Real content: the committed reference demo pano at k=4 and k=5."""
    from PIL import Image

    img = np.asarray(Image.open(
        "/root/reference/assets/preprocessed/demo_aligned_rgb.png"))
    img = img[None, ..., :3]
    for k, min_psnr in ((4, 27.0), (5, 29.0)):
        packed = pack_dct(img, k=k, quality=87)
        rec = np.asarray(unpack_dct_to_rgb(
            jnp.asarray(packed), 512, 1024, k, 87)) * 255.0
        err = rec - img.astype(np.float64)
        psnr = 10 * np.log10(255.0 ** 2 / np.mean(err ** 2))
        assert psnr > min_psnr, (k, psnr)


def test_dc_saturation_guard():
    """Solid black/white blocks exercise the extreme DC; the floored DC
    step must keep int8 from clamping (a clamped DC shifts whole tiles)."""
    img = np.zeros((1, 32, 32, 3), np.uint8)
    img[:, :16] = 255
    packed = pack_dct(img, k=4, quality=95)
    rec = np.asarray(unpack_dct_to_rgb(jnp.asarray(packed), 32, 32,
                                       4, 95)) * 255.0
    assert abs(rec[0, :8].mean() - 255.0) < 6.0
    assert abs(rec[0, -8:].mean() - 0.0) < 6.0


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
                           input_format="dct", dct_k=4, dct_quality=87)
    bon_f, cor_f = engf(img.astype(np.float32) / 255.0)
    bon_d, cor_d = engd(pack_dct(img, k=4, quality=87))
    # Lossy ingest must not meaningfully move the raw outputs
    assert np.abs(np.asarray(bon_d) - np.asarray(bon_f)).max() < 0.05
    assert np.abs(np.asarray(cor_d) - np.asarray(cor_f)).max() < 0.05
