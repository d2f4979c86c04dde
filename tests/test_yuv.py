"""YUV 4:2:0 ingest: round-trip fidelity + serving-path equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from horizonnet_tpu.ops.yuv import pack_yuv420, unpack_yuv420_to_rgb


def _smooth_image(rng, B=1, H=64, W=128):
    """Low-frequency sinusoidal field (chroma subsampling is benign)."""
    ys, xs = np.mgrid[0:H, 0:W]
    img = np.empty((B, H, W, 3))
    for b in range(B):
        for c in range(3):
            fx, fy = rng.uniform(0.25, 1, 2)
            ph = rng.uniform(0, 2 * np.pi)
            img[b, ..., c] = 127 + 100 * np.sin(
                2 * np.pi * (fx * xs / W + fy * ys / H) + ph)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_pack_unpack_roundtrip_quality():
    rng = np.random.default_rng(0)
    img = _smooth_image(rng)
    packed = pack_yuv420(img)
    assert packed.shape == (1, 6, 32, 64) and packed.dtype == np.uint8
    assert packed.nbytes * 2 == img.nbytes
    rec = np.asarray(unpack_yuv420_to_rgb(jnp.asarray(packed))) * 255.0
    err = np.abs(rec - img.astype(np.float64))
    # Smooth content: fixed-point + subsampling error stays within a few
    # gray levels
    assert err.mean() < 2.5, err.mean()
    psnr = 10 * np.log10(255.0 ** 2 / np.mean(err ** 2))
    assert psnr > 32, psnr


def test_y_plane_exact_on_gray():
    """Gray inputs (R=G=B) have zero chroma; Y must reconstruct exactly
    (to the fixed-point rounding of the luma weights)."""
    g = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
    img = np.tile(g, (1, 1, 1, 3))
    packed = pack_yuv420(img)
    assert (packed[:, 4:] == 128).all()  # zero chroma
    rec = np.asarray(unpack_yuv420_to_rgb(jnp.asarray(packed))) * 255.0
    assert np.abs(rec - img).max() < 1.5


def test_engine_yuv420_matches_float_path():
    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.registry import init_model
    from horizonnet_tpu.inference import InferenceEngine

    model = build_model("resnet18", use_rnn=True)
    variables = init_model(model, jax.random.PRNGKey(0), (1, 64, 128, 3))
    variables = jax.tree.map(np.asarray, variables)
    rng = np.random.default_rng(1)
    img = _smooth_image(rng, B=2)

    engf = InferenceEngine(model, variables, batch_size=2, H=64, W=128)
    engy = InferenceEngine(model, variables, batch_size=2, H=64, W=128,
                           input_format="yuv420")
    bon_f, cor_f = engf(img.astype(np.float32) / 255.0)
    bon_y, cor_y = engy(pack_yuv420(img))
    # The ingest format must not meaningfully move the raw outputs
    assert np.abs(np.asarray(bon_y) - np.asarray(bon_f)).max() < 0.02
    assert np.abs(np.asarray(cor_y) - np.asarray(cor_f)).max() < 0.02
