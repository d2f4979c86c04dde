"""Data-pipeline tests: fused device augmentation vs a scipy re-derivation,
corner transforms, heatmap and occlusion labels.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from horizonnet_tpu.data import (
    corner_heatmap, find_occlusion, batched_augment_images, stretched_corners,
)
from horizonnet_tpu.data.augment import _stretch_grid, transform_corners


def _scipy_stretch(img, kx, ky):
    """Reference-math stretch via scipy (grid-wrap), independent re-derivation
    of panostretch.py:89-102."""
    from scipy.ndimage import map_coordinates
    H, W = img.shape[:2]
    us = ((np.arange(W) + 0.5) / W - 0.5) * 2 * np.pi
    vs = ((np.arange(H) + 0.5) / H - 0.5) * np.pi
    sin_u, cos_u = np.sin(us), np.cos(us)
    u0 = np.arctan2(sin_u * kx / ky, cos_u)
    v0 = np.arctan(np.tan(vs)[:, None] * (np.sin(u0) / sin_u * ky)[None, :])
    refx = np.broadcast_to(((u0 / (2 * np.pi) + 0.5) * W - 0.5)[None, :], (H, W))
    refy = (v0 / np.pi + 0.5) * H - 0.5
    return np.stack([
        map_coordinates(img[..., c], [refy, refx], order=1, mode='grid-wrap')
        for c in range(img.shape[-1])], axis=-1)


def test_fused_augment_matches_scipy_composition():
    rng = np.random.default_rng(0)
    H, W = 64, 128
    img = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    kx, ky, dx, p = 1.4, 0.8, 37, 1.7

    ref = _scipy_stretch(img, kx, ky)
    ref = np.flip(ref, axis=1)          # flip
    ref = np.roll(ref, dx, axis=1)      # rotate
    ref = np.clip(ref, 0, 1) ** p       # gamma

    got = np.array(batched_augment_images(
        jnp.asarray(img[None]),
        jnp.asarray([kx], jnp.float32), jnp.asarray([ky], jnp.float32),
        jnp.asarray([True]), jnp.asarray([dx], jnp.int32),
        jnp.asarray([p], jnp.float32)))[0]
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_identity_augment_is_identity():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (32, 64, 3)).astype(np.float32)
    got = np.array(batched_augment_images(
        jnp.asarray(img[None]),
        jnp.ones(1, jnp.float32), jnp.ones(1, jnp.float32),
        jnp.zeros(1, bool), jnp.zeros(1, jnp.int32), jnp.ones(1, jnp.float32)))[0]
    np.testing.assert_allclose(got, img, atol=1e-5)


def test_stretch_corner_transform_inverse():
    """Stretch by (kx, ky) then (1/kx, 1/ky) returns the original corners."""
    cor = np.array([[100.0, 120.0], [100.0, 400.0], [500.0, 130.0],
                    [500.0, 390.0]])
    once = stretched_corners(cor, 1.5, 0.7)
    back = stretched_corners(once, 1 / 1.5, 1 / 0.7)
    np.testing.assert_allclose(back, cor, atol=1e-8)


def test_transform_corners_flip_roll():
    cor = np.array([[10.0, 100.0], [10.0, 400.0]])
    p = {"kx": 1.0, "ky": 1.0, "flip": True, "dx": 5, "p": 1.0}
    got = transform_corners(cor, p, 1024)
    np.testing.assert_allclose(got[:, 0], [(1023 - 10 + 5) % 1024] * 2)


def test_corner_heatmap_circular():
    hm = corner_heatmap(np.array([0.0]), 8, p_base=0.5)
    np.testing.assert_allclose(hm, [1, .5, .25, .125, .0625, .125, .25, .5])


def test_find_occlusion_square_room():
    """Convex room: no corner is occluded."""
    from horizonnet_tpu.geometry import xy2coor
    pts = np.array([[502, 250], [522, 250], [522, 262], [502, 262]], float) - 0.5
    cor = xy2coor(pts, -50, 1024, 512)
    # xy2coor with negative z gives ceiling rows (v>0 up); use as ceiling ring
    occ = find_occlusion(cor)
    assert not occ.any()


@pytest.mark.parametrize("wire", ["dct", "dct4"])
def test_dct_wire_augment_matches_uint8_wire(wire):
    """--wire dct/dct4: the fused decode+warp program must track the
    uint8 path within the wire format's lossy budget (~35 dB -> a few
    /255; dct4's block-floating-point AC adds a little on edge tiles)."""
    from horizonnet_tpu.data.augment import augment_batch
    from tests.test_yuv import _smooth_image

    rng_img = np.random.default_rng(3)
    imgs = _smooth_image(rng_img, B=2, H=64, W=128)
    cors = [np.array([[10.0, 20.0], [10.0, 44.0],
                      [70.0, 18.0], [70.0, 46.0]])] * 2

    out_u8, cors_u8, _ = augment_batch(
        imgs, cors, np.random.default_rng(7), 64, 128,
        flip=True, rotate=True, gamma=True, stretch=True)
    out_dct, cors_dct, _ = augment_batch(
        imgs, cors, np.random.default_rng(7), 64, 128, wire=wire,
        flip=True, rotate=True, gamma=True, stretch=True)

    # identical host RNG stream -> identical aug params -> identical labels
    for a, b in zip(cors_u8, cors_dct):
        np.testing.assert_array_equal(a, b)
    err = np.abs(np.asarray(out_dct) - np.asarray(out_u8))
    assert err.max() < 0.12 and err.mean() < 0.01, (err.max(), err.mean())


def test_dct4_wire_train_step_equivalence():
    """A train step fed by the dct4 wire must match the uint8-wire step:
    same aug params/labels, loss terms within the wire's lossy budget,
    and the two updated parameter trees stay close (the wire changes
    ingest bytes, not training semantics)."""
    import jax
    import jax.numpy as jnp
    from horizonnet_tpu.data.augment import augment_batch
    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.registry import init_model
    from horizonnet_tpu.train import create_train_state, train_step, \
        warmup_poly_schedule
    from horizonnet_tpu.train.step import make_optimizer
    from tests.test_yuv import _smooth_image

    H, W = 64, 128
    imgs = _smooth_image(np.random.default_rng(3), B=2, H=H, W=W)
    cors = [np.array([[10.0, 20.0], [10.0, 44.0],
                      [70.0, 18.0], [70.0, 46.0]])] * 2
    outs = {}
    for wire in ("uint8", "dct4"):
        x, _, _ = augment_batch(imgs, cors, np.random.default_rng(7),
                                H, W, wire=wire, flip=True, rotate=True,
                                gamma=True, stretch=True)
        outs[wire] = np.asarray(x)

    model = build_model("resnet18", use_rnn=False)
    variables = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    # host snapshot: train_step donates its state, and jnp.asarray on a
    # device array is a no-op — without this the second wire's state
    # would alias the first step's donated (deleted) buffers
    variables = jax.tree.map(np.asarray, variables)
    rng = np.random.default_rng(0)
    yb = jnp.asarray(rng.normal(0, 0.3, (2, 2, W)), jnp.float32)
    yc = jnp.asarray(rng.uniform(0, 1, (2, 1, W)), jnp.float32)

    stepped = {}
    for wire, x in outs.items():
        tx = make_optimizer("Adam", warmup_poly_schedule(1e-3, 100))
        state = create_train_state(
            model, jax.tree.map(jnp.asarray, variables), tx)
        new_state, metrics = train_step(model, state, jnp.asarray(x),
                                        yb, yc, jax.random.PRNGKey(1))
        stepped[wire] = (jax.tree.map(np.asarray, new_state.params),
                         {k: float(v) for k, v in metrics.items()})

    m_u8, m_d4 = stepped["uint8"][1], stepped["dct4"][1]
    assert m_d4["total"] == pytest.approx(m_u8["total"], rel=0.02)
    leaves_u8 = jax.tree.leaves(stepped["uint8"][0])
    leaves_d4 = jax.tree.leaves(stepped["dct4"][0])
    for a, b in zip(leaves_u8, leaves_d4):
        np.testing.assert_allclose(a, b, atol=5e-3)
