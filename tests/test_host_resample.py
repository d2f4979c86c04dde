"""Host (numpy/C++) warp path == device warp path, and native == numpy.

The preprocess warps (26-view cut, VP-alignment rotation) have two
backends: the batched device gather (views/rotate device paths) and the
host twin (host_resample, default — the stages around them are host work
and on a thin host<->device link the transfers dominate). These tests pin
the two backends to each other and the C++ warp kernel (warp.cpp) to its
numpy fallback bit-for-bit.
"""

import numpy as np
import pytest

from horizonnet_tpu.preprocess import host_resample as hr
from horizonnet_tpu.preprocess.views import (VIEW_DIRECTIONS, cut_views,
                                             cut_views_gray,
                                             preprocess_backend)
from horizonnet_tpu.preprocess.rotate import (rotate_panorama,
                                              rotate_panorama_uint8)


def _rot(deg):
    a = np.radians(deg)
    return np.array([[np.cos(a), -np.sin(a), 0],
                     [np.sin(a), np.cos(a), 0],
                     [0, 0, 1]]) @ np.array([[1, 0, 0],
                                             [0, np.cos(a / 2),
                                              -np.sin(a / 2)],
                                             [0, np.sin(a / 2),
                                              np.cos(a / 2)]])


def test_backend_resolution():
    assert preprocess_backend() in ("host", "device")
    assert preprocess_backend("device") == "device"
    with pytest.raises(ValueError):
        preprocess_backend("tpu")


def test_cut_views_gray_host_matches_device():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 128, 3), np.uint8)
    gh = np.asarray(cut_views_gray(img, size=48, backend="host"),
                    np.float32)
    gd = np.asarray(cut_views_gray(img, size=48, backend="device"),
                    np.float32)
    assert gh.shape == (26, 48, 48)
    # device output is f16-quantized for the downlink; host keeps f32
    assert np.abs(gh - gd).max() < 0.15


def test_cut_views_rgb_host_matches_device():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (64, 128, 3))
    vh = np.asarray(cut_views(img, size=48, backend="host"))
    vd = np.asarray(cut_views(img, size=48, backend="device"))
    assert vh.shape == vd.shape == (26, 48, 48, 3)
    # identical math in f32; only trig ULP differences feed the lerp
    assert np.abs(vh - vd).max() < 0.2


def test_rotate_host_matches_device():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (64, 128, 3), np.uint8)
    R = _rot(33.0)
    fh = np.asarray(rotate_panorama(img.astype(np.float32), R=R,
                                    backend="host"))
    fd = np.asarray(rotate_panorama(img.astype(np.float32), R=R,
                                    backend="device"))
    # mean agreement; isolated pixels may pick a neighbouring tap when a
    # coordinate lands within trig ULP of a pixel boundary
    assert np.abs(fh - fd).mean() < 0.05
    uh = rotate_panorama_uint8(img, R=R, backend="host")
    ud = rotate_panorama_uint8(img, R=R, backend="device")
    assert uh.dtype == np.uint8
    assert (uh.astype(int) != ud.astype(int)).mean() < 0.01


def test_native_warp_matches_numpy_fallback_bitexact():
    rng = np.random.default_rng(3)
    H, W = 37, 53
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    py = rng.uniform(-5, H + 5, (200,)).astype(np.float32)
    px = rng.uniform(-5, W + 5, (200,)).astype(np.float32)
    native = hr._warp_f32(img, H, W, py, px)
    idx, wts = hr._bilinear_wrap_tables(py, px, H, W)
    fallback = hr._gather_mix(img.reshape(-1), idx, wts)
    if hr._warp() is None:
        pytest.skip("native warp unavailable (no g++)")
    np.testing.assert_array_equal(native, fallback)

    img3 = rng.integers(0, 256, (H, W, 3), np.uint8)
    nat = hr._warp_u8(img3, H, W, py, px)
    mix = hr._gather_mix(img3.reshape(H * W, 3).astype(np.float32),
                         idx, wts)
    ref = np.clip(np.floor(mix), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(nat, ref)


def test_rotate_host_identity_roundtrip():
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, (32, 64, 3)).astype(np.float32)
    out = rotate_panorama(img, R=np.eye(3), backend="host")
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_pipeline_runs_on_host_backend(monkeypatch):
    """pano_edge_detection end-to-end touches no device on the host path."""
    monkeypatch.setenv("HORIZONNET_PREPROCESS_BACKEND", "host")
    from horizonnet_tpu.preprocess import pano_edge_detection
    rng = np.random.default_rng(5)
    img = (rng.uniform(0, 1, (128, 256, 3)) * 255).astype(np.uint8)
    # structured content so LSD finds something: paint a few rectangles
    img[30:60, 40:140] = 230
    img[80:110, 160:220] = 10
    r = pano_edge_detection(img, view_size=64, want_pano_edge=False)
    assert r["lines"].shape[1] == 8
