"""Preprocess tests: sphere conventions, views, LSD, Hough, golden VP."""

import os

import numpy as np
import pytest

from horizonnet_tpu.preprocess.sphere import (
    xyz2uvN, uv2xyzN, computeUVN, computeUVN_vec, icosahedron2sphere,
    fit_plane_normal,
)
from horizonnet_tpu.preprocess.views import cut_views, VIEW_DIRECTIONS, rgb_to_gray
from horizonnet_tpu.preprocess.lines import (
    lift_segments_to_sphere, segments_to_lines, _range_intersects,
    _inside_range,
)
from horizonnet_tpu.preprocess.vanishing import sphere_hough_vote


def test_uv_xyz_roundtrip_all_planes():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(50, 3))
    xyz /= np.linalg.norm(xyz, axis=1, keepdims=True)
    for p in (1, 2, 3):
        uv = xyz2uvN(xyz, p)
        back = uv2xyzN(uv, p)
        np.testing.assert_allclose(back, xyz, atol=1e-9)


def test_computeUVN_on_great_circle():
    """v returned by computeUVN puts the point on the circle n.x=0."""
    rng = np.random.default_rng(1)
    n = rng.normal(size=3)
    n /= np.linalg.norm(n)
    u = rng.uniform(-np.pi, np.pi, (20, 1))
    for p in (1, 2, 3):
        v = computeUVN(n, u, p)
        xyz = uv2xyzN(np.hstack([u, v]), p)
        np.testing.assert_allclose(xyz @ n, 0, atol=1e-6)


def test_computeUVN_vec_matches_scalar():
    rng = np.random.default_rng(2)
    ns = rng.normal(size=(4, 3))
    ns /= np.linalg.norm(ns, axis=1, keepdims=True)
    plane = np.array([1, 2, 3, 1])
    u = rng.uniform(-np.pi, np.pi, (8, 1))
    got = computeUVN_vec(ns, u, plane)
    for i in range(4):
        exp = computeUVN(ns[i], u[2 * i:2 * i + 2], plane[i])
        np.testing.assert_allclose(got[2 * i:2 * i + 2], exp, atol=1e-12)


def test_icosahedron_levels():
    pts0, tri0 = icosahedron2sphere(0)
    assert pts0.shape == (12, 3) and tri0.shape == (20, 3)
    pts3, tri3 = icosahedron2sphere(3)
    assert len(pts3) == 642  # 10*4^3+2
    np.testing.assert_allclose(np.linalg.norm(pts3, axis=1), 1, atol=1e-12)


def test_fit_plane_normal_recovers_plane():
    rng = np.random.default_rng(3)
    n_true = np.array([1.0, 2.0, -0.5])
    n_true /= np.linalg.norm(n_true)
    # Random unit vectors orthogonal to n_true
    raw = rng.normal(size=(100, 3))
    pts = raw - np.outer(raw @ n_true, n_true)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    got = fit_plane_normal(pts, np.ones((100, 1)))
    assert min(np.linalg.norm(got - n_true), np.linalg.norm(got + n_true)) < 1e-6


def test_cut_views_shapes_and_center():
    H, W = 64, 128
    pano = np.zeros((H, W, 3), np.float32)
    pano[:, :, 0] = np.linspace(0, 1, W)[None, :]
    views = np.asarray(cut_views(pano, size=32))
    assert views.shape == (26, 32, 32, 3)
    # The first horizon view looks at azimuth -pi: its center pixel samples
    # pano column ~0 (u = -pi maps to x ~ -0.5 i.e. wraps to the seam)
    xs, ys = VIEW_DIRECTIONS
    assert xs[0] == -np.pi and ys[0] == 0
    g = rgb_to_gray(views)
    assert g.shape == (26, 32, 32)


def test_range_helpers_wrap():
    assert _range_intersects([0.9, 0.1], [0.95, 0.05])
    assert _range_intersects([0.2, 0.4], [0.3, 0.5])
    assert not _range_intersects([0.2, 0.3], [0.5, 0.6])
    assert _inside_range(0.95, [0.9, 0.1])
    assert _inside_range(0.05, [0.9, 0.1])
    assert not _inside_range(0.5, [0.9, 0.1])


def test_lift_segments_normal_is_perpendicular():
    """Lifted great-circle normal must be orthogonal to both endpoints."""
    seg = np.array([[10.0, 20.0, 300.0, 40.0, 2.0, 1.0, 1.0]])
    out = lift_segments_to_sphere(seg, 0.3, 0.2, np.pi / 3, (320, 320))
    n, c1, c2 = out[0, :3], out[0, 3:6], out[0, 6:9]
    assert abs(np.dot(n, c1)) < 1e-6 * np.linalg.norm(c1)
    assert abs(np.dot(n, c2)) < 1e-6 * np.linalg.norm(c2)
    lines = segments_to_lines(out)
    assert lines.shape == (1, 8)
    assert lines[0, 3] in (1, 2, 3)


def test_sphere_hough_on_synthetic_manhattan():
    """Segments from 3 orthogonal direction families -> recovered axes."""
    rng = np.random.default_rng(4)
    axes = np.eye(3)
    normals, lengths = [], []
    for ax in axes:
        # normals perpendicular to this axis (lines pointing at the VP)
        for _ in range(60):
            r = rng.normal(size=3)
            n = r - np.dot(r, ax) * ax
            n /= np.linalg.norm(n)
            n += rng.normal(scale=0.01, size=3)
            n /= np.linalg.norm(n)
            normals.append(n)
            lengths.append(rng.uniform(0.1, 0.5))
    normals = np.array(normals)
    lengths = np.array(lengths).reshape(-1, 1)
    scores = np.ones_like(lengths)
    candi, tri = icosahedron2sphere(3)
    vp, _, _ = sphere_hough_vote(normals, lengths, scores, 4.0, 2, candi)
    assert vp is not None
    # Each recovered direction close to one of the true axes
    for v in vp:
        align = np.abs(axes @ v).max()
        assert align > 0.99, (v, align)


def test_hough_triple_search_invariants():
    """The triple search must pick a mutually near-orthogonal triple
    whose summed vote equals the reported maximum, respect the
    force_unempty filter, and stay deterministic under exact vote ties
    (first-maximum scan order)."""
    from horizonnet_tpu.preprocess.vanishing import _search_triples

    candi, _ = icosahedron2sphere(3)
    bins = candi[~(candi[:, 2] < 0)]
    n = len(bins)
    rng = np.random.default_rng(7)
    from horizonnet_tpu.preprocess.sphere import xyz2uvN
    check1 = np.nonzero(xyz2uvN(bins)[:, 1] > np.pi / 3)[0]
    orth_cos = np.cos((90 - 2) * np.pi / 180)
    third_cos = np.cos(2 * np.pi / 180)
    for trial in range(4):
        # quantized votes force plenty of exact ties; a zero fraction
        # exercises the force_unempty filtering
        votes = rng.integers(0, 6, n).astype(np.float64)
        for force in (True, False):
            nonzero = votes > 0 if force else np.ones(n, bool)
            best, vote_max, _, _ = _search_triples(
                bins, votes, check1, nonzero, orth_cos, third_cos, force)
            again, vote_again, _, _ = _search_triples(
                bins, votes, check1, nonzero, orth_cos, third_cos, force)
            assert best == again and vote_max == vote_again
            if best == (0, 0, 0):
                continue
            b1, b2, b3 = best
            assert b1 in check1
            if force:
                assert votes[b1] > 0 and votes[b2] > 0 and votes[b3] > 0
            assert vote_max == votes[b1] + votes[b2] + votes[b3]
            # pairwise near-orthogonality of the winning triple
            assert abs(bins[b1] @ bins[b2]) < orth_cos
            cr = np.cross(bins[b1], bins[b2])
            cr /= np.linalg.norm(cr)
            assert abs(bins[b3] @ cr) > third_cos


def test_hough_triple_search_native_matches_python():
    """The C++ triple search (vote.cpp, the pipeline default) must
    reproduce the numpy spec exactly: winning triple, vote total, and
    the _accept last_cost/last_angle bookkeeping, under ties, zero
    votes, and both force_unempty modes."""
    from horizonnet_tpu.preprocess.vanishing import _search_triples_py
    from horizonnet_tpu.preprocess.native import search_triples

    rng = np.random.default_rng(0)
    orth_cos = np.cos((90 - 2) * np.pi / 180)
    third_cos = np.cos(2 * np.pi / 180)
    for trial in range(6):
        n = int(rng.integers(50, 400))
        bins = rng.normal(size=(n, 3))
        bins /= np.linalg.norm(bins, axis=1, keepdims=True)
        # quantized votes force exact ties; the zero fraction exercises
        # force_unempty filtering and the all-rejected early-continue
        votes = np.where(rng.uniform(size=n) < 0.8,
                         rng.integers(0, 8, n).astype(np.float64), 0.0)
        check1 = rng.permutation(n)[:n // 2].astype(np.int32)
        force = trial % 2 == 0
        nonzero = votes > 0 if force else np.ones(n, bool)
        a = _search_triples_py(bins, votes, check1, nonzero, orth_cos,
                               third_cos, force)
        b = search_triples(bins, votes, check1, nonzero, orth_cos,
                           third_cos, force)
        assert a[0] == b[0], (trial, a[0], b[0])
        assert np.isclose(a[1], b[1]), (a[1], b[1])
        np.testing.assert_allclose(np.asarray(a[2], float),
                                   np.asarray(b[2], float))
        np.testing.assert_allclose(np.asarray(a[3], float),
                                   np.asarray(b[3], float))


def test_combine_edges_native_matches_python():
    """The C++ merge rounds (merge.cpp) must reproduce the numpy spec:
    same surviving rows, same order, same float64 values to rounding.

    Input: dense random segments across many views so that thousands of
    near-collinear pairs actually merge (several per round)."""
    from horizonnet_tpu.preprocess.lines import combine_edges, _merge_rounds_py

    rng = np.random.default_rng(11)
    xs, ys = VIEW_DIRECTIONS
    lifted = []
    for i in range(len(xs)):
        n = int(rng.integers(10, 30))
        p1 = rng.uniform(40, 280, (n, 2))
        d = rng.normal(0, 40, (n, 2))
        rows = []
        for k in range(n):
            # two overlapping collinear pieces of one image line (merge
            # fodder: identical great circle, overlapping turn ranges)
            # plus an unrelated segment
            rows.append([*p1[k], *(p1[k] + d[k])])
            rows.append([*(p1[k] + 0.4 * d[k]), *(p1[k] + 1.6 * d[k])])
            q = rng.uniform(20, 300, 2)
            rows.append([*q, *(q + rng.normal(0, 30, 2))])
        seg = np.asarray(rows)
        seg = np.hstack([seg, np.full((len(seg), 1), 2.0),
                         np.ones((len(seg), 2))])
        lifted.append(lift_segments_to_sphere(
            seg, xs[i], ys[i], np.pi / 3, (320, 320)))

    merged_cpp, ori = combine_edges(lifted, use_native=True)
    merged_py = _merge_rounds_py(ori)

    assert len(merged_cpp) < len(ori)  # merging actually happened
    assert merged_cpp.shape == merged_py.shape
    # Ranges, planeID, score: exact decisions, exact arithmetic
    np.testing.assert_allclose(merged_cpp[:, 3:6], merged_py[:, 3:6],
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(merged_cpp[:, 7], merged_py[:, 7],
                               rtol=0, atol=1e-12)
    # Normals/arclen: same to rounding except where a chain of merges on
    # one row amplifies the ~1-ulp numpy-SIMD-vs-libm trig difference
    # (acos near 1); bound the angular deviation instead of the floats
    ang = np.degrees(np.arccos(np.clip(np.abs(
        (merged_cpp[:, :3] * merged_py[:, :3]).sum(1)), -1, 1)))
    assert ang.max() < 0.1, ang.max()
    np.testing.assert_allclose(merged_cpp[:, 6], merged_py[:, 6],
                               rtol=0, atol=1e-3)
    assert (np.abs(merged_cpp - merged_py).max(1) > 1e-9).mean() < 0.02


def test_combine_edges_native_event_stream_matches_python():
    """The C++ merge must make the *same decisions* as the numpy spec:
    identical (round, i, j) merge-event streams on real demo data."""
    import ctypes
    from PIL import Image
    from horizonnet_tpu.preprocess import native
    from horizonnet_tpu.preprocess.lines import combine_edges

    demo = "/root/reference/assets/demo.png"
    if not os.path.isfile(demo):
        pytest.skip("reference assets not mounted")
    img = np.array(Image.open(demo).resize((1024, 512)))[..., :3]
    grays = np.asarray(rgb_to_gray(
        np.asarray(cut_views(img.astype(np.float64), size=160),
                   np.float64)))
    from horizonnet_tpu.preprocess.lsd import lsd_batch
    from horizonnet_tpu.preprocess.lines import lift_segments_to_sphere
    xs, ys = VIEW_DIRECTIONS
    segs = lsd_batch(grays, quant=0.7)
    lifted = []
    for i in range(len(xs)):
        s = segs[i]
        sl = (np.hstack([s[:, :5], np.ones((len(s), 2))]) if len(s)
              else np.zeros((0, 7)))
        lifted.append(lift_segments_to_sphere(
            sl, xs[i], ys[i], np.pi / 3, grays[i].shape))
    from horizonnet_tpu.preprocess.lines import (segments_to_lines,
                                                 _merge_rounds_py)
    ori = segments_to_lines(np.vstack([p for p in lifted if len(p)]))
    py_events = []
    merged = _merge_rounds_py(ori, events=py_events)

    lib = native._load()
    lib.combine_edges_merge_ev.restype = ctypes.c_int
    lib.combine_edges_merge_ev.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    buf = np.ascontiguousarray(ori, np.float64).copy()
    ev = np.zeros((100000, 3), np.int32)
    ev_n = ctypes.c_int(0)
    m = lib.combine_edges_merge_ev(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(buf), 3,
        ev.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(ev),
        ctypes.byref(ev_n))
    cpp_events = [tuple(r) for r in ev[:ev_n.value]]
    assert len(py_events) > 50  # demo data produces real merging
    assert cpp_events == py_events
    assert m == len(merged)


def test_paint_parameter_lines_f32_matches_f64_sampling():
    """The f32 raster fast path lands arcs on the same pixels as the f64
    geometry-module sampling (boundary flips allowed on <0.5% samples)."""
    from horizonnet_tpu.preprocess.lines import (paint_parameter_lines,
                                                 _sample_line_arcs)

    rng = np.random.default_rng(7)
    n = 200
    lines = np.zeros((n, 8))
    v = rng.normal(size=(n, 3))
    lines[:, :3] = v / np.linalg.norm(v, axis=1, keepdims=True)
    lines[:, 3] = rng.integers(1, 4, n)
    a = rng.uniform(0, 1, n)
    lines[:, 4] = a
    lines[:, 5] = np.mod(a + rng.uniform(0.02, 0.4, n), 1.0)
    lines[:, 6] = 0.3
    lines[:, 7] = 1.0

    W, H = 256, 128
    canvas = paint_parameter_lines(lines, W, H)

    xyz = _sample_line_arcs(lines, max(W, H))
    uv = xyz2uvN(xyz.reshape(-1, 3), 1)
    cols = np.minimum(np.floor((uv[:, 0] + np.pi) / (2 * np.pi) * W) + 1,
                      W).astype(int)
    rows = np.minimum(np.floor((np.pi / 2 - uv[:, 1]) / np.pi * H) + 1,
                      H).astype(int)
    want = np.zeros((H, W), bool)
    want[rows - 1, cols - 1] = True
    got = canvas > 0
    # compare nonzero support (idx 0 paints 0 — ignore, as in reference)
    mismatch = np.logical_xor(want, got).mean()
    assert mismatch < 0.005, mismatch


GOLDEN_VP = "/root/reference/assets/preprocessed/demo_VP.txt"


@pytest.mark.slow
def test_golden_vp_parity():
    """Full pipeline on demo.png reproduces the committed VP within 0.5 deg.

    Slow (~20 s): run explicitly with -m slow or by node id.
    """
    if not os.path.isfile(GOLDEN_VP):
        pytest.skip("reference assets not mounted")
    from PIL import Image
    from horizonnet_tpu.preprocess import pano_edge_detection

    golden = np.loadtxt(GOLDEN_VP)
    img = np.array(Image.open("/root/reference/assets/demo.png")
                   .resize((1024, 512)))
    result = pano_edge_detection(img)
    vp = result["vp"][:3]
    for i in range(3):
        ang = np.degrees(np.arccos(np.clip(np.abs(np.dot(vp[i], golden[i])),
                                           -1, 1)))
        assert ang < 0.5, f"VP row {i} off by {ang:.3f} deg"


def test_rotate_panorama_uint8_matches_float_path():
    """uint8-in/uint8-out warp == float warp + host truncation, up to the
    +-1 LSB f32 scaling ambiguity on a tiny fraction of pixels."""
    from horizonnet_tpu.preprocess.rotate import (rotate_panorama,
                                                  rotate_panorama_uint8)

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 128, 6), np.uint8)
    th = 0.4
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    f = rotate_panorama(img.astype(np.float32) / 255.0, R=R)
    ref = (np.clip(f, 0, 1) * 255).astype(np.uint8)
    u8 = rotate_panorama_uint8(img, R=R)
    assert u8.dtype == np.uint8 and u8.shape == img.shape
    diff = np.abs(u8.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02, (diff > 0).mean()


def test_rotate_panorama_identity_and_inverse():
    from horizonnet_tpu.preprocess import rotate_panorama
    rng = np.random.default_rng(9)
    noise = rng.uniform(0, 1, (64, 128, 3)).astype(np.float32)
    # Identity rotation reproduces the image (bilinear exact at centers)
    same = rotate_panorama(noise, R=np.eye(3))
    np.testing.assert_allclose(same, noise, atol=5e-4)
    # Rotate by R then R^-1 on a SMOOTH image (double bilinear resampling
    # of white noise would legitimately smear; smooth content round-trips)
    ys, xs = np.meshgrid(np.linspace(0, 4, 64), np.linspace(0, 8, 128),
                         indexing="ij")
    img = np.stack([np.sin(xs) * np.cos(ys),
                    np.cos(xs), np.sin(ys)], -1).astype(np.float32)
    img = (img + 1) / 2
    th = np.deg2rad(20)
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1]])
    out = rotate_panorama(rotate_panorama(img, R=R), R=np.linalg.inv(R))
    err = np.abs(out - img).mean()
    assert err < 0.01, err


def test_rotate_panorama_z_rotation_is_column_roll():
    """Rotating about the vertical axis by 2*pi*k/W columns equals a roll."""
    from horizonnet_tpu.preprocess import rotate_panorama
    rng = np.random.default_rng(10)
    img = rng.uniform(0, 1, (32, 64, 3)).astype(np.float32)
    k = 16
    th = 2 * np.pi * k / 64
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0],
                   [0, 0, 1]])
    out = rotate_panorama(img, R=Rz)
    rolled = np.roll(img, -k, axis=1)
    # Up to the direction convention the result is an exact column roll
    err_pos = np.abs(out - rolled).mean()
    err_neg = np.abs(out - np.roll(img, k, axis=1)).mean()
    assert min(err_pos, err_neg) < 5e-4, (err_pos, err_neg)


def test_near_vp_closed_form_matches_sampled_oracle():
    """The quadratic closed form behind assign_vanishing_type must
    reproduce the reference's 100-chord-sample near-VP booleans exactly
    (pano_lsd_align.py:726-735); the oracle materializes the samples."""
    from horizonnet_tpu.preprocess.lines import (_near_vp_any,
                                                 _near_vp_any_sampled)
    rng = np.random.default_rng(3)
    for _ in range(30):
        n = int(rng.integers(1, 300))
        a = rng.normal(size=(n, 3))
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        # mixture of short arcs and near-antipodal chords
        b = a + rng.uniform(0.05, 1.8) * rng.normal(size=(n, 3))
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        vp = rng.normal(size=(3, 3))
        vp /= np.linalg.norm(vp, axis=1, keepdims=True)
        c = np.cos(np.deg2rad(rng.uniform(1.0, 45.0)))
        np.testing.assert_array_equal(
            _near_vp_any(a, b, vp, c, 100),
            _near_vp_any_sampled(a, b, vp, c, 100))
