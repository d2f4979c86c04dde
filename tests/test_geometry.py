"""Geometry unit tests: independent re-derivations of the reference formulas.

Expected values are computed inline from the documented math (not imported
from the reference), so these tests pin the behavioral contract.
"""

import numpy as np
import pytest

from horizonnet_tpu.geometry import (
    coorx2u, coory2v, coory2v_up, u2coorx, v2coory, uv2xy,
    coor2xy, xy2coor, get_z1, infer_coory,
    pano_connect_points, cor_2_1d,
    layout_2_depth,
    polygon_area, polygon_is_valid, polygon_intersection_area, polygon_iou,
    halfspace_intersection_volume, layout_halfspaces,
)
from horizonnet_tpu.geometry.equirect import refine_by_fix_z
from horizonnet_tpu.geometry.polytope import clip_polytope, polytope_volume


def test_coor_angle_roundtrip():
    xs = np.linspace(0, 1023, 50)
    ys = np.linspace(0, 511, 50)
    assert np.allclose(u2coorx(coorx2u(xs)), xs)
    assert np.allclose(v2coory(coory2v(ys)), ys)
    # Column 511.5 is the image center -> u = 0
    assert abs(coorx2u(511.5)) < 1e-12
    # Up-positive is the negation of down-positive
    assert np.allclose(coory2v_up(ys), -coory2v(ys))


def test_coor2xy_xy2coor_roundtrip():
    rng = np.random.default_rng(0)
    # z=50 pairs with the ceiling boundary (rows above the horizon), as in
    # gen_ww's projection of y_bon[0] at z0=50 (inference.py:113)
    coor = np.stack([rng.uniform(0, 1024, 64), rng.uniform(20, 200, 64)], 1)
    xy = coor2xy(coor, z=50)
    back = xy2coor(xy, z=50)
    assert np.allclose(back, coor, atol=1e-8)
    # Floor boundary pairs with a negative plane height (camera above floor),
    # as in eval_general's np_coor2xy(dt_floor_coor, ch=-1.6)
    coor_f = np.stack([rng.uniform(0, 1024, 64), rng.uniform(300, 500, 64)], 1)
    xy_f = coor2xy(coor_f, z=-1.6, floorW=1, floorH=1)
    back_f = xy2coor(xy_f, z=-1.6, floorW=1, floorH=1)
    assert np.allclose(back_f, coor_f, atol=1e-7)


def test_coor2xy_known_point():
    # Pixel at image center column, 3/4 down: u=0, v_up=-pi/4 -> c=-z
    xy = coor2xy(np.array([[511.5, 383.5]]), z=50, floorW=1024, floorH=512)
    # c = 50/tan(-pi/4) = -50; x = c*sin(0)+511.5 = 511.5; y = -c*cos(0)+255.5
    assert np.allclose(xy, [[511.5, 305.5]], atol=1e-9)


def test_get_z1_and_infer_coory_are_inverse():
    rng = np.random.default_rng(1)
    # Rows on the z0=50 plane are the ceiling boundary (inference.py:97,113)
    coory0 = rng.uniform(20, 200, 32)           # ceiling boundary rows
    coory1 = rng.uniform(300, 500, 32)          # floor boundary rows
    z1 = get_z1(coory0, coory1, z0=50)          # per-column floor plane height
    assert (z1 < 0).all()
    rows = infer_coory(coory0, z1 - 50, z0=50)  # re-derive floor rows
    assert np.allclose(rows, coory1, atol=1e-6)


def test_refine_by_fix_z_constant_height():
    # If all columns agree on a single z1, refinement returns it exactly
    coory0 = np.full(100, 100.0)   # ceiling rows on the z0=50 plane
    coory1 = np.full(100, 400.0)   # floor rows
    refined, z1 = refine_by_fix_z(coory0, coory1, z0=50)
    assert np.allclose(refined, 400.0, atol=1e-9)
    assert np.allclose(get_z1(100.0, 400.0, 50), z1)


def test_pano_connect_points_endpoints_and_wrap():
    p1 = np.array([100.0, 120.0])
    p2 = np.array([300.0, 140.0])
    xys = pano_connect_points(p1, p2, z=-50)
    assert xys[0, 0] == 100 and xys[-1, 0] == 300
    # Rows at integer columns equal to the corner columns match corner rows
    assert abs(xys[0, 1] - 120.0) < 0.5
    assert abs(xys[-1, 1] - 140.0) < 0.5
    # Wrap case: goes the short way around through the seam
    xys = pano_connect_points(np.array([1000.0, 120.0]), np.array([24.0, 120.0]), z=-50)
    assert xys[0, 0] == 1000 and xys[-1, 0] == 24
    assert len(xys) == 49  # columns 1000..1023, 0..24


def test_cor_2_1d_cuboid_shape_and_signs():
    # Symmetric cuboid corners: 4 walls at columns 128/384/640/896
    cols = [128, 384, 640, 896]
    cor = []
    for c in cols:
        cor.append([c, 100])   # ceiling
        cor.append([c, 400])   # floor
    bon = cor_2_1d(np.array(cor, np.float32), 512, 1024)
    assert bon.shape == (2, 1024)
    assert (bon[0] < 0).all()  # ceiling above horizon (down-positive v < 0)
    assert (bon[1] > 0).all()
    # At corner columns boundary passes through the corner rows
    v_at = ((100 + 0.5) / 512 - 0.5) * np.pi
    assert abs(bon[0, 128] - v_at) < 0.01


def test_layout_2_depth_sane():
    cols = [128, 384, 640, 896]
    cor = np.array([[c, r] for c in cols for r in (100, 400)], np.float32)
    depth = layout_2_depth(cor, 512, 1024)
    assert depth.shape == (512, 1024)
    assert (depth > 0).all()
    d, fm, cm, wm = layout_2_depth(cor, 512, 1024, return_mask=True)
    assert (fm | cm | wm).all() and not (fm & cm).any()


# ---------------- polygon -------------------------------------------------

def test_polygon_area_and_validity():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    assert abs(polygon_area(sq) - 4.0) < 1e-12
    assert polygon_is_valid(sq)
    bow = np.array([[0, 0], [2, 2], [2, 0], [0, 2]], float)  # self-intersects
    assert not polygon_is_valid(bow)


def test_polygon_intersection_squares():
    a = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    b = a + 1.0
    assert abs(polygon_intersection_area(a, b) - 1.0) < 1e-9
    assert abs(polygon_iou(a, b) - 1.0 / 7.0) < 1e-9
    # Order-independence and orientation-independence
    assert abs(polygon_intersection_area(b[::-1], a) - 1.0) < 1e-9


def test_polygon_intersection_nonconvex():
    # L-shape vs square overlapping the notch
    L = np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3]], float)
    sq = np.array([[0.5, 0.5], [2.5, 0.5], [2.5, 2.5], [0.5, 2.5]], float)
    # Exact overlap: intersect L with square ->
    # bottom strip [0.5,2.5]x[0.5,1] = 1.0 ; left strip [0.5,1]x[1,2.5] = 0.75
    got = polygon_intersection_area(L, sq)
    assert abs(got - 1.75) < 1e-9


def test_polygon_disjoint_and_contained():
    a = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    b = a + 5.0
    assert polygon_intersection_area(a, b) == 0.0
    inner = np.array([[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75]])
    assert abs(polygon_intersection_area(a, inner) - 0.25) < 1e-12


# ---------------- polytope ------------------------------------------------

def test_unit_cube_volume():
    # |x|<=1, |y|<=1, |z|<=1 as n.x + b <= 0 rows
    hs = []
    for axis in range(3):
        for s in (1.0, -1.0):
            n = np.zeros(3)
            n[axis] = s
            hs.append(np.concatenate([n, [-1.0]]))
    vol = halfspace_intersection_volume(np.array(hs))
    assert abs(vol - 8.0) < 1e-6


def test_clipped_tetra_volume_vs_qhull():
    scipy = pytest.importorskip("scipy.spatial")
    rng = np.random.default_rng(3)
    # Random halfspaces all keeping the origin strictly inside
    normals = rng.normal(size=(12, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    offsets = -rng.uniform(0.5, 2.0, 12)  # n.x <= -b with b<0 -> origin ok
    hs = np.concatenate([normals, offsets[:, None]], 1)
    mine = halfspace_intersection_volume(hs)
    h = scipy.HalfspaceIntersection(hs, np.zeros(3))
    ref = scipy.ConvexHull(h.intersections).volume
    assert abs(mine - ref) / ref < 1e-6


def test_layout_halfspaces_cuboid_volume():
    # Simple box room: floor z=-1.6, ceiling z=1.2, walls +-2 x +-3
    floor = np.array([[-2, -3, -1.6], [2, -3, -1.6], [2, 3, -1.6], [-2, 3, -1.6]])
    ceil = floor.copy()
    ceil[:, 2] = 1.2
    hs = layout_halfspaces(floor, ceil)
    vol = halfspace_intersection_volume(hs)
    assert abs(vol - 4 * 6 * 2.8) < 1e-6
