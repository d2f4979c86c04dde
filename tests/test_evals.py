"""Evaluation metric tests, including self-consistency on the reference's
committed golden inference results (assets/inferenced/*.json).
"""

import json
import os

import numpy as np
import pytest

from horizonnet_tpu.evals import new_general_losses, eval_3diou
from horizonnet_tpu.evals import test_general as eval_one_general
from horizonnet_tpu.evals import test_cuboid as eval_one_cuboid
from horizonnet_tpu.geometry import xy2coor

GOLDEN = "/root/reference/assets/inferenced/demo_aligned_rgb.json"


def _load_golden():
    if not os.path.isfile(GOLDEN):
        pytest.skip("reference assets not mounted")
    with open(GOLDEN) as f:
        dt = json.load(f)
    cor_id = np.array(dt["uv"], np.float32)
    cor_id[:, 0] *= 1024
    cor_id[:, 1] *= 512
    return cor_id, dt["z0"], dt["z1"]


def _synthetic_cuboid(dx=0.0, dy=0.0, w=3.0, d=2.0):
    """Pixel corner list of a camera-centered plan rectangle (meters),
    ceiling/floor interleaved; the camera must lie inside the room for the
    halfspace construction (origin-interior requirement)."""
    pts = np.array([
        [-w + dx, -d + dy], [w + dx, -d + dy],
        [w + dx, d + dy], [-w + dx, d + dy],
    ], np.float64) + 0.5  # xy2coor(floorW=1, floorH=1) subtracts the 0.5
    floor = xy2coor(pts, -1.6, 1024, 512, floorW=1, floorH=1)
    ceil = xy2coor(pts, 1.2, 1024, 512, floorW=1, floorH=1)
    out = np.zeros((8, 2), np.float32)
    out[0::2] = ceil
    out[1::2] = floor
    return out


def test_general_self_iou_is_one():
    cor, _, _ = _load_golden()
    losses = new_general_losses()
    eval_one_general(cor, cor, 1024, 512, losses)
    assert losses["overall"]["2DIoU"][0] == pytest.approx(1.0, abs=1e-6)
    assert losses["overall"]["3DIoU"][0] == pytest.approx(1.0, abs=1e-6)
    assert losses["overall"]["rmse"][0] == pytest.approx(0.0, abs=1e-6)
    assert losses["overall"]["delta_1"][0] == pytest.approx(1.0)
    # 16 uv corners -> 8 floor corners -> bucket "8"
    assert len(losses["8"]["2DIoU"]) == 1


def test_cuboid_self_metrics():
    cor = _synthetic_cuboid()
    losses = {"CE": [], "PE": [], "3DIoU": []}
    # z0=50 anchors the ceiling plane (height 1.2 in room units), so the
    # floor plane at -1.6 sits at z1 = -1.6 * 50 / 1.2
    eval_one_cuboid(cor, 50.0, -1.6 * 50 / 1.2, cor, 1024, 512, losses)
    assert losses["CE"][0] == pytest.approx(0.0, abs=1e-6)
    assert losses["PE"][0] == pytest.approx(0.0, abs=0.2)
    assert losses["3DIoU"][0] == pytest.approx(100.0, abs=0.2)


def test_cuboid_3diou_vs_qhull():
    scipy_spatial = pytest.importorskip("scipy.spatial")
    a = _synthetic_cuboid()
    b = _synthetic_cuboid(dx=1.0, dy=0.75)  # camera strictly inside both rooms
    got = eval_3diou(a[1::2], a[0::2], b[1::2], b[0::2])

    # Independent Qhull recomputation of the same construction
    from horizonnet_tpu.geometry.polytope import layout_halfspaces
    from horizonnet_tpu.geometry.equirect import coor2xy, coory2v_up

    def rings(cor):
        floor_coor, ceil_coor = cor[1::2], cor[0::2]
        xy = coor2xy(floor_coor, -1.6, 1024, 512, floorW=1, floorH=1)
        fl = np.hstack([xy, np.full((len(xy), 1), -1.6)])
        c = np.sqrt((xy ** 2).sum(1))
        cz = c * np.tan(coory2v_up(ceil_coor[:, 1], 512))
        ce = fl.copy()
        ce[:, 2] = cz
        return fl, ce

    hs_a = layout_halfspaces(*rings(a))
    hs_b = layout_halfspaces(*rings(b))

    def qvol(hs):
        hi = scipy_spatial.HalfspaceIntersection(hs, np.zeros(3))
        return scipy_spatial.ConvexHull(hi.intersections).volume

    inter = qvol(np.concatenate([hs_a, hs_b]))
    va, vb = qvol(hs_a), qvol(hs_b)
    ref = 100 * inter / (va + vb - inter)
    assert got == pytest.approx(ref, rel=1e-6)
    assert 0 < got < 100


def test_general_shifted_rooms_partial_iou():
    a = _synthetic_cuboid()
    b = _synthetic_cuboid(dx=1.0)
    losses = new_general_losses()
    eval_one_general(a, b, 1024, 512, losses)
    iou = losses["overall"]["2DIoU"][0]
    assert 0.1 < iou < 0.99
