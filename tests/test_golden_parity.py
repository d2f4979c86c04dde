"""Golden parity over the reference's FULL committed evidence set.

The reference repo commits ~53 PanoContext inference results
(assets/inferenced/pano_*.json) produced by its published model + post-
processing. Two properties must hold against every fixture:

1. Self-evaluation: our general-layout metrics score each layout against
   itself at exactly IoU 1 (exercises the in-house polygon/prism/depth
   geometry over real room shapes) — except four fixtures whose floor
   polygons are genuinely self-intersecting; the reference's shapely
   validity check skips those the same way (eval_general.py:69-76).
2. gen_ww round-trip: re-fitting walls from each layout's own boundary
   + corner columns reproduces the layout (the Manhattan machinery is a
   projection: already-fitted layouts are near-fixed-points).
"""

import glob
import json
import os

import numpy as np
import pytest

from horizonnet_tpu.evals import new_general_losses
from horizonnet_tpu.evals import test_general as eval_one_general
from horizonnet_tpu.geometry import cor_2_1d
from horizonnet_tpu.geometry.equirect import refine_by_fix_z, infer_coory
from horizonnet_tpu.postproc import gen_ww

W, H = 1024, 512
FIXTURE_GLOB = "/root/reference/assets/inferenced/pano_*.json"
# Committed reference outputs whose floor polygon self-intersects; the
# reference's own eval skips them ("Skip ground truth invalid")
KNOWN_INVALID = {
    "pano_aaztihqxgckbtu.json", "pano_aixninerbhvojf.json",
    "pano_alemrbeqazbogk.json", "pano_apncosbfcwroho.json",
}


def _fixtures():
    paths = sorted(glob.glob(FIXTURE_GLOB))
    if not paths:
        pytest.skip("reference assets not mounted")
    return paths


def _load(path):
    with open(path) as f:
        dt = json.load(f)
    return np.array(dt["uv"], np.float32) * [W, H]


def test_golden_self_eval_all_fixtures():
    invalid = set()
    for path in _fixtures():
        cor = _load(path)
        losses = new_general_losses()
        eval_one_general(cor, cor, W, H, losses)
        if not losses["overall"]["2DIoU"]:
            invalid.add(os.path.basename(path))
            continue
        assert losses["overall"]["2DIoU"][0] == pytest.approx(1.0, abs=1e-6)
        assert losses["overall"]["3DIoU"][0] == pytest.approx(1.0, abs=1e-6)
        assert losses["overall"]["rmse"][0] == pytest.approx(0.0, abs=1e-6)
    assert invalid == KNOWN_INVALID


def test_golden_gen_ww_roundtrip():
    """Wall fit from each golden layout's own boundary reproduces it."""
    scores = []
    for path in _fixtures():
        if os.path.basename(path) in KNOWN_INVALID:
            continue
        cor = _load(path)
        bon = cor_2_1d(cor, H, W)
        coory0 = np.clip((np.asarray(bon[0], np.float64) / np.pi + 0.5) * H
                         - 0.5, 1, H / 2 - 1)
        coory1 = np.clip((np.asarray(bon[1], np.float64) / np.pi + 0.5) * H
                         - 0.5, H / 2 + 1, H - 2)
        _, z1 = refine_by_fix_z(coory0, coory1, 50.0, H)
        # unique: the peak finder emits distinct integer columns; two
        # fixture corners 0.08px apart would otherwise collide when
        # rounded (the reference's gen_ww asserts on duplicates too)
        xs = np.unique(np.round(cor[0::2, 0]).astype(int))
        fit, walls = gen_ww(xs, coory0, 50.0, coorW=W, coorH=H,
                            tol=abs(0.16 * z1 / 1.6), force_cuboid=False)
        fy = infer_coory(fit[:, 1], z1 - 50.0, 50.0, coorH=H)
        cor2 = np.zeros((len(fit) * 2, 2))
        cor2[0::2] = fit
        cor2[1::2] = np.stack([fit[:, 0], fy], -1)

        losses = new_general_losses()
        eval_one_general(cor2, cor, W, H, losses)
        got = losses["overall"]["2DIoU"]
        scores.append(got[0] if got else 0.0)

    scores = np.asarray(scores)
    assert len(scores) == 49
    # Every valid fixture round-trips well; most exactly (odd-corner
    # rooms cannot alternate wall axes and re-fit to one extra corner)
    assert (scores >= 0.92).all(), scores.min()
    assert (scores >= 0.999).sum() >= 38, (scores >= 0.999).sum()
