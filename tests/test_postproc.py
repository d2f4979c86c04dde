"""Post-processing tests: vote consensus, cuboid/general wall fitting."""

import numpy as np

from horizonnet_tpu.geometry import xy2coor, cor_2_1d
from horizonnet_tpu.postproc import vote, gen_ww
from horizonnet_tpu.postproc.manhattan import get_gpid
from horizonnet_tpu.inference import postprocess


def _cuboid_room(w=6.0, d=4.0, z=50.0, W=1024, H=512):
    """Plan rectangle centered on camera -> ceiling corner pixel coords."""
    corners_xy = np.array([
        [512 - w, 256 - d], [512 + w, 256 - d],
        [512 + w, 256 + d], [512 - w, 256 + d],
    ], np.float64) - 0.5
    return xy2coor(corners_xy, z, 1024, 512)


def test_vote_consensus():
    vec = np.array([10.0, 10.01, 10.02, 9.99, 30.0])
    best, score, l1 = vote(vec, tol=3)
    assert abs(best - 10.005) < 0.01
    assert score == 0.8
    # All spread out beyond tol -> median fallback
    best, score, _ = vote(np.array([0.0, 100.0, 200.0]), tol=0.5)
    assert score == 0
    assert best == 100.0


def test_get_gpid_wraps():
    gp = get_gpid(np.array([100, 400, 700, 900]), 1024)
    assert gp[0] == 0 and gp[-1] == 0       # wrap: last segment joins first
    assert gp[100] == 1 and gp[400] == 2 and gp[900] == 0
    assert len(np.unique(gp)) == 4


def test_gen_ww_cuboid_recovers_room():
    cor_ceil = _cuboid_room()
    xs = np.sort(np.round(cor_ceil[:, 0]).astype(int))
    # Per-column ceiling boundary rows of the true room
    full = np.array([[c, r] for (c, r) in cor_ceil for r_ in [0]], np.float64)
    cor = []
    for c, r in cor_ceil:
        cor.append([c, r])        # ceiling
        cor.append([c, 450.0])    # dummy floor rows (unused here)
    bon = cor_2_1d(np.array(cor, np.float32), 512, 1024)
    coory = (bon[0] / np.pi + 0.5) * 512 - 0.5

    fit, walls = gen_ww(xs, coory, z=50, tol=3, force_cuboid=True)
    assert len(fit) == 4
    types = [w.axis for w in walls]
    assert types in ([0, 1, 0, 1], [1, 0, 1, 0])
    # Recovered corner columns within a couple pixels of ground truth
    got_x = np.sort(fit[:, 0])
    want_x = np.sort(cor_ceil[:, 0])
    assert np.abs(got_x - want_x).max() < 3.0


def test_gen_ww_general_recovers_L_room():
    """6-corner L-shaped room through the general greedy path."""
    z = 50.0
    pts = np.array([
        [512 - 8, 256 - 6], [512 + 10, 256 - 6], [512 + 10, 256 + 2],
        [512 + 2, 256 + 2], [512 + 2, 256 + 7], [512 - 8, 256 + 7],
    ], np.float64) - 0.5
    cor_ceil = xy2coor(pts, z, 1024, 512)
    order = np.argsort(cor_ceil[:, 0])
    cor_ceil = cor_ceil[order]
    cor = []
    for c, r in cor_ceil:
        cor.append([c, r])
        cor.append([c, 460.0])
    bon = cor_2_1d(np.array(cor, np.float32), 512, 1024)
    coory = (bon[0] / np.pi + 0.5) * 512 - 0.5
    xs = np.sort(np.round(cor_ceil[:, 0]).astype(int))

    fit, walls = gen_ww(xs, coory, z=z, tol=3, force_cuboid=False)
    assert len(fit) == 6
    # Types alternate around the loop
    types = [w.axis for w in walls]
    for i in range(len(types)):
        assert types[i] != types[i - 1]
    got_x = np.sort(fit[:, 0])
    want_x = np.sort(cor_ceil[:, 0])
    assert np.abs(got_x - want_x).max() < 4.0


def test_postprocess_cuboid_end_to_end():
    """Synthetic perfect model output -> postprocess recovers the room."""
    H, W = 512, 1024
    cor_ceil = _cuboid_room()
    cor = []
    for c, r in cor_ceil:
        cor.append([c, r])
        cor.append([c, 440.0])
    # cor_2_1d wants the min-x corner first and interleaved ceiling/floor
    cor = np.array(cor, np.float32)
    order = np.argsort(cor[::2, 0])
    cor = cor.reshape(-1, 2, 2)[order].reshape(-1, 2)
    bon = cor_2_1d(cor, H, W)

    y_cor = np.zeros(W, np.float32)
    for c in cor[::2, 0]:
        y_cor[int(round(c))] = 1.0

    cor_id, z0, z1 = postprocess(bon, y_cor, H, W, force_cuboid=True)
    assert cor_id.shape == (8, 2)
    assert z0 == 50.0
    got_cols = np.sort(cor_id[::2, 0] * W)
    want_cols = np.sort(cor[::2, 0])
    assert np.abs(got_cols - want_cols).max() < 3.0
    # Floor rows should roughly match the synthetic 440 constant
    got_floor = cor_id[1::2, 1] * H
    assert np.abs(got_floor - 440.0).max() < 6.0


def test_postprocess_force_raw():
    H, W = 512, 1024
    bon = np.stack([np.full(W, -0.5), np.full(W, 0.5)])
    y_cor = np.zeros(W, np.float32)
    cor_id, z0, z1 = postprocess(bon, y_cor, H, W, force_raw=True)
    assert cor_id.shape == (2 * W, 2)
    assert (cor_id[:, 0] >= 0).all() and (cor_id[:, 0] <= 1).all()


def test_fuv2img_constant_and_interp():
    from horizonnet_tpu.postproc import fuv2img
    const = fuv2img(np.full(1024, 7.0), floorW=64, floorH=32)
    assert const.shape == (32, 64)
    np.testing.assert_allclose(const, 7.0)


def test_get_rot_rad_detects_rotation():
    """A cuboid rotated by 10 deg in plan suggests a ~10 deg correction."""
    from horizonnet_tpu.postproc import get_rot_rad
    from horizonnet_tpu.geometry import xy2coor, cor_2_1d
    th = np.deg2rad(10.0)
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    base = np.array([[-6.0, -4.0], [6.0, -4.0], [6.0, 4.0], [-6.0, 4.0]])
    pts = base @ R.T + [511.5, 255.5]
    cor_ceil = xy2coor(pts, 50, 1024, 512)
    order = np.argsort(cor_ceil[:, 0])
    cor_ceil = cor_ceil[order]
    cor = []
    for c, r in cor_ceil:
        cor.append([c, r]); cor.append([c, 450.0])
    bon = cor_2_1d(np.array(cor, np.float32), 512, 1024)
    coory = (bon[0] / np.pi + 0.5) * 512 - 0.5
    xs = np.sort(np.round(cor_ceil[:, 0]).astype(int))
    dx, rot = get_rot_rad(xs, coory, z=50)
    assert abs(abs(rot) - 10.0) < 2.0, rot


def test_gpid_two_split():
    from horizonnet_tpu.postproc import gpid_two_split
    # first half on wall x=2, second half on wall y=5
    xy = np.zeros((20, 2))
    xy[:10, 0] = 2.0
    xy[:10, 1] = np.linspace(0, 5, 10)
    xy[10:, 1] = 5.0
    xy[10:, 0] = np.linspace(2, 8, 10)
    va, vb = gpid_two_split(xy, 0, 1)
    assert abs(va - 2.0) < 0.5
    assert abs(vb - 5.0) < 0.5


def test_vote_matches_scipy_literal():
    """vote() must match a literal scipy squareform(pdist)+1e-9 recompute."""
    import pytest
    scipy_sd = pytest.importorskip("scipy.spatial.distance")

    def scipy_vote(vec, tol):
        vec = np.sort(np.asarray(vec, np.float64))
        n = np.arange(len(vec))[::-1]
        n = n[:, None] - n[None, :] + 1.0
        l = scipy_sd.squareform(
            scipy_sd.pdist(vec[:, None], "minkowski", p=1) + 1e-9)
        invalid = (n < len(vec) * 0.4) | (l > tol)
        if (~invalid).sum() == 0 or len(vec) < tol:
            return np.median(vec), 0
        score = np.where(invalid, -1, n)
        mi = score.argmax()
        r, c = mi // len(vec), mi % len(vec)
        return vec[r:c + 1].mean(), (c - r + 1) / len(vec)

    rng = np.random.default_rng(7)
    for _ in range(200):
        m = rng.integers(3, 40)
        vec = np.concatenate([rng.normal(10, 0.5, m),
                              rng.uniform(0, 50, rng.integers(0, 5))])
        tol = rng.uniform(0.5, 8)
        b1, s1, _ = vote(vec.copy(), tol)
        b2, s2 = scipy_vote(vec.copy(), tol)
        assert b1 == pytest.approx(b2, rel=1e-12), (vec, tol)
        assert s1 == pytest.approx(s2, rel=1e-12)
