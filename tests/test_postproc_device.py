"""Device cuboid postprocess vs the reference-exact host path.

The device path (postproc/device.py) is float32 and shape-static; the host
path (inference.postprocess) is float64 numpy. On well-conditioned inputs
(clear corner peaks, consensus walls) they must agree to sub-pixel.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from horizonnet_tpu.geometry import xy2coor, cor_2_1d
from horizonnet_tpu.geometry.equirect import infer_coory
from horizonnet_tpu.inference import postprocess
from horizonnet_tpu.ops.filters import find_peaks_np
from horizonnet_tpu.postproc.device import (
    find_4_peaks, postprocess_cuboid_batch, vote_sorted)
from horizonnet_tpu.postproc.manhattan import vote

H, W = 512, 1024


def _vote_device(vec, tol):
    """Run the device vote on one 1-D host vector."""
    vec = np.asarray(vec, np.float64)
    svals = jnp.sort(jnp.asarray(vec, jnp.float32))[None]
    m = jnp.asarray([len(vec)])
    fit, sc, l1 = vote_sorted(svals, m, jnp.asarray([tol], jnp.float32))
    return float(fit[0]), float(sc[0]), float(l1[0])


@pytest.mark.heavy
def test_vote_sorted_matches_host():
    rng = np.random.default_rng(0)
    for trial in range(30):
        m = int(rng.integers(3, 200))
        scale = float(rng.uniform(1, 50))
        vec = rng.normal(0, scale, m)
        tol = float(rng.uniform(0.5, 2 * scale))
        want = vote(vec, tol)
        got = _vote_device(vec, tol)
        assert abs(got[0] - want[0]) < 1e-3 * max(1, scale), trial
        assert abs(got[1] - want[1]) < 1e-6, trial
        assert abs(got[2] - want[2]) < 1e-3 * max(1, scale), trial


def test_segment_votes_grouped_matches_padded_rows():
    """_segment_votes (one (segment, value) lexsort over the columns)
    must reproduce the padded-row formulation — vote_sorted over
    [B, n_seg, 2, W] masked rows, the pre-round-5 implementation —
    exactly, including empty segments, median fallbacks and the
    plain segment means."""
    from horizonnet_tpu.postproc.device import \
        _segment_votes_grouped as _segment_votes

    rng = np.random.default_rng(42)
    B, Wt, n_seg = 3, 256, 8
    for trial in range(4):
        # clustered wall-ish values with outliers, random segment sizes
        # (some empty), and per-pano tolerances spanning both vote modes
        xy = rng.normal(0, rng.uniform(1, 30), (B, Wt, 2))
        centers = rng.normal(0, 20, (B, n_seg, 2))
        cuts = np.sort(rng.choice(Wt, (B, n_seg - 1), replace=True), -1)
        gpid = np.zeros((B, Wt), np.int32)
        for b in range(B):
            gpid[b] = np.searchsorted(cuts[b], np.arange(Wt), "right")
            take = rng.uniform(0, 1, Wt) < 0.8
            xy[b, take] = centers[b, gpid[b, take]] \
                + rng.normal(0, 0.3, (take.sum(), 2))
        tol = rng.uniform(0.5, 8.0, B).astype(np.float32)

        got = _segment_votes(jnp.asarray(xy, jnp.float32),
                             jnp.asarray(gpid), jnp.asarray(tol), n_seg)

        # padded-row reference formulation
        seg_mask = gpid[:, None, :] == np.arange(n_seg)[None, :, None]
        vals_ax = np.transpose(xy, (0, 2, 1)).astype(np.float32)
        masked = np.where(seg_mask[:, :, None, :], vals_ax[:, None],
                          np.inf)
        svals = np.sort(masked, -1)
        m = np.broadcast_to(seg_mask.sum(-1)[..., None], (B, n_seg, 2))
        fit, sc, l1 = vote_sorted(
            jnp.asarray(svals), jnp.asarray(m),
            jnp.broadcast_to(jnp.asarray(tol)[:, None, None],
                             (B, n_seg, 2)))
        seg_sum = np.where(seg_mask[:, :, None, :], vals_ax[:, None],
                           0.0).sum(-1)
        mean = seg_sum / np.maximum(m, 1)

        for name, a, b in zip(("fit", "score", "l1", "mean"), got,
                              (fit, sc, l1, mean)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-4,
                                       err_msg=f"{name} trial {trial}")


def test_vote_sorted_median_fallback():
    # Spread beyond tol -> median, score 0 (host semantics)
    vec = np.array([0.0, 100.0, 200.0])
    got = _vote_device(vec, 0.5)
    assert got[0] == 100.0 and got[1] == 0.0
    # m < tol -> median fallback even when a span exists
    vec = np.array([10.0, 10.01, 10.02])
    want = vote(vec, tol=5)
    got = _vote_device(vec, 5.0)
    assert want[1] == 0 and got[1] == 0
    assert abs(got[0] - want[0]) < 1e-4


def _corner_heatmap(xs, w=W, sigma=4.0):
    cols = np.arange(w)
    d = np.abs(cols[None, :] - np.asarray(xs)[:, None])
    d = np.minimum(d, w - d)
    return 0.01 + 0.9 * np.exp(-(d / sigma) ** 2).sum(0).clip(0, 1)


def test_find_4_peaks_matches_host():
    rng = np.random.default_rng(1)
    for trial in range(10):
        xs = np.sort(rng.choice(np.arange(30, W - 30, 60), 4, replace=False))
        sig = _corner_heatmap(xs) + rng.uniform(0, 1e-4, W)
        r_px = int(round(W * 0.05 / 2))
        want = find_peaks_np(sig, r=r_px, min_v=0, N=4)[0]
        got = np.asarray(find_4_peaks(jnp.asarray(sig, jnp.float32)[None],
                                      r_px))[0]
        assert np.array_equal(np.sort(want), got), trial


def test_find_4_peaks_degenerate_no_collision():
    """A single peak AT a fallback column must not duplicate it.

    Regression: the old fallback substituted fixed columns 0/W4/W2/3W4 by
    slot position without checking against valid peaks; a lone peak at
    e.g. column W//4 produced duplicate locs, an empty wall segment, and
    +inf corners downstream.
    """
    for peak_col in (0, W // 4, W // 2, 3 * W // 4, 100):
        sig = np.zeros(W)
        sig[peak_col] = 0.9
        locs = np.asarray(find_4_peaks(jnp.asarray(sig, jnp.float32)[None],
                                       r_px=26))[0]
        assert len(np.unique(locs)) == 4, (peak_col, locs)
        assert peak_col in locs


def test_postprocess_cuboid_batch_degenerate_is_finite():
    """Degenerate corner heatmaps (0..2 usable peaks) yield finite output
    where the host path would crash on the 4-wall assert."""
    rng = np.random.default_rng(5)
    bon, _ = _synthetic_raw(rng)
    for sig in (np.zeros(W),                       # no peaks at all
                np.eye(1, W, W // 4)[0] * 0.9,     # one peak on a fallback
                _corner_heatmap([100.0, 101.0])):  # peaks merged by radius
        cid, z1 = postprocess_cuboid_batch(
            jnp.asarray(bon, jnp.float32)[None],
            jnp.asarray(sig, jnp.float32)[None], H, W)
        cid, z1 = np.asarray(cid), np.asarray(z1)
        assert np.all(np.isfinite(cid)) and np.isfinite(z1[0]), sig.sum()
        assert cid.shape == (1, 8, 2)
        assert (cid >= 0).all() and (cid <= 1).all()


def _synthetic_raw(rng, z1=-80.0):
    """Model-like raw outputs for a random cuboid room."""
    w, d = rng.uniform(4, 10), rng.uniform(3, 8)
    cx, cy = 512 - 0.5, 256 - 0.5
    plan = np.array([[cx - w, cy - d], [cx + w, cy - d],
                     [cx + w, cy + d], [cx - w, cy + d]])
    ceil = xy2coor(plan, 50.0, W, H)
    floor_y = infer_coory(ceil[:, 1], z1 - 50.0, 50.0, H)
    cor = np.empty((8, 2))
    cor[0::2] = ceil
    cor[1::2] = np.stack([ceil[:, 0], floor_y], -1)
    bon = cor_2_1d(cor.astype(np.float32), H, W)
    bon = bon + rng.normal(0, 2e-4, bon.shape)
    y_cor = _corner_heatmap(ceil[:, 0]) + rng.uniform(0, 1e-4, W)
    return bon.astype(np.float64), y_cor


def _synthetic_general_raw(rng, z1=-80.0):
    """Model-like raw outputs for an L-shaped (6-corner) room.

    Outer rect [-w1,w1]x[-d1,d1] minus the top-right block beyond
    (wq, dq); the camera at the plan center sees every wall (the corner
    azimuths are strictly increasing), so the corner order equals the
    polygon order.
    """
    cx, cy = 512 - 0.5, 256 - 0.5
    w1, d1 = rng.uniform(6, 10), rng.uniform(5, 8)
    wq, dq = rng.uniform(2, w1 - 2), rng.uniform(1.5, d1 - 2)
    plan = np.array([
        [cx - w1, cy - d1], [cx + w1, cy - d1], [cx + w1, cy + dq],
        [cx + wq, cy + dq], [cx + wq, cy + d1], [cx - w1, cy + d1]])
    ceil = xy2coor(plan, 50.0, W, H)
    ceil = ceil[np.argsort(ceil[:, 0])]
    floor_y = infer_coory(ceil[:, 1], z1 - 50.0, 50.0, H)
    cor = np.empty((12, 2))
    cor[0::2] = ceil
    cor[1::2] = np.stack([ceil[:, 0], floor_y], -1)
    bon = cor_2_1d(cor.astype(np.float32), H, W)
    bon = bon + rng.normal(0, 2e-4, bon.shape)
    y_cor = _corner_heatmap(ceil[:, 0]) + rng.uniform(0, 1e-4, W)
    return bon.astype(np.float64), y_cor


def test_postprocess_general_batch_matches_host():
    """Fused general-mode serving path == reference-exact host path."""
    from horizonnet_tpu.postproc import (postprocess_general_batch,
                                         finish_general_batch)

    rng = np.random.default_rng(3)
    B = 4
    raws = [_synthetic_general_raw(rng) for _ in range(B)]
    y_bon = np.stack([r[0] for r in raws])
    y_cor = np.stack([r[1] for r in raws])

    outs = postprocess_general_batch(
        jnp.asarray(y_bon, jnp.float32), jnp.asarray(y_cor, jnp.float32),
        H, W)
    results = finish_general_batch(outs, W, H)

    for b in range(B):
        cor_id, z0, z1 = postprocess(y_bon[b], y_cor[b], H, W,
                                     force_cuboid=False)
        cor_id_d, z0_d, z1_d = results[b]
        assert cor_id.shape == (12, 2), b           # found all 6 corners
        assert cor_id_d.shape == cor_id.shape, b
        assert abs(z1_d - z1) < 0.05 * abs(z1)
        assert np.abs(cor_id_d - cor_id).max() < 1.5 / 512, (
            b, np.abs(cor_id_d - cor_id).max())


def test_pack_general_outputs_roundtrip():
    """Packed single-array wire == the 7-leaf tuple, leaf for leaf, and
    finish_general_batch accepts either form identically."""
    from horizonnet_tpu.postproc import (postprocess_general_batch,
                                         pack_general_outputs,
                                         unpack_general_outputs,
                                         finish_general_batch)

    rng = np.random.default_rng(7)
    raws = [_synthetic_general_raw(rng) for _ in range(3)]
    y_bon = jnp.asarray(np.stack([r[0] for r in raws]), jnp.float32)
    y_cor = jnp.asarray(np.stack([r[1] for r in raws]), jnp.float32)

    outs = postprocess_general_batch(y_bon, y_cor, H, W)
    packed = pack_general_outputs(outs)
    assert packed.shape == (3, 9 * 32 + 17)
    unpacked = unpack_general_outputs(packed)
    assert unpacked[0].dtype == np.int32
    for a, b in zip(unpacked, outs):
        assert np.array_equal(np.asarray(a, np.float32),
                              np.asarray(b, np.float32))

    r_tuple = finish_general_batch(outs, W, H)
    r_packed = finish_general_batch(packed, W, H)
    for (ca, za0, za1), (cb, zb0, zb1) in zip(r_tuple, r_packed):
        assert np.array_equal(ca, cb) and za0 == zb0 and za1 == zb1


def test_finish_general_fast_path_matches_scalar():
    """The vectorized alternating-axes tail == the scalar greedy path,
    bit for bit (same dtypes, same op order per element)."""
    from horizonnet_tpu.postproc import (postprocess_general_batch,
                                         finish_general_batch)
    from horizonnet_tpu.postproc.serving import general_from_candidates

    rng = np.random.default_rng(11)
    B = 6
    raws = [_synthetic_general_raw(rng) for _ in range(B)]
    y_bon = jnp.asarray(np.stack([r[0] for r in raws]), jnp.float32)
    y_cor = jnp.asarray(np.stack([r[1] for r in raws]), jnp.float32)
    outs = tuple(np.asarray(a)
                 for a in postprocess_general_batch(y_bon, y_cor, H, W))

    results = finish_general_batch(outs, W, H)
    locs, fit, score, l1, mean, z1, cub = outs
    n_fast = 0
    for b in range(B):
        cor_s, z0_s, z1_s = general_from_candidates(
            locs[b], fit[b], score[b], l1[b], mean[b], z1[b], cub[b], W, H)
        cor_f, z0_f, z1_f = results[b]
        assert np.array_equal(cor_s, cor_f), b
        assert z0_s == z0_f and z1_s == z1_f, b
        n_fast += len(cor_f) == 12          # 6-wall rooms take the fast path
    assert n_fast == B                      # all L-rooms vectorized


def test_postprocess_general_batch_cuboid_fallback():
    """Too few corner peaks -> the same program's cuboid fit is used."""
    from horizonnet_tpu.postproc import (postprocess_general_batch,
                                         finish_general_batch,
                                         postprocess_cuboid_batch)

    rng = np.random.default_rng(4)
    bon, _ = _synthetic_raw(rng)
    sig = np.zeros(W)
    sig[300] = 0.9                                  # a single peak
    yb = jnp.asarray(bon, jnp.float32)[None]
    yc = jnp.asarray(sig, jnp.float32)[None]
    outs = postprocess_general_batch(yb, yc, H, W)
    (cor_id, z0, z1), = finish_general_batch(outs, W, H)
    cub, z1_c = postprocess_cuboid_batch(yb, yc, H, W)
    assert np.array_equal(cor_id, np.asarray(cub)[0])
    assert np.isfinite(z1) and abs(z1 - float(z1_c[0])) < 1e-5


def test_postprocess_cuboid_batch_matches_host():
    rng = np.random.default_rng(2)
    B = 4
    raws = [_synthetic_raw(rng) for _ in range(B)]
    y_bon = np.stack([r[0] for r in raws])
    y_cor = np.stack([r[1] for r in raws])

    cor_id_d, z1_d = postprocess_cuboid_batch(
        jnp.asarray(y_bon, jnp.float32), jnp.asarray(y_cor, jnp.float32),
        H, W)
    cor_id_d = np.asarray(cor_id_d)
    z1_d = np.asarray(z1_d)

    for b in range(B):
        cor_id, z0, z1 = postprocess(y_bon[b], y_cor[b], H, W,
                                     force_cuboid=True)
        assert cor_id.shape == (8, 2)
        assert abs(z1_d[b] - z1) < 0.05 * abs(z1)
        # Sub-pixel agreement in normalized uv (1 px = 1/1024 or 1/512)
        assert np.abs(cor_id_d[b] - cor_id).max() < 1.5 / 512, (
            b, np.abs(cor_id_d[b] - cor_id).max())
