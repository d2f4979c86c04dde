"""Host tail of the fused general-layout serving path.

The device program (postproc/device.py postprocess_general_batch) ships a
per-pano candidate summary: peak columns, per-(segment, axis) vote
fits/scores/L1s and segment means, the robust z1, and a ready cuboid
fallback. This module turns one pano's summary into the final corner
list: build Wall candidates exactly as the host voter would
(postproc/manhattan.py _segment_candidate tie-break), run the greedy
commitment ring, check plan validity, and fall back to the device cuboid
fit on failure (ref inference.py:104-141).

Everything here is O(#walls <= 32) scalar work — the intrinsically
sequential part the reference also runs on host.
"""

import sys

import numpy as np

from ..geometry.equirect import coorx2u, infer_coory, xy2coor
from ..geometry.polygon import polygon_is_valid, polygon_is_valid_batch
from .manhattan import Wall, _GreedyRing


def corners_from_walls(walls, z1, z0=50.0, coorW=1024, coorH=512):
    """Committed wall ring -> normalized uv corner list (ceiling/floor
    interleaved), the tail of inference.postprocess (ref
    inference.py:129-141 + misc/post_proc.py:349-359)."""
    cor = []
    for j in range(len(walls)):
        nxt = (j + 1) % len(walls)
        if walls[j].axis == 1:
            cor.append((walls[nxt].value, walls[j].value))
        else:
            cor.append((walls[j].value, walls[nxt].value))
    cor = xy2coor(np.array(cor), z0, coorW, coorH)
    cor = np.roll(cor, -2 * cor[::2, 0].argmin(), axis=0)

    cor = np.hstack([cor, infer_coory(cor[:, 1], z1 - z0, z0,
                                      coorH=coorH)[:, None]])
    cor_id = np.zeros((len(cor) * 2, 2), np.float32)
    for j in range(len(cor)):
        cor_id[j * 2] = cor[j, 0], cor[j, 1]
        cor_id[j * 2 + 1] = cor[j, 0], cor[j, 2]
    cor_id[:, 0] /= coorW
    cor_id[:, 1] /= coorH
    return cor_id


def general_from_candidates(locs, fit, score, l1, mean, z1, cuboid_cor_id,
                            coorW=1024, coorH=512, z0=50.0):
    """One pano's device candidate summary -> (cor_id, z0, z1).

    locs [K] int32 (-1 padding); fit/score/l1/mean [K, 2]; z1 scalar;
    cuboid_cor_id [8, 2] the same program's cuboid fit, used verbatim
    when the greedy produces an invalid (self-intersecting) plan or too
    few corners were detected.
    """
    z1 = float(z1)
    xs = locs[locs >= 0]
    if len(xs) < 2:
        return np.asarray(cuboid_cor_id), z0, z1

    walls = []
    n = len(xs)
    for j in range(n):
        # Same axis pick as the host voter (_segment_candidate):
        # higher score wins, lower L1 breaks ties, y on a full tie
        if (score[j, 0], -l1[j, 0]) > (score[j, 1], -l1[j, 1]):
            axis = 0
        else:
            axis = 1
        walls.append(Wall(axis=axis, value=float(fit[j, axis]),
                          score=float(score[j, axis]), seg=j,
                          u0=coorx2u(xs[(j - 1) % n], coorW),
                          u1=coorx2u(xs[j], coorW), pending=True))
    walls = _GreedyRing(
        walls, lambda seg, axis: float(mean[seg, axis])).run()

    # Reference's self-intersection guard (inference.py:114-126)
    xy2d = np.zeros((len(walls), 2), np.float32)
    for i in range(len(walls)):
        xy2d[i, walls[i].axis] = walls[i].value
        xy2d[i, walls[i - 1].axis] = walls[i - 1].value
    if not polygon_is_valid(xy2d):
        print("Fail to generate valid general layout!! "
              "Generate cuboid as fallback.", file=sys.stderr)
        return np.asarray(cuboid_cor_id), z0, z1

    cor_id = corners_from_walls(walls, z1, z0, coorW, coorH)
    return cor_id, z0, z1


def unpack_cuboid_outputs(packed):
    """Host twin of device.pack_cuboid_outputs: ONE [B, 17] f32 array ->
    (cor_id [B, 8, 2], z1 [B]). Also accepts the raw (cor_id, z1) tuple
    for callers holding unpacked device outputs."""
    if isinstance(packed, (tuple, list)):
        cor_id, z1 = packed
        return np.asarray(cor_id), np.asarray(z1)
    packed = np.asarray(packed, np.float32)
    return packed[:, :16].reshape(-1, 8, 2), packed[:, 16]


def unpack_general_outputs(packed):
    """Host twin of device.pack_general_outputs: ONE [B, 9K+17] f32 array
    -> (locs, fit, score, l1, mean, z1, cuboid_cor_id). K is inferred
    from the width. One np.asarray = one device->host fetch (the remote
    transport charges fixed latency per fetched array)."""
    packed = np.asarray(packed, np.float32)
    B, D = packed.shape
    K = (D - 17) // 9
    assert 9 * K + 17 == D, D
    locs = packed[:, :K].astype(np.int32)
    o = K
    planes = []
    for _ in range(4):                       # fit, score, l1, mean
        planes.append(packed[:, o:o + 2 * K].reshape(B, K, 2))
        o += 2 * K
    z1 = packed[:, o]
    cub = packed[:, o + 1:].reshape(B, 8, 2)
    return (locs, *planes, z1, cub)


def _finish_alternating_group(bs, nb, axis, fit, z1, cub, coorW, coorH,
                              z0, results):
    """Vectorized tail for a group of panos sharing wall count ``nb``
    whose candidate axes already alternate around the ring.

    For an alternating even ring the greedy commitment is the identity
    (no DEFER/INSERT/RESOLVE move ever fires — every committed neighbor
    has the opposite axis), so the whole tail reduces to elementwise
    numpy over the group: xy-plan assembly, the validity check, and the
    corner back-projection — the exact computations the scalar path
    performs, batched. Results are bit-identical to
    general_from_candidates (same dtypes, same op order per element).
    """
    G = len(bs)
    ax = axis[bs, :nb]                                       # [G, nb]
    val = np.take_along_axis(fit[bs, :nb].astype(np.float64),
                             ax[..., None], -1)[..., 0]      # [G, nb] f64

    # Plan ring (float32, as the scalar path builds it) + validity
    gi = np.arange(G)[:, None]
    wi = np.arange(nb)[None, :]
    xy2d = np.zeros((G, nb, 2), np.float32)
    xy2d[gi, wi, ax] = val
    xy2d[gi, wi, 1 - ax] = np.roll(val, 1, axis=1)           # walls[i-1]
    ok = polygon_is_valid_batch(xy2d)

    # Corner back-projection (corners_from_walls, batched)
    val_n = np.roll(val, -1, axis=1)                         # walls[j+1]
    corx = np.where(ax == 1, val_n, val)
    cory = np.where(ax == 1, val, val_n)
    cor = xy2coor(np.stack([corx, cory], -1), z0, coorW, coorH)
    shift = cor[:, ::2, 0].argmin(axis=1)
    order = (wi + 2 * shift[:, None]) % nb
    cor = np.take_along_axis(cor, order[..., None], axis=1)
    z1g = z1[bs].astype(np.float64)
    fy = infer_coory(cor[..., 1], z1g[:, None] - z0, z0, coorH=coorH)
    cor_id = np.zeros((G, nb * 2, 2), np.float32)
    cor_id[:, 0::2] = cor
    cor_id[:, 1::2, 0] = cor[..., 0]
    cor_id[:, 1::2, 1] = fy
    cor_id[..., 0] /= coorW
    cor_id[..., 1] /= coorH

    for g, b in enumerate(bs):
        if ok[g]:
            results[b] = (cor_id[g], z0, float(z1g[g]))
        else:
            print("Fail to generate valid general layout!! "
                  "Generate cuboid as fallback.", file=sys.stderr)
            results[b] = (np.asarray(cub[b]), z0, float(z1g[g]))


def finish_general_batch(outputs, coorW=1024, coorH=512, z0=50.0):
    """Batch tail: device output (packed [B, 9K+17] array, or the
    7-leaf tuple postprocess_general_batch returns) -> list of
    (cor_id, z0, z1).

    Panos whose candidate axes already alternate (the common Manhattan
    case — the greedy ring is the identity on them) are finished in one
    vectorized numpy pass per wall-count group; the rest take the exact
    scalar greedy. At batch 64 this tail runs inline in the serving
    loop's host thread, so its cost trades 1:1 against panos/sec.
    """
    if isinstance(outputs, (tuple, list)):
        locs, fit, score, l1, mean, z1, cub = (np.asarray(a)
                                               for a in outputs)
    else:
        locs, fit, score, l1, mean, z1, cub = unpack_general_outputs(
            outputs)
    B = len(locs)
    n = (locs >= 0).sum(-1)                                  # valid peaks
    # Axis pick, host tuple-compare semantics (_segment_candidate)
    pick_x = (score[..., 0] > score[..., 1]) | (
        (score[..., 0] == score[..., 1]) & (l1[..., 0] < l1[..., 1]))
    axis = np.where(pick_x, 0, 1)

    results = [None] * B
    groups = {}
    for b in range(B):
        nb = int(n[b])
        if nb >= 4 and nb % 2 == 0:
            ax = axis[b, :nb]
            if np.all(ax != np.roll(ax, 1)):
                groups.setdefault(nb, []).append(b)
                continue
        results[b] = general_from_candidates(
            locs[b], fit[b], score[b], l1[b], mean[b], z1[b], cub[b],
            coorW, coorH, z0)
    for nb, bs in groups.items():
        _finish_alternating_group(np.asarray(bs), nb, axis, fit, z1, cub,
                                  coorW, coorH, z0, results)
    return results
