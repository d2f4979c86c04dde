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
from ..geometry.polygon import polygon_is_valid
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


def finish_general_batch(outputs, coorW=1024, coorH=512, z0=50.0):
    """Batch tail: device output tuple -> list of (cor_id, z0, z1)."""
    locs, fit, score, l1, mean, z1, cub = (np.asarray(a) for a in outputs)
    return [general_from_candidates(locs[b], fit[b], score[b], l1[b],
                                    mean[b], z1[b], cub[b], coorW, coorH,
                                    z0)
            for b in range(len(locs))]
