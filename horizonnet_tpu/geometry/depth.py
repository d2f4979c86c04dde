"""Analytic layout -> per-pixel depth rendering.

Used by eval_general's rmse/delta_1 metrics and the 3D viewer.
Reference behavior: eval_general.py:14-53 (layout_2_depth).
"""

import numpy as np

from .lines import cor_2_1d


def layout_2_depth(cor_id, h, w, return_mask=False, floor_h=1.6):
    """Render layout depth: floor/ceiling planes + vertical walls.

    ``cor_id`` is the (2N, 2) pixel-coordinate corner list (ceiling/floor
    interleaved). The camera sits ``floor_h`` meters above the floor.
    Ref: eval_general.py:14-53.
    """
    vc, vf = cor_2_1d(cor_id, h, w)  # down-positive latitude per column
    vc = vc[None, :]
    vf = vf[None, :]
    assert (vc > 0).sum() == 0, "ceiling boundary must be above the horizon"
    assert (vf < 0).sum() == 0, "floor boundary must be below the horizon"

    # Per-pixel down-positive latitude
    vs = ((np.arange(h) + 0.5) / h - 0.5) * np.pi
    vs = np.repeat(vs[:, None], w, axis=1)

    floor_d = np.abs(floor_h / np.sin(vs))
    cs = floor_h / np.tan(vf)                 # horizontal wall distance per column
    ceil_h = np.abs(cs * np.tan(vc))          # ceiling height per column
    ceil_d = np.abs(ceil_h / np.sin(vs))
    wall_d = np.abs(cs / np.cos(vs))

    floor_mask = vs > vf
    ceil_mask = vs < vc
    wall_mask = (~floor_mask) & (~ceil_mask)
    depth = np.zeros([h, w], np.float32)
    depth[floor_mask] = floor_d[floor_mask]
    depth[ceil_mask] = ceil_d[ceil_mask]
    depth[wall_mask] = wall_d[wall_mask]

    assert (depth == 0).sum() == 0, "degenerate layout produced zero depth"
    if return_mask:
        return depth, floor_mask, ceil_mask, wall_mask
    return depth
