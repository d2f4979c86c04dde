"""gen_ww_general special-case branch coverage.

The greedy wall commitment has three fallback behaviors the reference
relies on for IoU parity (misc/post_proc.py:276-332): deferral with score
penalty leading to a forced perpendicular insert, a forced type flip when
three same-type walls line up, and corner insertion when a wall's
neighbors disagree in type. Each is triggered here with crafted inputs.
"""

import numpy as np

from horizonnet_tpu.postproc import gen_ww_general
from horizonnet_tpu.postproc.manhattan import get_gpid


def _xy_for_segments(seg_specs, coorW=1024):
    """Build (init_coorx, xy, gpid) with per-segment plan points.

    seg_specs: list of (wall_type, value, noise) per segment; segment j's
    points lie on x=value (type 0) or y=value (type 1) with the other
    coordinate sweeping, plus noise controlling the vote score.
    """
    n = len(seg_specs)
    init_coorx = np.linspace(100, 1000, n).astype(int)
    gpid = get_gpid(init_coorx, coorW)
    rng = np.random.default_rng(0)
    xy = np.zeros((coorW, 2))
    for j, (tp, val, noise) in enumerate(seg_specs):
        m = gpid == j
        k = m.sum()
        sweep = np.linspace(400, 600, k)
        if tp == 0:
            xy[m, 0] = val + rng.normal(0, noise, k)
            xy[m, 1] = sweep
        else:
            xy[m, 1] = val + rng.normal(0, noise, k)
            xy[m, 0] = sweep
    return init_coorx, xy, gpid


def test_forced_change_three_same_type():
    """0,1,2 all vote x-walls; the middle one gets force-flipped to y."""
    specs = [(0, 400.0, 0.0), (0, 500.0, 1.0), (0, 600.0, 0.0),
             (1, 300.0, 0.5)]
    init_coorx, xy, gpid = _xy_for_segments(specs)
    walls = gen_ww_general(init_coorx, xy, gpid, tol=20)
    actions = [w.origin for w in walls]
    assert "flipped" in actions
    flipped = walls[actions.index("flipped")]
    assert flipped.axis == 1


def test_corner_insertion_between_mixed_neighbors():
    """A junk wall between an x-wall and a y-wall is replaced by two
    inferred corner walls."""
    specs = [(0, 400.0, 0.0),      # strong x wall
             (0, 480.0, 60.0),     # junk (low score)
             (1, 350.0, 0.1),      # strong y wall
             (0, 650.0, 0.2),
             (1, 200.0, 0.3)]
    init_coorx, xy, gpid = _xy_for_segments(specs)
    walls = gen_ww_general(init_coorx, xy, gpid, tol=20)
    actions = [w.origin for w in walls]
    assert "inferred" in actions
    assert len(walls) >= len(specs)  # insertion grew the wall list


def test_deferral_then_forced_insert_all_same_type():
    """Three segments all voting x-walls: the weaker two defer (score -100)
    and the machinery must terminate via forced handling, never looping."""
    specs = [(0, 400.0, 0.0), (0, 500.0, 2.0), (0, 600.0, 4.0)]
    init_coorx, xy, gpid = _xy_for_segments(specs)
    walls = gen_ww_general(init_coorx, xy, gpid, tol=20)
    # Terminated with every wall determined
    assert all(not w.pending for w in walls)
    actions = [w.origin for w in walls]
    assert ("inferred" in actions) or ("flipped" in actions)


def test_plain_alternating_path_untouched():
    """A clean alternating room takes no fallback branch at all."""
    specs = [(0, 400.0, 0.1), (1, 350.0, 0.1), (0, 650.0, 0.1),
             (1, 150.0, 0.1)]
    init_coorx, xy, gpid = _xy_for_segments(specs)
    walls = gen_ww_general(init_coorx, xy, gpid, tol=20)
    assert [w.origin for w in walls] == ["vote"] * 4
    assert [w.axis for w in walls] == [0, 1, 0, 1]
