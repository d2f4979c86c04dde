"""Manhattan-world wall fitting from the 1D ceiling boundary.

Host-side numpy on tiny arrays. Behavioral contract is the reference's
misc/post_proc.py (cited per function): project the per-column ceiling
boundary onto the floor plane, split columns into wall segments at the
detected corner columns, robustly vote an axis-aligned line per segment,
then commit walls greedily (highest score first) while forcing the x/y wall
types to alternate — inserting or flipping walls when they cannot.
"""

import numpy as np

from ..geometry.equirect import (
    coorx2u, coor2xy, xy2coor, x_u_solve_y, y_u_solve_x,
)


def fuv2img(fuv, coorW=1024, floorW=1024, floorH=512):
    """Project a per-column 1D signal onto the top-down floor plane.

    Each floor-plane pixel samples the signal at the column matching its
    azimuth (linear interpolation, periodic). Ref: misc/post_proc.py:10-19.
    """
    fuv = np.asarray(fuv, np.float64)
    ys, xs = np.meshgrid(np.arange(floorH), np.arange(floorW), indexing="ij")
    px = -(ys - floorH / 2)
    py = xs - floorW / 2
    coridx = (np.arctan2(py, px) / (2 * np.pi) + 0.5) * coorW - 0.5
    lo = np.floor(coridx).astype(int) % coorW
    hi = (lo + 1) % coorW
    w = coridx - np.floor(coridx)
    return fuv[lo] * (1 - w) + fuv[hi] * w


def gpid_two_split(xy, tpid_a, tpid_b):
    """Best split of a segment into two walls of types a then b.

    Maximizes a cumulative-mean separation score over split points; returns
    the mean coordinate of each side. Ref: misc/post_proc.py:150-164.
    """
    m = np.arange(len(xy)) + 1
    cum_a = np.cumsum(xy[:, tpid_a])
    cum_b = np.cumsum(xy[::-1, tpid_b])
    l1_a = cum_a / m - cum_a / (m * m)
    l1_b = (cum_b / m - cum_b / (m * m))[::-1]
    score = l1_a[:-1] + l1_b[1:]
    best_split = score.argmax() + 1
    va = xy[:best_split, tpid_a].mean()
    vb = xy[best_split:, tpid_b].mean()
    return va, vb


def _principal_rot_deg(px, py):
    """Rotation (deg) folding a principal direction into +-45 of an axis."""
    if px < 0:
        px, py = -px, -py
    rad = np.arctan2(py, px) * 180 / np.pi
    if rad > 45:
        return 90 - rad
    if rad < -45:
        return -90 - rad
    return -rad


def get_rot_rad(init_coorx, coory, z=50, coorW=1024, coorH=512,
                floorW=1024, floorH=512, tol=5):
    """Suggest a global pano rotation aligning walls with the plan axes.

    Per wall segment, the dominant plan direction comes from the 2x2
    covariance eigenvector (closed form — the reference reaches for
    sklearn PCA here, misc/post_proc.py:178-202); suggestions cluster
    within ``tol`` degrees and the densest cluster wins.
    Returns (column shift dx, rotation degrees).
    """
    gpid = get_gpid(init_coorx, coorW)
    coor = np.stack([np.arange(coorW), np.asarray(coory)], axis=-1)
    xy = coor2xy(coor, z, coorW, coorH, floorW, floorH)

    suggestions = []
    for j in range(len(init_coorx)):
        pts = xy[gpid == j]
        c = pts - pts.mean(0)
        cov = c.T @ c
        w, v = np.linalg.eigh(cov)
        principal = v[:, np.argmax(w)]
        suggestions.append(_principal_rot_deg(*principal))
    suggestions = np.sort(suggestions + [1e9])

    rot = np.mean(suggestions[:-1])
    best_sz = -1
    last_j = 0
    for j in range(1, len(suggestions)):
        if suggestions[j] - suggestions[j - 1] > tol:
            last_j = j
        elif j - last_j > best_sz:
            rot = suggestions[last_j:j + 1].mean()
            best_sz = j - last_j
    dx = int(round(rot * 1024 / 360))
    return dx, rot


def get_gpid(coorx, coorW):
    """Wall-segment id per column, split at corner columns.

    Ref: misc/post_proc.py:134-139. Segment 0 wraps across the seam.
    """
    gpid = np.zeros(coorW)
    gpid[np.round(coorx).astype(int)] = 1
    gpid = np.cumsum(gpid).astype(int)
    gpid[gpid == gpid[-1]] = 0
    return gpid


def vote(vec, tol):
    """Consensus vote for a dominant coordinate among a segment's samples.

    Finds the largest sorted index span [i, j] whose extreme values lie
    within ``tol`` and which covers >= 40% of the samples; returns the span
    mean, the covered fraction as score, and the L1 residual. Falls back to
    the median with score 0. Ref: misc/post_proc.py:75-98.
    """
    vec = np.sort(np.asarray(vec, np.float64))
    m = len(vec)
    j_idx = np.arange(m)
    span = j_idx[None, :] - j_idx[:, None] + 1            # n(i,j) = j - i + 1
    dist = np.abs(vec[None, :] - vec[:, None])
    dist = dist + np.where(np.eye(m, dtype=bool), 0.0, 1e-9)

    invalid = (span < m * 0.4) | (dist > tol)
    if (~invalid).sum() == 0 or m < tol:
        best_fit = np.median(vec)
        p_score = 0
    else:
        score = np.where(invalid, -1, span)
        flat = int(score.argmax())
        row, col = flat // m, flat % m
        assert col > row
        best_fit = vec[row:col + 1].mean()
        p_score = (col - row + 1) / m

    l1_score = np.abs(vec - best_fit).mean()
    return best_fit, p_score, l1_score


def _segment_candidate(xy, gpid, j, tol):
    """Vote both axes for segment j; pick the better-scoring wall type."""
    now_x = xy[gpid == j, 0]
    now_y = xy[gpid == j, 1]
    new_x, x_score, x_l1 = vote(now_x, tol)
    new_y, y_score, y_l1 = vote(now_y, tol)
    if (x_score, -x_l1) > (y_score, -y_l1):
        return 0, new_x, x_score
    return 1, new_y, y_score


def gen_ww_cuboid(xy, gpid, tol):
    """4-wall fit with alternating-axis sanity fallback.

    Ref: misc/post_proc.py:205-238.
    """
    assert len(np.unique(gpid)) == 4
    walls = []
    for j in range(4):
        tp, val, score = _segment_candidate(xy, gpid, j, tol)
        walls.append({"type": tp, "val": val, "score": score})

    # If the voted types don't alternate, pick the alternation pattern whose
    # member walls carry the higher total score.
    scores = [0.0, 0.0]
    for j in range(4):
        if walls[j]["type"] == 0:
            scores[j % 2] += walls[j]["score"]
        else:
            scores[j % 2] -= walls[j]["score"]
    first = 0 if scores[0] > scores[1] else 1
    for j in range(4):
        walls[j]["type"] = (first + j) % 2
    return walls


def gen_ww_general(init_coorx, xy, gpid, tol):
    """Greedy highest-score-first wall commitment with forced alternation.

    Intrinsically sequential list manipulation over <= ~32 walls; mirrors
    the reference algorithm exactly (misc/post_proc.py:241-334) including
    its score -= 100 retry, forced type flips and corner insertion — IoU
    parity on general layouts depends on these fallbacks.
    """
    n_seg = len(init_coorx)
    assert n_seg == len(np.unique(gpid))

    walls = []
    for j in range(n_seg):
        tp, val, score = _segment_candidate(xy, gpid, j, tol)
        u0 = coorx2u(init_coorx[(j - 1 + n_seg) % n_seg])
        u1 = coorx2u(init_coorx[j])
        walls.append({"type": tp, "val": val, "score": score,
                      "action": "ori", "gpid": j, "u0": u0, "u1": u1,
                      "tbd": True})

    def solve_other(wall, u_key):
        """Corner implied by a committed wall at one of its edge azimuths."""
        if wall["type"] == 0:
            return 1, x_u_solve_y(wall["val"], wall[u_key])
        return 0, y_u_solve_x(wall["val"], wall[u_key])

    while True:
        # Highest-score undetermined wall
        tbd = -1
        for i in range(len(walls)):
            if walls[i]["tbd"] and (tbd == -1 or walls[i]["score"] > walls[tbd]["score"]):
                tbd = i
        if tbd == -1:
            break

        walls[tbd]["tbd"] = False
        p_idx = (tbd - 1 + len(walls)) % len(walls)
        n_idx = (tbd + 1) % len(walls)
        num_tbd_neighbor = walls[p_idx]["tbd"] + walls[n_idx]["tbd"]

        if num_tbd_neighbor == 2:
            continue  # neighbors unknown yet: nothing to reconcile

        if num_tbd_neighbor == 1:
            same_as_prev = (not walls[p_idx]["tbd"]) and walls[p_idx]["type"] == walls[tbd]["type"]
            same_as_next = (not walls[n_idx]["tbd"]) and walls[n_idx]["type"] == walls[tbd]["type"]
            if same_as_prev or same_as_next:
                if walls[tbd]["score"] >= -1:
                    # Defer: retry this wall later at a penalized score
                    walls[tbd]["tbd"] = True
                    walls[tbd]["score"] -= 100
                else:
                    # Deferred twice: force-insert a perpendicular wall
                    if not walls[p_idx]["tbd"]:
                        insert_at = tbd
                        new_type, new_val = solve_other(walls[p_idx], "u1")
                    else:
                        insert_at = n_idx
                        new_type, new_val = solve_other(walls[n_idx], "u0")
                    walls.insert(insert_at, {
                        "type": new_type, "val": new_val, "score": 0,
                        "action": "forced infer", "gpid": -1,
                        "u0": -1, "u1": -1, "tbd": False})
            continue

        # Both neighbors determined
        if walls[p_idx]["type"] == walls[n_idx]["type"]:
            if walls[tbd]["type"] == walls[p_idx]["type"]:
                # Three same-type walls in a row: flip the middle one
                walls[tbd]["type"] = (walls[tbd]["type"] + 1) % 2
                walls[tbd]["action"] = "forced change"
                walls[tbd]["val"] = xy[gpid == walls[tbd]["gpid"],
                                       walls[tbd]["type"]].mean()
        else:
            # Neighbors differ: this span needs TWO walls; replace it with
            # the two corners implied by the neighbors' edge azimuths
            tp0 = walls[n_idx]["type"]
            tp1 = walls[p_idx]["type"]
            _, val0 = solve_other(walls[p_idx], "u1")
            _, val1 = solve_other(walls[n_idx], "u0")
            new_walls = [
                {"type": tp0, "val": val0, "score": 0, "action": "forced infer",
                 "gpid": -1, "u0": -1, "u1": -1, "tbd": False},
                {"type": tp1, "val": val1, "score": 0, "action": "forced infer",
                 "gpid": -1, "u0": -1, "u1": -1, "tbd": False},
            ]
            walls = walls[:tbd] + new_walls + walls[tbd + 1:]

    return walls


def gen_ww(init_coorx, coory, z=50, coorW=1024, coorH=512, floorW=1024,
           floorH=512, tol=3, force_cuboid=True):
    """Full wall fit: project, vote, commit, convert back to pano corners.

    Returns (cor [(N,2) pixel coords, min-x corner first], walls).
    Ref: misc/post_proc.py:337-359.
    """
    gpid = get_gpid(init_coorx, coorW)
    coor = np.stack([np.arange(coorW), np.asarray(coory)], axis=-1)
    xy = coor2xy(coor, z, coorW, coorH, floorW, floorH)

    if force_cuboid:
        walls = gen_ww_cuboid(xy, gpid, tol)
    else:
        walls = gen_ww_general(init_coorx, xy, gpid, tol)

    # Wall-line intersections -> plan corners -> pano coordinates
    cor = []
    for j in range(len(walls)):
        nxt = (j + 1) % len(walls)
        if walls[j]["type"] == 1:
            cor.append((walls[nxt]["val"], walls[j]["val"]))
        else:
            cor.append((walls[j]["val"], walls[nxt]["val"]))
    cor = xy2coor(np.array(cor), z, coorW, coorH, floorW, floorH)
    cor = np.roll(cor, -2 * cor[::2, 0].argmin(), axis=0)
    return cor, walls
