"""2D polygon geometry: area, validity, intersection (shapely replacement).

The reference leans on shapely/GEOS for polygon area, intersection and
validity checks (dataset.py:172-186, inference.py:114-126,
eval_general.py:66-82). This module owns those capabilities:

- ``polygon_area``: shoelace.
- ``polygon_is_valid``: simple-polygon test (pairwise segment intersection).
- ``polygon_intersection_area``: exact intersection area of two simple
  polygons via signed triangle-fan decomposition + convex (Sutherland-
  Hodgman) triangle clipping. For simple polygons this equals the GEOS
  result; for (rare) self-intersecting inputs it degrades to the
  winding-weighted overlap instead of raising, which the callers treat the
  same way as the reference's try/except -> 0 fallbacks.

All routines are host-side numpy on tiny inputs (<= ~1024 vertices).
"""

import numpy as np

_EPS = 1e-12


def polygon_area(pts):
    """Unsigned shoelace area of a closed polygon given as (N, 2)."""
    pts = np.asarray(pts, np.float64)
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def signed_polygon_area(pts):
    """Signed shoelace area (positive if counter-clockwise)."""
    pts = np.asarray(pts, np.float64)
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _segments(pts):
    pts = np.asarray(pts, np.float64)
    return pts, np.roll(pts, -1, axis=0)


def point_segments_intersect(a0, a1, b0, b1):
    """Vectorized proper/improper segment intersection test.

    All inputs broadcast; returns boolean array. Two segments intersect if
    they straddle each other or touch (collinear overlap counts).
    """
    a0 = np.asarray(a0, np.float64)
    a1 = np.asarray(a1, np.float64)
    b0 = np.asarray(b0, np.float64)
    b1 = np.asarray(b1, np.float64)

    def cross(o, p, q):
        return (p[..., 0] - o[..., 0]) * (q[..., 1] - o[..., 1]) - \
               (p[..., 1] - o[..., 1]) * (q[..., 0] - o[..., 0])

    d1 = cross(b0, b1, a0)
    d2 = cross(b0, b1, a1)
    d3 = cross(a0, a1, b0)
    d4 = cross(a0, a1, b1)

    straddle = ((d1 > _EPS) & (d2 < -_EPS) | (d1 < -_EPS) & (d2 > _EPS)) & \
               ((d3 > _EPS) & (d4 < -_EPS) | (d3 < -_EPS) & (d4 > _EPS))

    def on_seg(o, p, q, d):
        # q collinear with segment (o,p) and within its bounding box
        return (np.abs(d) <= _EPS) & \
            (q[..., 0] <= np.maximum(o[..., 0], p[..., 0]) + _EPS) & \
            (q[..., 0] >= np.minimum(o[..., 0], p[..., 0]) - _EPS) & \
            (q[..., 1] <= np.maximum(o[..., 1], p[..., 1]) + _EPS) & \
            (q[..., 1] >= np.minimum(o[..., 1], p[..., 1]) - _EPS)

    touch = on_seg(b0, b1, a0, d1) | on_seg(b0, b1, a1, d2) | \
            on_seg(a0, a1, b0, d3) | on_seg(a0, a1, b1, d4)
    return straddle | touch


def polygon_is_valid(pts):
    """True iff the polygon ring is simple (no self-intersection) and has area.

    Mirrors shapely's Polygon(...).is_valid for the plain rings the pipeline
    produces (inference.py:120). Adjacent edges sharing an endpoint are not
    counted as intersections.
    """
    pts = np.asarray(pts, np.float64)
    n = len(pts)
    if n < 3 or polygon_area(pts) <= _EPS:
        return False
    a0, a1 = _segments(pts)
    i, j = np.triu_indices(n, k=2)
    # Exclude the wrap-around adjacency (first edge vs last edge)
    keep = ~((i == 0) & (j == n - 1))
    i, j = i[keep], j[keep]
    if len(i) == 0:
        return True
    hits = point_segments_intersect(a0[i], a1[i], a0[j], a1[j])
    return not bool(hits.any())


def _clip_convex(subject, cx0, cx1):
    """Sutherland-Hodgman: clip polygon ``subject`` by the half-plane to the
    left of directed edge (cx0 -> cx1). Returns (M, 2) array (possibly empty).
    """
    out = []
    n = len(subject)
    ex, ey = cx1[0] - cx0[0], cx1[1] - cx0[1]

    def side(p):
        return ex * (p[1] - cx0[1]) - ey * (p[0] - cx0[0])

    for k in range(n):
        cur = subject[k]
        prv = subject[k - 1]
        sc, sp = side(cur), side(prv)
        if sc >= -_EPS:
            if sp < -_EPS:
                t = sp / (sp - sc)
                out.append(prv + t * (cur - prv))
            out.append(cur)
        elif sp >= -_EPS:
            t = sp / (sp - sc)
            out.append(prv + t * (cur - prv))
    return np.array(out) if out else np.zeros((0, 2))


def convex_intersection_area(p, q):
    """Area of intersection of two convex polygons (CCW order)."""
    r = np.asarray(p, np.float64)
    q = np.asarray(q, np.float64)
    for k in range(len(q)):
        if len(r) == 0:
            return 0.0
        r = _clip_convex(r, q[k - 1], q[k])
    if len(r) < 3:
        return 0.0
    return abs(signed_polygon_area(r))


def _fan_triangles(pts):
    """Decompose polygon into origin-fan triangles with orientation signs."""
    pts = np.asarray(pts, np.float64)
    o = pts.mean(0)  # fan origin: centroid keeps triangles well-conditioned
    tris, signs = [], []
    n = len(pts)
    for k in range(n):
        a, b = pts[k], pts[(k + 1) % n]
        s = 0.5 * ((a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0]))
        if abs(s) <= _EPS:
            continue
        if s > 0:
            tris.append(np.array([o, a, b]))
            signs.append(1.0)
        else:
            tris.append(np.array([o, b, a]))  # store CCW
            signs.append(-1.0)
    return tris, signs


def polygon_intersection_area(p, q):
    """Intersection area of two simple polygons (any orientation).

    Signed triangle-fan decomposition: 1_P = sum_i s_i * 1_{T_i} holds for a
    simple polygon P oriented CCW, any fan origin. Hence
    area(P & Q) = sum_ij s_i t_j area(T_i & U_j), each term a convex clip.
    """
    p = np.asarray(p, np.float64)
    q = np.asarray(q, np.float64)
    if len(p) < 3 or len(q) < 3:
        return 0.0
    # Normalize to CCW so indicators sum to +1 inside
    if signed_polygon_area(p) < 0:
        p = p[::-1]
    if signed_polygon_area(q) < 0:
        q = q[::-1]
    tp, sp = _fan_triangles(p)
    tq, sq = _fan_triangles(q)
    total = 0.0
    for ti, si in zip(tp, sp):
        # Quick reject on bounding boxes
        ti_min, ti_max = ti.min(0), ti.max(0)
        for uj, tj in zip(tq, sq):
            if (uj.min(0) > ti_max + _EPS).any() or (uj.max(0) < ti_min - _EPS).any():
                continue
            a = convex_intersection_area(ti, uj)
            if a > 0:
                total += si * tj * a
    return max(total, 0.0)


def polygon_iou(p, q):
    """2D IoU of two simple polygons (eval_general.py:77-81 semantics)."""
    area_p = polygon_area(p)
    area_q = polygon_area(q)
    inter = polygon_intersection_area(p, q)
    denom = area_p + area_q - inter
    if denom <= 0:
        return 0.0
    return inter / denom
