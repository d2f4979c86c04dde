"""Batched on-device cuboid post-processing (static shapes, jit-safe).

Device replica of ``inference.postprocess(force_cuboid=True)`` — the
reference's serving-path host work (inference.py:90-141 + the cuboid half
of misc/post_proc.py): boundary denormalization, robust z1 estimation,
corner peak finding, floor-plane projection, the per-segment consensus
``vote``, the cuboid alternation fix, and the corner back-projection.

Everything here is shape-static and batched over panos, so it fuses into
the model forward as one XLA program: the host receives only the final
``[B, 8, 2]`` corner array instead of ``[B, 3, W]`` raw outputs — which
removes the per-pano host round-trip that dominated round-1 serving.

The greedy general-layout commitment (gen_ww_general) stays on host: it
mutates a wall ring with insertions (SURVEY.md §7 "hard parts"). But its
INPUTS — peaks, projection, per-segment votes and means — are data-parallel
and run here (postprocess_general_batch), so general-mode serving ships
only a ~1.3 KB candidate summary per pano to the host greedy
(postproc/serving.py) instead of the [3, W] raw outputs.

Numerics: float32 on device vs the host path's float64. The ``vote`` span
search compares distances against a tolerance, so adversarial inputs near
the tolerance boundary can pick a different span; on real model outputs the
corner coordinates agree with the host path to well under a pixel (see
tests/test_postproc_device.py).
"""

import jax
import jax.numpy as jnp

from ..geometry.equirect import (PI, coor2xy, coory2v_up, infer_coory,
                                 mean_percentile, xy2coor)
from ..ops.filters import circular_max_filter_1d, find_peaks_device


def vote_sorted(svals, m, tol):
    """Consensus vote over pre-sorted, +inf-padded sample rows.

    ``svals [..., W]`` ascending with ``m [...]`` valid entries followed by
    +inf padding; ``tol [...]`` per-row tolerance. Returns
    ``(best_fit, p_score, l1_score)`` with the semantics of the host
    ``postproc.manhattan.vote`` (ref misc/post_proc.py:75-98): the longest
    sorted span whose extremes lie within tol (strictly, +1e-9 for distinct
    pairs) and which covers >= 40% of the samples wins; earliest start
    index breaks ties (matching np.argmax over the row-major span matrix);
    fall back to the median with score 0 when no span qualifies or m < tol.
    """
    W = svals.shape[-1]
    idx = jnp.arange(W)
    valid_entry = idx < m[..., None]
    sz = jnp.where(valid_entry, svals, 0.0)
    cs0 = jnp.concatenate(
        [jnp.zeros((*sz.shape[:-1], 1), sz.dtype), jnp.cumsum(sz, -1)], -1)

    # For each span start i, the end of the longest admissible span is the
    # last j with svals[j] <= svals[i] + tol - 1e-9 (the host adds 1e-9 to
    # every off-diagonal distance); the (i, i) singleton is always valid.
    q = svals + (tol[..., None] - 1e-9)
    flat_a = svals.reshape(-1, W)
    flat_q = q.reshape(-1, W)
    # method="sort" (one concatenated sort per row) — the default "scan"
    # lowers to a serial binary-search loop that dominated the whole
    # serving program on TPU (59 of 84 ms/batch-32, traced)
    ss = jax.vmap(lambda a, v: jnp.searchsorted(
        a, v, side="right", method="sort"))(flat_a, flat_q)
    ss = ss.reshape(svals.shape)
    ss = jnp.maximum(ss, idx + 1)
    span = ss - idx

    ok = valid_entry & (span >= 0.4 * m[..., None])
    best_i = jnp.argmax(jnp.where(ok, span, -1), -1)
    bi = best_i[..., None]
    span_b = jnp.take_along_axis(span, bi, -1)[..., 0]
    ss_b = jnp.take_along_axis(ss, bi, -1)
    sum_b = (jnp.take_along_axis(cs0, ss_b, -1)
             - jnp.take_along_axis(cs0, bi, -1))[..., 0]
    span_fit = sum_b / span_b

    # Median fallback (np.median semantics over the m valid entries);
    # an empty row (m == 0, all padding) yields 0.0 rather than reading
    # the +inf padding — defense in depth, find_4_peaks guarantees every
    # segment is non-empty
    lo_i = jnp.maximum((m - 1) // 2, 0)[..., None]
    hi_i = jnp.maximum(m // 2, 0)[..., None]
    med = 0.5 * (jnp.take_along_axis(svals, lo_i, -1)
                 + jnp.take_along_axis(svals, hi_i, -1))[..., 0]
    med = jnp.where(m > 0, med, 0.0)

    has = jnp.any(ok, -1) & (m >= tol)
    best_fit = jnp.where(has, span_fit, med)
    p_score = jnp.where(has, span_b / jnp.maximum(m, 1), 0.0)
    l1 = jnp.sum(jnp.where(valid_entry,
                           jnp.abs(svals - best_fit[..., None]), 0.0),
                 -1) / jnp.maximum(m, 1)
    return best_fit, p_score, l1


def find_4_peaks(signal, r_px):
    """Top-4 corner columns, sorted; device twin of the force_cuboid peak
    find (ref inference.py:21-29 with min_v=0, N=4).

    Degenerate signals with < 4 local maxima (where the host path would
    crash on the 4-wall assert) fall back to evenly spaced columns.
    """
    W = signal.shape[-1]
    mx = circular_max_filter_1d(signal, r_px)
    cand = jnp.where((mx == signal) & (signal > 0.0), signal, -jnp.inf)
    # Seed the 4 evenly spaced fallback columns with tiny distinct values
    # BEFORE top_k: real peaks (post-sigmoid, >> 1e-12) always outrank
    # them, and because top_k indices are distinct by construction the 4
    # returned columns can never collide (a fallback slot equal to a
    # valid peak would otherwise duplicate it, emptying one wall segment
    # and sending its vote to the +inf padding).
    bump = jnp.full((W,), -jnp.inf).at[jnp.arange(4) * (W // 4)].set(
        jnp.arange(4, 0, -1) * 1e-12)
    _, locs = jax.lax.top_k(jnp.maximum(cand, bump), 4)
    return jnp.sort(locs, -1)


def _plan_projection(y_bon, H, W, z0):
    """Shared front half of both postproc modes: denormalized boundaries,
    robust second-plane height z1, vote tolerance, and the ceiling
    boundary projected onto the floor plane (ref inference.py:90-97).
    XLA CSEs this when the cuboid fallback shares a program with the
    general candidates."""
    B = y_bon.shape[0]
    bon = (y_bon / PI + 0.5) * H - 0.5
    ceil = jnp.clip(bon[:, 0], 1, H / 2 - 1)
    floor = jnp.clip(bon[:, 1], H / 2 + 1, H - 2)

    # refine_by_fix_z: robust second-plane height (ref post_proc.py:109-123)
    c0 = z0 / jnp.tan(coory2v_up(ceil, H))
    z1 = mean_percentile(c0 * jnp.tan(coory2v_up(floor, H)), axis=-1)
    tol = jnp.abs(0.16 * z1 / 1.6)

    cols = jnp.arange(W)
    colsf = jnp.broadcast_to(cols.astype(ceil.dtype), (B, W))
    xy = coor2xy(jnp.stack([colsf, ceil], -1), z0, W, H)   # [B, W, 2]
    return z1, tol, xy


def _segment_votes(xy, gpid, tol, n_seg):
    """Per (segment, axis) consensus vote + plain segment means.

    gpid [B, W] segment id per column in [0, n_seg); returns
    (fit, score, l1, mean) each [B, n_seg, 2].

    Two equivalent engines (pinned against each other in
    tests/test_postproc_device.py): the padded-row form has smaller
    constants and wins at the cuboid's 4 segments (device 612 vs 586
    panos/s at batch 64); the grouped single-lexsort form wins
    asymptotically and carries the general mode's 32 segments (518 vs
    the padded form's 325).
    """
    if n_seg <= 4:
        return _segment_votes_padded(xy, gpid, tol, n_seg)
    return _segment_votes_grouped(xy, gpid, tol, n_seg)


def _segment_votes_padded(xy, gpid, tol, n_seg):
    """vote_sorted over [B, n_seg, 2, W] masked per-segment rows."""
    B, W, _ = xy.shape
    seg_mask = gpid[:, None, :] == jnp.arange(n_seg)[None, :, None]
    vals_ax = jnp.transpose(xy, (0, 2, 1))                         # [B,2,W]
    masked = jnp.where(seg_mask[:, :, None, :], vals_ax[:, None],
                       jnp.inf)                                # [B,n,2,W]
    svals = jnp.sort(masked, -1)
    m = jnp.broadcast_to(seg_mask.sum(-1)[..., None], (B, n_seg, 2))
    fit, sc, l1 = vote_sorted(svals, m, jnp.broadcast_to(
        tol[:, None, None], (B, n_seg, 2)))
    seg_sum = jnp.where(seg_mask[:, :, None, :], vals_ax[:, None],
                        0.0).sum(-1)
    mean = seg_sum / jnp.maximum(m, 1)
    return fit, sc, l1, mean


def _segment_votes_grouped(xy, gpid, tol, n_seg):
    """Same contract as _segment_votes, WITHOUT
    materializing [B, n_seg, 2, W] padded rows: the W columns partition
    into the segments, so one exact (segment, value) lexsort per axis
    (two stable argsorts — no composite float keys, no precision loss)
    makes every segment a contiguous ascending run of ONE [B, 2, W]
    array, and the span search becomes a 3-key merge sort of 2W elements
    instead of a per-segment searchsorted. At n_seg=32 this replaces the
    [4096, 2048] sort + rank machinery that dominated the general-mode
    device program (traced at ~90 of 231 ms/step, batch 64) with
    [128, 2048]-sized work.
    """
    B, W, _ = xy.shape
    vals = jnp.transpose(xy, (0, 2, 1))                      # [B, 2, W]
    seg = jnp.broadcast_to(gpid[:, None, :], vals.shape)     # [B, 2, W]

    # exact lexsort by (segment, value): stable argsort by value, then
    # stable argsort by segment of that arrangement
    idx1 = jnp.argsort(vals, axis=-1, stable=True)
    seg1 = jnp.take_along_axis(seg, idx1, -1)
    order = jnp.take_along_axis(idx1, jnp.argsort(seg1, axis=-1,
                                                  stable=True), -1)
    v = jnp.take_along_axis(vals, order, -1)        # grouped, asc per seg
    s = jnp.take_along_axis(seg, order, -1)

    # segment sizes and exclusive starts (identical for both axes)
    m_seg = (gpid[:, :, None]
             == jnp.arange(n_seg)[None, None, :]).sum(1)     # [B, n_seg]
    start = (jnp.cumsum(m_seg, -1) - m_seg)[:, None, :]      # [B, 1, n_seg]
    m2 = m_seg[:, None, :]                                   # [B, 1, n_seg]

    # Span search, host ``vote`` semantics (ref post_proc.py:75-98): for
    # each start i, ss(i) = #entries j in i's segment with
    # v[j] <= v[i] + tol - 1e-9 (global index — previous segments' counts
    # cancel in the span). One lexicographic merge of (entries, queries):
    # queries sort after equal-valued entries via the flag key, and the
    # rank of a query = its merge position minus the queries before it.
    q = v + (tol[:, None, None] - 1e-9)
    key_seg = jnp.concatenate([s, s], -1)                    # [B, 2, 2W]
    key_val = jnp.concatenate([v, q], -1)
    key_flag = jnp.concatenate([jnp.zeros_like(s), jnp.ones_like(s)], -1)
    _, _, sflag = jax.lax.sort((key_seg, key_val, key_flag),
                               num_keys=3, dimension=-1)
    cnt_q = jnp.cumsum(sflag, -1)                            # queries <= p
    rank = jnp.arange(2 * W) - cnt_q + 1                     # entries <= q
    # The queries keep their original order in the merge (stable lexsort,
    # q ascending within segments), so the k-th flagged position holds
    # query k: compact by scattering rank to k = cnt_q - 1.
    k = jnp.where(sflag == 1, cnt_q - 1, W)                  # W -> dropped
    ss = jnp.zeros((B, 2, W), jnp.int32)
    bi = jnp.arange(B)[:, None, None]
    ai = jnp.arange(2)[None, :, None]
    ss = ss.at[bi, ai, k].set(rank, mode="drop")

    idx = jnp.arange(W)
    ss = jnp.maximum(ss, idx + 1)
    span = ss - idx

    m_i = jnp.take_along_axis(m2, s, -1)                     # [B, 2, W]
    ok = span >= 0.4 * m_i
    # best span per segment, earliest start breaking ties (the host
    # argmax over the row-major span matrix): encode (span, -i_local)
    # into one int32 and segment-max over the contiguous runs
    start_i = jnp.take_along_axis(jnp.broadcast_to(start, (B, 2, n_seg)),
                                  s, -1)
    i_local = idx - start_i
    enc = jnp.where(ok, span * (W + 1) + (W - 1 - i_local), -1)
    rows = (jnp.arange(B * 2)[:, None] * n_seg).reshape(B, 2, 1)
    sid = (rows + s).reshape(-1)
    best = jax.ops.segment_max(enc.reshape(-1), sid,
                               num_segments=B * 2 * n_seg,
                               indices_are_sorted=True).reshape(B, 2, n_seg)
    has_span = best >= 0
    best = jnp.maximum(best, 0)
    span_b = best // (W + 1)
    i_b = start + (W - 1 - best % (W + 1))                   # [B, 2, n_seg]
    ss_b = i_b + span_b

    cs0 = jnp.concatenate(
        [jnp.zeros((B, 2, 1), v.dtype), jnp.cumsum(v, -1)], -1)
    sum_b = (jnp.take_along_axis(cs0, ss_b, -1)
             - jnp.take_along_axis(cs0, i_b, -1))
    span_fit = sum_b / jnp.maximum(span_b, 1)

    # median fallback over each contiguous run (np.median semantics);
    # empty segments (start may be W) clamp their gather and are masked
    lo = jnp.minimum(start + jnp.maximum((m2 - 1) // 2, 0), W - 1)
    hi = jnp.minimum(start + jnp.maximum(m2 // 2, 0), W - 1)
    med = 0.5 * (jnp.take_along_axis(v, lo, -1)
                 + jnp.take_along_axis(v, hi, -1))
    med = jnp.where(m2 > 0, med, 0.0)

    has = has_span & (m2 >= tol[:, None, None])
    fit = jnp.where(has, span_fit, med)
    p_score = jnp.where(has, span_b / jnp.maximum(m2, 1), 0.0)

    fit_i = jnp.take_along_axis(fit, s, -1)                  # [B, 2, W]
    ca0 = jnp.concatenate(
        [jnp.zeros((B, 2, 1), v.dtype),
         jnp.cumsum(jnp.abs(v - fit_i), -1)], -1)
    seg_end = start + m2
    l1 = (jnp.take_along_axis(ca0, seg_end, -1)
          - jnp.take_along_axis(ca0, start + 0 * m2, -1)) / jnp.maximum(m2, 1)
    mean = (jnp.take_along_axis(cs0, seg_end, -1)
            - jnp.take_along_axis(cs0, start + 0 * m2, -1)) / jnp.maximum(m2,
                                                                          1)

    tr = lambda a: jnp.transpose(a, (0, 2, 1))  # noqa: E731
    return tr(fit), tr(p_score), tr(l1), tr(mean)


def postprocess_cuboid_batch(y_bon, y_cor, H=512, W=1024, z0=50.0, r=0.05):
    """Full cuboid postprocess for a batch of raw model outputs.

    y_bon [B, 2, W] boundary angles (radians); y_cor [B, W] corner
    probability (post-sigmoid). Returns (cor_id [B, 8, 2] normalized uv
    interleaved ceiling/floor, z1 [B]); z0 is the fixed 50.0 of the
    reference (inference.py:96).
    """
    B = y_bon.shape[0]
    z1, tol, xy = _plan_projection(y_bon, H, W, z0)

    # Corner columns and the wall-segment id of every column
    r_px = int(round(W * r / 2))
    locs = find_4_peaks(y_cor, r_px)                       # [B, 4]
    cols = jnp.arange(W)
    gpid = (cols[None, :, None] >= locs[:, None, :]).sum(-1) % 4   # [B, W]

    fit, sc, l1, _ = _segment_votes(xy, gpid, tol, 4)

    # Candidate wall per segment: better-scoring axis wins, L1 breaks ties
    # (x on strict win, y on full tie — host tuple compare semantics)
    pick_x = (sc[..., 0] > sc[..., 1]) | (
        (sc[..., 0] == sc[..., 1]) & (l1[..., 0] < l1[..., 1]))
    val = jnp.where(pick_x, fit[..., 0], fit[..., 1])      # [B, 4]
    score = jnp.where(pick_x, sc[..., 0], sc[..., 1])

    # Cuboid alternation fix (ref post_proc.py:224-237): choose the parity
    # whose member walls carry the higher signed score total
    signed = jnp.where(pick_x, score, -score)
    first = jnp.where(signed[:, 0] + signed[:, 2]
                      > signed[:, 1] + signed[:, 3], 0, 1)
    types = (first[:, None] + jnp.arange(4)[None, :]) % 2  # [B, 4]

    # Wall-line intersections -> plan corners -> pano pixel coords
    val_n = jnp.roll(val, -1, axis=1)
    corx = jnp.where(types == 1, val_n, val)
    cory = jnp.where(types == 1, val, val_n)
    cor = xy2coor(jnp.stack([corx, cory], -1), z0, W, H)   # [B, 4, 2]
    shift = 2 * jnp.argmin(cor[:, ::2, 0], axis=1)
    order = (jnp.arange(4)[None, :] + shift[:, None]) % 4
    cor = jnp.take_along_axis(cor, order[..., None], axis=1)

    # Floor row of every corner from its ceiling row (ref inference.py:129)
    fy = infer_coory(cor[..., 1], z1[:, None] - z0, z0, H)
    cor_id = jnp.stack(
        [jnp.stack([cor[..., 0], cor[..., 1]], -1),
         jnp.stack([cor[..., 0], fy], -1)], axis=2).reshape(B, 8, 2)
    cor_id = cor_id / jnp.asarray([W, H], cor_id.dtype)
    return cor_id, z1


def pack_cuboid_outputs(outs):
    """Concatenate the cuboid fit (cor_id [B, 8, 2], z1 [B]) into ONE
    [B, 17] f32 array — same motivation as pack_general_outputs: the
    remote transport charges a fixed per-array latency on every
    device->host fetch, so the serving host should pay exactly one.
    Host twin: serving.unpack_cuboid_outputs."""
    cor_id, z1 = outs
    B = cor_id.shape[0]
    return jnp.concatenate(
        [cor_id.reshape(B, 16), z1.reshape(B, 1).astype(jnp.float32)],
        axis=-1)


def pack_general_outputs(outs):
    """Concatenate the general candidate summary into ONE [B, 9K+17] f32
    array (K = max_peaks).

    The serving engine ships this instead of the 7-leaf tuple because the
    remote host<->device transport charges a fixed per-array latency on
    EVERY fetch: at batch 64 the 7 separate ``np.asarray`` fetches cost
    more wall time than the device program itself (round-5 measurement —
    general-mode serving was 364 ms/batch against a 119 ms device
    program). All components are exactly representable in f32 (peak
    columns <= W+1 << 2**24). Host twin: serving.unpack_general_outputs.
    """
    locs, fit, sc, l1, mean, z1, cub = outs
    B = locs.shape[0]
    return jnp.concatenate(
        [locs.astype(jnp.float32), fit.reshape(B, -1), sc.reshape(B, -1),
         l1.reshape(B, -1), mean.reshape(B, -1),
         z1.reshape(B, 1).astype(jnp.float32), cub.reshape(B, -1)], axis=-1)


def postprocess_general_batch(y_bon, y_cor, H=512, W=1024, z0=50.0,
                              r=0.05, min_v=0.05, max_peaks=32):
    """Device half of the general-layout (non-cuboid) serving postproc.

    Everything data-parallel over columns runs here fused with the
    forward: peak finding (ops/filters.py find_peaks_device), the
    floor-plane projection, and the per-(segment, axis) consensus votes +
    means for up to ``max_peaks`` wall segments. The host receives only
    ~1.3 KB/pano of candidates (vs [3, W] raw outputs) and runs the tiny
    sequential greedy commitment (postproc/serving.py) on them. The
    cuboid fit is computed in the SAME program so the host has the
    reference's invalid-layout fallback (ref inference.py:114-126) at
    zero extra round-trips; XLA CSEs the shared projection stage.

    Returns (locs [B, K] int32 sorted w/ -1 padding, fit [B, K, 2],
    score [B, K, 2], l1 [B, K, 2], mean [B, K, 2], z1 [B],
    cuboid_cor_id [B, 8, 2]).
    """
    z1, tol, xy = _plan_projection(y_bon, H, W, z0)

    r_px = int(round(W * r / 2))
    locs, _, valid = find_peaks_device(y_cor, r=r_px, min_v=min_v,
                                       max_peaks=max_peaks)
    n_valid = valid.sum(-1)                                # [B]

    # Reference gpid semantics (misc/post_proc.py:134-139): segment id =
    # number of peak columns <= col, with the wrapping last group merged
    # into 0; invalid slots are pushed past W so they never count
    cols = jnp.arange(W)
    locs_eff = jnp.where(valid, locs, W + 1)
    cnt = (cols[None, :, None] >= locs_eff[:, None, :]).sum(-1)  # [B, W]
    gpid = jnp.where(cnt == n_valid[:, None], 0, cnt)

    fit, sc, l1, mean = _segment_votes(xy, gpid, tol, max_peaks)

    cuboid_cor_id, _ = postprocess_cuboid_batch(y_bon, y_cor, H, W, z0, r)
    return locs, fit, sc, l1, mean, z1, cuboid_cor_id
