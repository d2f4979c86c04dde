"""Circular windowed max and corner-peak finding.

TPU-native replacement for scipy.ndimage.maximum_filter(size=r, mode='wrap')
+ host peak selection (inference.py:21-29). The device path emits a
fixed-size top-K peak list + validity mask (static shapes for jit); the host
path reproduces the reference's variable-length output exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp


def circular_max_filter_1d(signal, size):
    """Windowed max with circular boundary over the last axis.

    Matches scipy maximum_filter(size=size, mode='wrap'): the window of
    length ``size`` is centered with the extra tap on the left for even
    sizes (scipy uses origin 0 => window [i - size//2, i + (size-1)//2]).
    """
    left = size // 2
    right = size - 1 - left
    n = signal.shape[-1]
    idx = jnp.arange(-left, right + 1)
    # Gather all shifted copies and reduce: [n, size] windows via mod index
    win = jnp.take(signal, (jnp.arange(n)[:, None] + idx[None, :]) % n, axis=-1)
    return jnp.max(win, axis=-1)


def find_peaks_np(signal, r=29, min_v=0.05, N=None):
    """Host peak finder, identical semantics to reference find_N_peaks.

    Returns (peak_locations, peak_values). Ref: inference.py:21-29.
    """
    signal = np.asarray(signal)
    n = len(signal)
    left = r // 2
    right = r - 1 - left
    idx = (np.arange(n)[:, None] + np.arange(-left, right + 1)[None, :]) % n
    max_v = signal[idx].max(1)
    pk_loc = np.where(max_v == signal)[0]
    pk_loc = pk_loc[signal[pk_loc] > min_v]
    if N is not None:
        order = np.argsort(-signal[pk_loc])
        pk_loc = pk_loc[order[:N]]
        pk_loc = pk_loc[np.argsort(pk_loc)]
    return pk_loc, signal[pk_loc]


def find_peaks_device(signal, r=29, min_v=0.05, max_peaks=32):
    """Device peak finder with static output shape (batch-safe).

    ``signal [..., W]``. Returns (locs [..., max_peaks] int32,
    vals [..., max_peaks], valid [..., max_peaks] bool) with peaks sorted
    by location; invalid slots padded with loc=-1. Top-K selection by
    value happens only when more than max_peaks peaks exist. Product
    caller: the fused general-layout serving path
    (postproc/device.py postprocess_general_batch); the cuboid path uses
    its own exactly-4 variant (find_4_peaks: no validity mask —
    degenerate slots are seeded with collision-free fallback columns
    before top_k).
    """
    n = signal.shape[-1]
    max_v = circular_max_filter_1d(signal, r)
    is_peak = (max_v == signal) & (signal > min_v)
    # Rank peaks by value, keep top max_peaks, then re-sort by location
    neg = jnp.where(is_peak, signal, -jnp.inf)
    vals, locs = jax.lax.top_k(neg, max_peaks)
    valid = jnp.isfinite(vals)
    locs = jnp.where(valid, locs, n + 1)  # push invalid to the end
    order = jnp.argsort(locs, axis=-1)
    locs = jnp.take_along_axis(locs, order, axis=-1)
    vals = jnp.take_along_axis(vals, order, axis=-1)
    valid = jnp.take_along_axis(valid, order, axis=-1)
    locs = jnp.where(valid, locs, -1)
    vals = jnp.where(valid, vals, 0.0)
    return locs.astype(jnp.int32), vals, valid
