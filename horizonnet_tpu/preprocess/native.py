"""ctypes binding for the C++ segment-merge engine (merge.cpp).

Built with g++ on first use, cached next to the source (same pattern as
preprocess/lsd). Compiled without fp-contraction or fast-math so results
track the numpy reference implementation in lines.py to rounding error
(pinned by tests/test_preprocess.py).
"""

import ctypes
import os

import numpy as np

from ._build import build_and_load

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "merge.cpp")
_LIB = os.path.join(_DIR, "libmerge.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    # build_and_load serializes check+compile+dlopen and publishes the
    # .so atomically (the preprocess CLI races many threads into here)
    lib = build_and_load(_SRC, _LIB, extra_flags=("-ffp-contract=off",))
    lib.combine_edges_merge.restype = ctypes.c_int
    lib.combine_edges_merge.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def merge_rounds(lines, rounds=3):
    """Run the sequential merge rounds on (N, 8) parameterized lines.

    Returns the surviving (M, 8) array (M <= N, original order).
    """
    lib = _load()
    buf = np.ascontiguousarray(np.asarray(lines, np.float64))
    if len(buf) == 0:
        return buf.reshape(0, 8)
    assert buf.shape[1] == 8, buf.shape
    m = lib.combine_edges_merge(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(buf), int(rounds))
    return buf[:m].copy()
