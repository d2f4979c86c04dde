"""ctypes binding for the in-house C++ LSD line-segment detector.

Builds lsd.cpp with g++ on first use (cached next to the source). The
detector replaces pylsd (reference misc/pano_lsd_align.py:16): same
algorithm (von Gioi et al., IPOL 2012), same parameter surface, output
rows [x1, y1, x2, y2, width, log_nfa].
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "lsd.cpp")
_LIB = os.path.join(_DIR, "liblsd.so")
_lib = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.isfile(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.lsd_detect.restype = ctypes.c_int
    lib.lsd_detect.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
    ]
    lib.lsd_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return lib


def lsd(img, scale=0.8, sigma_scale=0.6, quant=2.0, ang_th=22.5,
        log_eps=0.0, density_th=0.7, n_bins=1024):
    """Detect line segments in a grayscale image.

    img: [H, W] float or uint8 (0..255 range). Returns (N, 6) float64
    rows [x1, y1, x2, y2, width, log_nfa] in image pixel coordinates.
    Defaults mirror the published algorithm; the reference pipeline calls
    with quant=0.7 (pano_lsd_align.py:260).
    """
    lib = _load()
    img = np.ascontiguousarray(np.asarray(img, np.float64))
    assert img.ndim == 2, "grayscale input expected"
    h, w = img.shape
    out = ctypes.POINTER(ctypes.c_double)()
    n = lib.lsd_detect(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), w, h,
        scale, sigma_scale, quant, ang_th, log_eps, density_th, n_bins,
        ctypes.byref(out))
    if n == 0:
        lib.lsd_free(out)
        return np.zeros((0, 6))
    res = np.ctypeslib.as_array(out, shape=(n, 6)).copy()
    lib.lsd_free(out)
    return res


def lsd_batch(imgs, num_workers=None, **kw):
    """Detect segments in many images concurrently.

    The C++ detector holds no mutable global state and ctypes releases
    the GIL during the foreign call, so a thread pool gives real
    parallelism across views (the preprocess pipeline runs 26 per pano).
    Returns a list of (N_i, 6) arrays in input order.
    """
    import os
    from concurrent.futures import ThreadPoolExecutor

    imgs = list(imgs)
    _load()  # build/bind once before the pool races on it
    if num_workers is None:
        num_workers = min(len(imgs), os.cpu_count() or 1)
    if num_workers <= 1 or len(imgs) <= 1:
        return [lsd(im, **kw) for im in imgs]
    with ThreadPoolExecutor(num_workers) as pool:
        return list(pool.map(lambda im: lsd(im, **kw), imgs))
