"""VP-alignment preprocessing: view cutting, LSD, sphere Hough, rotation.

Reference behavior: misc/pano_lsd_align.py + preprocess.py (the
Matlab-derived LayoutNet pipeline). TPU-first deltas:

- all 26 perspective views are cut in ONE batched device gather;
- the icosahedral sphere Hough vote is vectorized (masked matmuls +
  argmax) instead of a triple nested bin loop;
- pano rotation is a single device warp;
- the LSD line-segment detector — the one true native component — is an
  in-house C++ implementation (lsd/lsd.cpp) called via ctypes.
"""

from .sphere import (
    xyz2uvN, uv2xyzN, computeUVN, icosahedron2sphere, fit_plane_normal,
)
from .views import cut_views, VIEW_DIRECTIONS
from .rotate import rotate_panorama, rotate_panorama_uint8
from .pipeline import pano_edge_detection

__all__ = [
    "xyz2uvN", "uv2xyzN", "computeUVN", "icosahedron2sphere",
    "fit_plane_normal", "cut_views", "VIEW_DIRECTIONS", "rotate_panorama", "rotate_panorama_uint8",
    "pano_edge_detection",
]
