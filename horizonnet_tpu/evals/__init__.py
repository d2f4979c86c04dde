"""Evaluation metrics: cuboid (CE/PE/3DIoU) and general (2D/3D IoU, depth).

Shapely/Qhull-free: polygon and polytope geometry comes from
horizonnet_tpu.geometry. Host-side batch jobs, not in the perf loop.
"""

from .general import test_general, new_general_losses, summarize_general
from .cuboid import test_cuboid, eval_3diou, prepare_gtdt_pairs

__all__ = ["test_general", "new_general_losses", "summarize_general",
           "test_cuboid", "eval_3diou", "prepare_gtdt_pairs"]
