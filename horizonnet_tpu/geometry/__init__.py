"""Geometry core: equirectangular <-> sphere <-> floor-plane transforms.

This package is the single source of truth for all coordinate math used by
the data pipeline, post-processing, evaluation, preprocessing and the viewer
(the reference spreads the same formulas over misc/post_proc.py,
misc/panostretch.py and eval_general.py; see SURVEY.md §1 cross-layer note).

All functions work on both numpy and jax.numpy arrays: they dispatch on the
input type, so the same code path serves host-side post-processing (tiny
arrays) and on-device batched kernels.
"""

from .equirect import (
    coorx2u,
    coory2v,
    coory2v_up,
    u2coorx,
    v2coory,
    v_up2coory,
    uv2xy,
    coor2xy,
    xy2coor,
    x_u_solve_y,
    y_u_solve_x,
    get_z1,
    infer_coory,
    uv_meshgrid,
)
from .lines import pano_connect_points, cor_2_1d, sort_xy_filter_unique
from .depth import layout_2_depth
from .polygon import (
    polygon_area,
    polygon_is_valid,
    polygon_intersection_area,
    polygon_iou,
    point_segments_intersect,
)
from .polytope import halfspace_intersection_volume, layout_halfspaces

__all__ = [
    "coorx2u", "coory2v", "coory2v_up", "u2coorx", "v2coory", "v_up2coory",
    "uv2xy", "coor2xy", "xy2coor", "x_u_solve_y", "y_u_solve_x",
    "get_z1", "infer_coory", "uv_meshgrid",
    "pano_connect_points", "cor_2_1d", "sort_xy_filter_unique",
    "layout_2_depth",
    "polygon_area", "polygon_is_valid", "polygon_intersection_area",
    "polygon_iou", "point_segments_intersect",
    "halfspace_intersection_volume", "layout_halfspaces",
]
