"""Viewer tests: point lifting, grid triangulation, PLY export."""

import numpy as np

from horizonnet_tpu.geometry import xy2coor
from horizonnet_tpu.viewer.mesh import (layout_to_points, grid_triangulate,
                                        layout_to_mesh, write_ply)
from horizonnet_tpu.viewer.visualize import visualize_a_data


def _cuboid_cor():
    pts = np.array([[-3.0, -2.0], [3.0, -2.0], [3.0, 2.0], [-3.0, 2.0]]) + 0.5
    floor = xy2coor(pts, -1.6, 1024, 512, floorW=1, floorH=1)
    ceil = xy2coor(pts, 1.2, 1024, 512, floorW=1, floorH=1)
    cor = np.zeros((8, 2), np.float32)
    cor[0::2] = ceil
    cor[1::2] = floor
    order = np.argsort(cor[0::2, 0])
    return cor.reshape(4, 2, 2)[order].reshape(8, 2)


def test_layout_to_points_masks():
    img = np.random.default_rng(0).uniform(0, 1, (512, 1024, 3))
    xyz, rgb, mask = layout_to_points(_cuboid_cor(), img)
    assert xyz.shape == (512, 1024, 3)
    assert mask.all()
    _, _, mask_nf = layout_to_points(_cuboid_cor(), img, ignore_floor=True)
    assert mask_nf.sum() < mask.sum()
    # z-down world as in the reference viewer: floor rows at z = +1.6,
    # ceiling at -ceil_height
    assert abs(xyz[-1, :, 2].mean() - 1.6) < 0.05
    assert xyz[0, :, 2].mean() < -0.5


def test_grid_triangulate_wraps_and_counts():
    mask = np.ones((4, 6), bool)
    faces = grid_triangulate(mask)
    # (rows-1) * cols quads incl the wrap column, 2 triangles each
    assert len(faces) == 3 * 6 * 2
    assert faces.min() >= 0 and faces.max() < 24
    mask[1, 2] = False
    faces2 = grid_triangulate(mask)
    assert len(faces2) < len(faces)


def test_write_ply_roundtrip(tmp_path):
    img = np.random.default_rng(1).uniform(0, 1, (64, 128, 3))
    cor = _cuboid_cor() * [128 / 1024, 64 / 512]
    xyz, rgb, faces = layout_to_mesh(cor, img)
    path = str(tmp_path / "mesh.ply")
    write_ply(path, xyz, rgb, faces)
    lines = open(path).read().splitlines()
    assert lines[0] == "ply"
    assert f"element vertex {len(xyz)}" in lines
    assert f"element face {len(faces)}" in lines
    # parse one vertex line
    parts = lines[lines.index("end_header") + 1].split()
    assert len(parts) == 6


def test_visualize_a_data_strip():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (64, 128, 3)).astype(np.float32)
    y_bon = np.stack([np.full(128, -0.5), np.full(128, 0.5)])
    y_cor = rng.uniform(0, 1, 128)
    out = visualize_a_data(x, y_bon, y_cor)
    assert out.shape == (64 + 33, 128, 3)
    assert out.dtype == np.uint8

def test_corner_wireframe_geometry():
    """Wireframe arrays for a synthetic cuboid: ring + ring + verticals."""
    import numpy as np
    from horizonnet_tpu.geometry import xy2coor
    from horizonnet_tpu.viewer.mesh import corner_wireframe

    pts = np.array([[-3.0, -2.0], [3.0, -2.0], [3.0, 2.0], [-3.0, 2.0]])
    floor = xy2coor(pts, -1.6, 1024, 512, floorW=1, floorH=1)
    ceil = xy2coor(pts, 1.2, 1024, 512, floorW=1, floorH=1)
    cor_id = np.zeros((8, 2))
    cor_id[0::2] = ceil
    cor_id[1::2] = floor

    points, lines, colors = corner_wireframe(cor_id, 512, 1024)
    assert points.shape == (8, 3) and lines.shape == (12, 2)
    assert colors.shape == (12, 3) and (colors == [1, 0, 0]).all()
    # Floor ring at z=-1.6, ceiling ring at the implied ceiling height
    assert np.allclose(points[:4, 2], -1.6)
    assert np.allclose(points[4:, 2], 1.2, atol=1e-2)
    # Plan positions recover the synthetic room footprint
    assert np.allclose(np.sort(points[:4, 0]), [-3, -3, 3, 3], atol=0.05)
    assert np.allclose(np.sort(points[:4, 1]), [-2, -2, 2, 2], atol=0.05)
    # Verticals connect corner i to corner i+N
    assert (lines[8:] == np.stack([np.arange(4), np.arange(4) + 4], -1)).all()


def test_html_viewer_payload_roundtrip(tmp_path):
    """The self-contained HTML viewer: embedded typed arrays must decode
    back to the exact decimated mesh, vertices must be compacted to the
    used subset, and the page must be fully self-contained (no external
    script/src URLs — zero-egress deployments open it from disk)."""
    import base64
    import json
    import re

    import numpy as np
    from horizonnet_tpu.viewer.html import write_html_viewer
    from horizonnet_tpu.viewer.mesh import (corner_wireframe,
                                            grid_triangulate,
                                            layout_to_points)
    from horizonnet_tpu.geometry import xy2coor

    rng = np.random.default_rng(0)
    H, W = 64, 128
    img = rng.uniform(0, 1, (H, W, 3))
    pts = np.array([[-3.0, -2.0], [3.0, -2.0], [3.0, 2.0], [-3.0, 2.0]])
    floor = xy2coor(pts, -1.6, W, H, floorW=1, floorH=1)
    ceil = xy2coor(pts, 1.2, W, H, floorW=1, floorH=1)
    cor_id = np.zeros((8, 2))
    cor_id[0::2], cor_id[1::2] = ceil, floor

    xyz, rgb, mask = layout_to_points(cor_id, img)
    faces = grid_triangulate(mask)
    wf_pts, wf_lines, _ = corner_wireframe(cor_id, H, W)
    out = tmp_path / "v.html"
    nv, nf = write_html_viewer(str(out), xyz.reshape(-1, 3),
                               rgb.reshape(-1, 3), faces,
                               wireframe=(wf_pts, wf_lines))

    page = out.read_text()
    # Self-contained: no external fetches of any kind
    assert "http://" not in page and "https://" not in page
    assert "src=" not in page.replace("shaderSource", "")
    payload = json.loads(re.search(
        r'<script id="meshdata" type="application/json">(.*?)</script>',
        page, re.S).group(1))

    pos = np.frombuffer(base64.b64decode(payload["pos"]), np.float32)
    col = np.frombuffer(base64.b64decode(payload["col"]), np.uint8)
    idx = np.frombuffer(base64.b64decode(payload["idx"]), np.uint32)
    assert payload["n_vertices"] == nv and payload["n_faces"] == nf
    assert pos.size == nv * 3 and col.size == nv * 3 and idx.size == nf * 3
    # Compaction: every embedded vertex is referenced, indices in range
    assert idx.max() == nv - 1 and np.unique(idx).size == nv
    # Geometry survives: the used vertices of the original mesh, exactly
    used = np.unique(np.asarray(faces))
    assert np.allclose(pos.reshape(-1, 3),
                       xyz.reshape(-1, 3)[used].astype(np.float32))
    # Wireframe rides along
    wpos = np.frombuffer(base64.b64decode(payload["wpos"]), np.float32)
    assert wpos.size == wf_pts.size
    # Camera framing fields are sane
    assert payload["radius"] > 0 and len(payload["center"]) == 3


def test_layout_viewer_cli_html(tmp_path):
    """--html end-to-end through the CLI on the golden room fixture."""
    import os

    import pytest

    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "golden")
    img = os.path.join(fix, "val_room.png")
    cor = os.path.join(fix, "val_room_cor.txt")
    if not os.path.isfile(img):
        pytest.skip("golden fixtures not built")
    from horizonnet_tpu.cli.layout_viewer import main

    out = tmp_path / "room.html"
    assert main(["--img", img, "--layout", cor, "--html", str(out)]) == 0
    assert out.stat().st_size > 100_000
    assert "<canvas" in out.read_text()[:2000]


def test_html_viewer_wireframe_only(tmp_path):
    """All-surfaces-ignored layouts (--ignore_floor/_ceiling/_wall) yield
    zero faces; the HTML viewer must still write a wireframe-only page,
    framing the camera on the corner wireframe instead of crashing on a
    zero-size reduction (write_ply already handled this combo)."""
    import numpy as np
    from horizonnet_tpu.viewer.html import write_html_viewer
    from horizonnet_tpu.viewer.mesh import corner_wireframe
    from horizonnet_tpu.geometry import xy2coor

    H, W = 64, 128
    pts = np.array([[-3.0, -2.0], [3.0, -2.0], [3.0, 2.0], [-3.0, 2.0]])
    floor = xy2coor(pts, -1.6, W, H, floorW=1, floorH=1)
    ceil = xy2coor(pts, 1.2, W, H, floorW=1, floorH=1)
    cor_id = np.zeros((8, 2))
    cor_id[0::2], cor_id[1::2] = ceil, floor
    wf_pts, wf_lines, _ = corner_wireframe(cor_id, H, W)

    out = tmp_path / "wf.html"
    nv, nf = write_html_viewer(
        str(out), np.zeros((0, 3), np.float32), np.zeros((0, 3), np.uint8),
        np.zeros((0, 3), np.int64), wireframe=(wf_pts, wf_lines))
    assert nv == 0 and nf == 0
    page = out.read_text()
    assert "<canvas" in page
    import json as _json
    import re
    payload = _json.loads(re.search(
        r'<script id="meshdata" type="application/json">(.*?)</script>',
        page, re.S).group(1))
    assert payload["radius"] > 0 and "wpos" in payload
