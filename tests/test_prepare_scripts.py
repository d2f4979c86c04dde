"""Dataset-preparation CLI tests on synthetic fixtures (C16/C17).

A tmpdir Structured3D zip and a synthetic ZInD scene tree exercise the
full extract/prepare/gen_txt and json->corner-txt paths, asserting the
output tree layout and file contents the training pipeline consumes.
"""

import json
import os
import zipfile

import numpy as np
import pytest


# ---------------------------------------------------------------- ST3D

def _make_st3d_zip(path, scenes=("scene_00000", "scene_03000",
                                 "scene_03250")):
    """Tiny Structured3D zip: 1 pano per scene, 8x16 png + layout txt."""
    from PIL import Image
    import io

    with zipfile.ZipFile(path, "w") as z:
        for k, scene in enumerate(scenes):
            base = f"Structured3D/{scene}/2D_rendering/{k}/panorama"
            z.writestr(f"{base}/camera_xyz.txt", "0 0 1.6\n")
            buf = io.BytesIO()
            Image.fromarray(
                np.full((8, 16, 3), 40 * (k + 1), np.uint8)).save(
                buf, format="PNG")
            z.writestr(f"{base}/full/rgb_rawlight.png", buf.getvalue())
            z.writestr(f"{base}/layout.txt",
                       "10.0 2.0\n10.0 6.0\n")
    return path


def test_structured3d_extract_prepare_gen_txt(tmp_path):
    from horizonnet_tpu.cli.prepare_structured3d import main

    zip_path = str(tmp_path / "st3d.zip")
    _make_st3d_zip(zip_path)
    raw = str(tmp_path / "raw")
    assert main(["extract", "--zippath", zip_path, "--outdir", raw]) == 0
    assert os.path.isfile(
        os.path.join(raw, "scene_00000", "rgb", "0_rgb_rawlight.png"))
    assert open(os.path.join(raw, "scene_03000", "layout",
                             "1_layout.txt")).read() == "10.0 2.0\n10.0 6.0\n"

    # prepare: symlink trees per split (scene ids straddle the split edges)
    tr, va, te = (str(tmp_path / s) for s in ("tr", "va", "te"))
    assert main(["prepare", "--in_root", raw, "--out_train_root", tr,
                 "--out_valid_root", va, "--out_test_root", te]) == 0
    assert os.path.islink(os.path.join(tr, "img", "scene_00000_0.png"))
    assert os.path.islink(os.path.join(va, "label_cor", "scene_03000_1.txt"))
    assert os.path.islink(os.path.join(te, "img", "scene_03250_2.png"))
    assert not os.listdir(os.path.join(tr, "label_cor")) == []
    # the symlinked label resolves to the extracted content
    with open(os.path.join(va, "label_cor", "scene_03000_1.txt")) as f:
        assert f.read() == "10.0 2.0\n10.0 6.0\n"

    # gen_txt: pair listings relative to the raw root
    txts = [str(tmp_path / f"{s}.txt") for s in ("train", "valid", "test")]
    assert main(["gen_txt", "--root", raw, "--train_txt", txts[0],
                 "--valid_txt", txts[1], "--test_txt", txts[2]]) == 0
    train_lines = open(txts[0]).read().splitlines()
    assert train_lines == [
        "scene_00000/rgb/0_rgb_rawlight.png scene_00000/layout/0_layout.txt"]


# ---------------------------------------------------------------- ZInD

def _make_zind_scene(root, scene_id="0001"):
    from PIL import Image

    pano_key = "floor_01_partial_room_01_pano_3"
    scene = root / scene_id
    (scene / "panos").mkdir(parents=True)
    for pk in (pano_key, "floor_01_partial_room_01_pano_4"):
        Image.fromarray(np.full((16, 32, 3), 90, np.uint8)).save(
            scene / "panos" / f"{pk}.jpg")
    zind = {"merger": {"floor_01": {"complete_room_01": {
        "partial_room_01": {"pano_3": {
            "is_primary": True, "is_inside": True, "is_ceiling_flat": True,
            "camera_height": 1.5, "ceiling_height": 2.5,
            "layout_visible": {"vertices": [[1.0, 1.0], [-1.0, 1.0],
                                            [-1.0, -1.0], [1.0, -1.0]]},
        },
            # filtered out: not primary
            "pano_4": {
                "is_primary": False, "is_inside": True,
                "is_ceiling_flat": True, "camera_height": 1.5,
                "ceiling_height": 2.5,
                "layout_visible": {"vertices": [[1.0, 1.0]]},
        }}}}}}
    with open(scene / "zind_data.json", "w") as f:
        json.dump(zind, f)
    return scene_id, pano_key


def test_prepare_zind_outputs(tmp_path):
    from horizonnet_tpu.cli.prepare_zind import main

    indir = tmp_path / "zind"
    indir.mkdir()
    scene_id, pano_key = _make_zind_scene(indir)
    partition = tmp_path / "partition.json"
    with open(partition, "w") as f:
        json.dump({"train": [scene_id]}, f)
    outdir = tmp_path / "out"

    # num_workers=1 exercises the serial path (broken in the reference:
    # zind_prepare_dataset.py:105 swaps the positional args)
    assert main(["--partition", str(partition), "--indir", str(indir),
                 "--outdir", str(outdir), "--width", "1024",
                 "--num_workers", "1"]) == 0

    img_out = outdir / "train" / "img" / f"{scene_id}_{pano_key}.jpg"
    txt_out = outdir / "train" / "label_cor" / f"{scene_id}_{pano_key}.txt"
    assert img_out.is_file() and txt_out.is_file()
    from PIL import Image
    assert Image.open(img_out).size == (1024, 512)

    rows = np.array([l.split() for l in open(txt_out)], np.float64)
    # 4 vertices -> 8 interleaved rows; filtered pano_4 wrote nothing else
    assert rows.shape == (8, 2)
    assert len(os.listdir(outdir / "train" / "img")) == 1
    # Interleaving: ceiling row above floor row at the same column
    assert (rows[0::2, 0] == rows[1::2, 0]).all()
    assert (rows[0::2, 1] < rows[1::2, 1]).all()
    # Spot-check the projection math: vertex (1,1), camera 1.5m, ceil 2.5m
    theta = np.arctan2(-1.0, 1.0)
    want_col = (theta + np.pi) / (2 * np.pi) * 1023
    assert abs(rows[0, 0] - round(want_col, 1)) < 0.051
    elev_c = np.arctan2(1.0, np.sqrt(2.0))
    want_row_c = (1 - (elev_c + np.pi / 2) / np.pi) * 511
    assert abs(rows[0, 1] - round(want_row_c, 1)) < 0.051


def test_prepare_zind_flag_filters(tmp_path):
    from horizonnet_tpu.cli.prepare_zind import main

    indir = tmp_path / "zind"
    indir.mkdir()
    scene_id, pano_key = _make_zind_scene(indir)
    partition = tmp_path / "partition.json"
    with open(partition, "w") as f:
        json.dump({"train": [scene_id]}, f)
    outdir = tmp_path / "out"
    # is_primary=-1 (don't care) admits BOTH panos
    assert main(["--partition", str(partition), "--indir", str(indir),
                 "--outdir", str(outdir), "--is_primary", "-1",
                 "--num_workers", "1"]) == 0
    assert len(os.listdir(outdir / "train" / "img")) == 2
