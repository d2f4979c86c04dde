"""CLI smoke tests: argument surfaces and end-to-end file IO on tiny data."""

import json
import os

import numpy as np
import pytest
import jax

from horizonnet_tpu.geometry import xy2coor


def _write_pair(tmp_path, name="room"):
    """One synthetic (json dt, txt gt) pair for the eval CLIs."""
    pts = np.array([[-3.0, -2.0], [3.0, -2.0], [3.0, 2.0], [-3.0, 2.0]]) + 0.5
    floor = xy2coor(pts, -1.6, 1024, 512, floorW=1, floorH=1)
    ceil = xy2coor(pts, 1.2, 1024, 512, floorW=1, floorH=1)
    cor = np.zeros((8, 2), np.float32)
    cor[0::2] = ceil
    cor[1::2] = floor
    order = np.argsort(cor[0::2, 0])
    cor = cor.reshape(4, 2, 2)[order].reshape(8, 2)

    gt_dir = tmp_path / "gt"
    dt_dir = tmp_path / "dt"
    gt_dir.mkdir(exist_ok=True)
    dt_dir.mkdir(exist_ok=True)
    with open(gt_dir / f"{name}.txt", "w") as f:
        for x, y in cor:
            f.write(f"{x:.2f} {y:.2f}\n")
    with open(dt_dir / f"{name}.json", "w") as f:
        json.dump({"z0": 50.0, "z1": -1.6 * 50 / 1.2,
                   "uv": [[float(x) / 1024, float(y) / 512]
                          for x, y in cor]}, f)
    return str(gt_dir / "*.txt"), str(dt_dir / "*.json")


def test_eval_general_cli(tmp_path, capsys):
    from horizonnet_tpu.cli.eval_general import main
    gt_glob, dt_glob = _write_pair(tmp_path)
    assert main(["--dt_glob", dt_glob, "--gt_glob", gt_glob]) == 0
    out = capsys.readouterr().out
    assert "2DIoU  : 100.00" in out
    assert "3DIoU  : 100.00" in out


def test_eval_cuboid_cli(tmp_path, capsys):
    from horizonnet_tpu.cli.eval_cuboid import main
    gt_glob, dt_glob = _write_pair(tmp_path)
    assert main(["--dt_glob", dt_glob, "--gt_glob", gt_glob]) == 0
    out = capsys.readouterr().out
    assert "Corner Error" in out and "3DIoU" in out


def test_layout_viewer_cli(tmp_path):
    from PIL import Image
    from horizonnet_tpu.cli.layout_viewer import main
    gt_glob, dt_glob = _write_pair(tmp_path)
    img_path = str(tmp_path / "pano.png")
    Image.fromarray(np.zeros((512, 1024, 3), np.uint8)).save(img_path)
    out_path = str(tmp_path / "mesh.ply")
    dt_json = dt_glob.replace("*.json", "room.json")
    assert main(["--img", img_path, "--layout", dt_json,
                 "--out", out_path]) == 0
    assert os.path.getsize(out_path) > 1000


@pytest.mark.heavy
def test_inference_cli_tiny(tmp_path):
    """Full CLI: save a checkpoint, run inference on a tiny pano dir."""
    from PIL import Image
    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.registry import init_model
    from horizonnet_tpu.train.checkpoint import save_model
    from horizonnet_tpu.cli.inference import main

    model = build_model("resnet18", use_rnn=True)
    variables = init_model(model, jax.random.PRNGKey(0), (1, 512, 128, 3))
    ckpt = str(tmp_path / "m.ckpt")
    save_model(ckpt, variables, "resnet18", True)

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    # CLI resizes anything to 1024x512; feed a small image
    Image.fromarray(rng.integers(0, 255, (64, 128, 3), dtype=np.uint8)
                    .astype(np.uint8)).save(str(img_dir / "a.png"))
    out_dir = str(tmp_path / "out")
    assert main(["--pth", ckpt, "--img_glob", str(img_dir / "*.png"),
                 "--output_dir", out_dir, "--force_cuboid"]) == 0
    with open(os.path.join(out_dir, "a.json")) as f:
        dt = json.load(f)
    assert dt["z0"] == 50.0
    assert len(dt["uv"]) == 8


def test_layout_viewer_cli_headless_preview(tmp_path):
    """--vis without open3d must degrade to the preview PNG, and
    --vis_out must render one directly (C14's 3D view, headless)."""
    from PIL import Image
    from horizonnet_tpu.cli.layout_viewer import main
    gt_glob, dt_glob = _write_pair(tmp_path)
    img_path = str(tmp_path / "pano.png")
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(40, 255, (512, 1024, 3))
                    .astype(np.uint8)).save(img_path)
    dt_json = dt_glob.replace("*.json", "room.json")
    prev = str(tmp_path / "prev.png")
    assert main(["--img", img_path, "--layout", dt_json,
                 "--vis", "--vis_out", prev]) == 0
    strip = np.asarray(Image.open(prev))
    assert strip.shape == (480, 4 * 640, 3)
    # The room texture must actually land in every view
    for k in range(4):
        tile = strip[:, k * 640:(k + 1) * 640]
        assert (tile.sum(-1) > 0).mean() > 0.3, k


@pytest.mark.heavy
def test_inference_cli_device_postproc(tmp_path):
    """--device_postproc writes the same JSON schema via the fused
    device path (cuboid + general modes, incl. tail-chunk padding)."""
    from PIL import Image
    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.registry import init_model
    from horizonnet_tpu.train.checkpoint import save_model
    from horizonnet_tpu.cli.inference import main

    model = build_model("resnet18", use_rnn=True)
    variables = init_model(model, jax.random.PRNGKey(0), (1, 512, 128, 3))
    ckpt = str(tmp_path / "m.ckpt")
    save_model(ckpt, variables, "resnet18", True)

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for name in ("a", "b", "c"):  # 3 panos, batch 2 -> padded tail
        Image.fromarray(rng.integers(0, 255, (64, 128, 3), dtype=np.uint8)
                        .astype(np.uint8)).save(str(img_dir / f"{name}.png"))
    for mode_flag, out_name in ((["--force_cuboid"], "cub"),
                                ([], "gen"),
                                (["--force_cuboid", "--wire", "dct"],
                                 "cub_dct")):
        out_dir = str(tmp_path / out_name)
        assert main(["--pth", ckpt, "--img_glob", str(img_dir / "*.png"),
                     "--output_dir", out_dir, "--batch_size", "2",
                     "--device_postproc"] + mode_flag) == 0
        for name in ("a", "b", "c"):
            with open(os.path.join(out_dir, f"{name}.json")) as f:
                dt = json.load(f)
            assert dt["z0"] == 50.0 and np.isfinite(dt["z1"])
            assert len(dt["uv"]) >= 8 and len(dt["uv"]) % 2 == 0
            if mode_flag:
                assert len(dt["uv"]) == 8


@pytest.mark.slow
def test_preprocess_cli_demo(tmp_path):
    """Full preprocess CLI on the demo pano: VP txt + aligned PNG outputs
    exist and the VP matches the committed golden within tolerance."""
    demo = "/root/reference/assets/demo.png"
    golden = "/root/reference/assets/preprocessed/demo_VP.txt"
    if not os.path.isfile(demo):
        pytest.skip("reference assets not mounted")
    from PIL import Image
    from horizonnet_tpu.cli.preprocess import main

    out = str(tmp_path / "out")
    assert main(["--img_glob", demo, "--output_dir", out]) == 0
    vp = np.loadtxt(os.path.join(out, "demo_VP.txt"))
    gold = np.loadtxt(golden)
    for i in range(3):
        ang = np.degrees(np.arccos(np.clip(
            abs(np.dot(vp[i], gold[i])), -1, 1)))
        assert ang < 0.5, f"VP row {i} off by {ang:.3f} deg"
    rgb = np.asarray(Image.open(os.path.join(out, "demo_aligned_rgb.png")))
    line = np.asarray(Image.open(os.path.join(out, "demo_aligned_line.png")))
    assert rgb.shape == (512, 1024, 3) and rgb.dtype == np.uint8
    assert line.shape == (512, 1024, 3)
    gold_rgb = np.asarray(Image.open(
        "/root/reference/assets/preprocessed/demo_aligned_rgb.png")
    ).astype(np.float64)[..., :3]
    assert np.abs(rgb - gold_rgb).mean() < 3.0  # /255 units
