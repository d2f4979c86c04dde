"""Train-CLI resume: interrupted run continues identically to an unbroken
run (per-epoch RNGs derive from (seed, epoch), checkpoint restores
params + BN stats + optimizer + epoch + best score).

Slow (~4 compiles of the resnet18 train/valid programs): -m slow.
"""

import os

import numpy as np
import pytest

from horizonnet_tpu.geometry import xy2coor
from horizonnet_tpu.train.checkpoint import _read

H, W = 64, 128


def _write_dataset(root, n=2):
    from PIL import Image

    os.makedirs(root / "img")
    os.makedirs(root / "label_cor")
    rng = np.random.default_rng(0)
    for k in range(n):
        w, d = 4.0 + k, 3.0 + 0.5 * k
        pts = np.array([[-w, -d], [w, -d], [w, d], [-w, d]]) + 0.5
        floor = xy2coor(pts, -30, W, H, floorW=1, floorH=1)
        ceil = xy2coor(pts, 20, W, H, floorW=1, floorH=1)
        cor = np.zeros((8, 2))
        cor[0::2] = ceil
        cor[1::2] = floor
        order = np.argsort(cor[0::2, 0])
        cor = cor.reshape(4, 2, 2)[order].reshape(8, 2)
        img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        Image.fromarray(img).save(root / "img" / f"room{k}.png")
        with open(root / "label_cor" / f"room{k}.txt", "w") as f:
            for x, y in cor:
                f.write(f"{x:.2f} {y:.2f}\n")
    return str(root)


@pytest.mark.slow
def test_train_cli_resume_matches_unbroken(tmp_path):
    from horizonnet_tpu.cli.train import main

    data = _write_dataset(tmp_path / "data")
    common = ["--backbone", "resnet18", "--train_root_dir", data,
              "--valid_root_dir", data, "--batch_size_train", "2",
              "--batch_size_valid", "2", "--num_workers", "0",
              "--no_flip", "--no_rotate", "--no_gamma",
              "--no_pano_stretch", "--save_every", "100", "--lr", "1e-3"]

    # Unbroken 2-epoch run
    assert main(["--id", "a", "--ckpt", str(tmp_path / "ck"),
                 "--logs", str(tmp_path / "lg"), "--epochs", "2",
                 *common]) == 0
    head_a, pay_a = _read(str(tmp_path / "ck" / "a" / "checkpoint.ckpt"))
    assert head_a["epoch"] == 2

    # Interrupted after epoch 1, then resumed to epoch 2
    assert main(["--id", "b", "--ckpt", str(tmp_path / "ck"),
                 "--logs", str(tmp_path / "lg"), "--epochs", "1",
                 *common]) == 0
    head_b1, _ = _read(str(tmp_path / "ck" / "b" / "checkpoint.ckpt"))
    assert head_b1["epoch"] == 1
    assert main(["--id", "b", "--ckpt", str(tmp_path / "ck"),
                 "--logs", str(tmp_path / "lg"), "--epochs", "2",
                 "--resume", str(tmp_path / "ck" / "b"), *common]) == 0
    head_b, pay_b = _read(str(tmp_path / "ck" / "b" / "checkpoint.ckpt"))
    assert head_b["epoch"] == 2
    assert int(np.asarray(pay_b["step"])) == int(np.asarray(pay_a["step"]))
    assert head_b["best_valid_score"] == head_a["best_valid_score"]

    # Bit-identical parameters, BN stats and optimizer moments
    import jax
    leaves_a = jax.tree.leaves(pay_a)
    leaves_b = jax.tree.leaves(pay_b)
    assert len(leaves_a) == len(leaves_b) and len(leaves_a) > 50
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.slow
def test_train_cli_wire_dct_smoke(tmp_path):
    """--wire dct: one epoch end-to-end through the CLI (compressed
    batch upload decoded on device fused with the augmentation warp)."""
    from horizonnet_tpu.cli.train import main

    data = _write_dataset(tmp_path / "data")
    assert main(["--id", "w", "--ckpt", str(tmp_path / "ck"),
                 "--logs", str(tmp_path / "lg"), "--epochs", "1",
                 "--backbone", "resnet18", "--train_root_dir", data,
                 "--valid_root_dir", data,
                 "--batch_size_train", "2", "--batch_size_valid", "2",
                 "--num_workers", "0",
                 "--wire", "dct", "--save_every", "100",
                 "--lr", "1e-3"]) == 0
    head, _ = _read(str(tmp_path / "ck" / "w" / "checkpoint.ckpt"))
    assert head["epoch"] == 1
