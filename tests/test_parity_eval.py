"""tools/parity_eval.py end-to-end on the committed golden fixture.

The harness is the "weights arrive -> parity verified" path (VERDICT r3
next-steps #4): it must work before real published checkpoints ever
show up. Here it runs convert -> inference -> eval -> verdict on the
committed briefly-trained resnet18 and the fixture room, and the
pass/fail logic is pinned both ways.
"""

import importlib.util
import json
import glob
import os
import shutil

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(ROOT, "tests", "fixtures", "golden")
CKPT = os.path.join(FIXDIR, "resnet18_rnn_synth.ckpt")

pytestmark = pytest.mark.skipif(not os.path.isfile(CKPT),
                                reason="golden fixtures not built")


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "parity_eval", os.path.join(ROOT, "tools", "parity_eval.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def harness_run(tmp_path_factory):
    """One full harness run (ckpt -> jsons -> metrics), reused below."""
    tool = _load_tool()
    root = tmp_path_factory.mktemp("ds")
    os.makedirs(root / "img")
    os.makedirs(root / "label_cor")
    shutil.copy(os.path.join(FIXDIR, "val_room.png"),
                root / "img" / "val_room.png")
    shutil.copy(os.path.join(FIXDIR, "val_room_cor.txt"),
                root / "label_cor" / "val_room.txt")
    out = tmp_path_factory.mktemp("out")
    rc = tool.main(["--pth", CKPT, "--root_dir", str(root),
                    "--dataset", "custom", "--mode", "general",
                    "--output_dir", str(out), "--batch_size", "1"])
    return tool, root, out, rc


def test_harness_runs_and_writes_outputs(harness_run):
    tool, root, out, rc = harness_run
    assert rc == 0                      # no expectations -> informational
    jsons = glob.glob(str(out / "dt" / "*.json"))
    assert len(jsons) == 1
    dt = json.load(open(jsons[0]))
    assert len(dt["uv"]) >= 8 and len(dt["uv"]) % 2 == 0
    assert np.isfinite(dt["z1"])


def test_harness_metrics_and_verdicts(harness_run):
    tool, root, out, rc = harness_run
    metrics, n = tool.eval_general_metrics(
        str(root / "label_cor" / "*txt"), str(out / "dt" / "*.json"),
        1024, 512)
    assert n == 1
    assert set(metrics) == {"2DIoU", "3DIoU", "rmse", "delta_1"}
    assert 0 <= metrics["3DIoU"] <= 100

    # verdict logic: measured value passes within tol, absurd one fails
    ok = tool.report("custom", "general", n, metrics,
                     {"3DIoU": metrics["3DIoU"]}, {"3DIoU": 1.0})
    assert ok == []
    bad = tool.report("custom", "general", n, metrics,
                      {"3DIoU": metrics["3DIoU"] + 50}, {"3DIoU": 1.0})
    assert bad == ["3DIoU"]


def test_expect_and_tol_flag_parsing(harness_run, tmp_path):
    """--expect/--tol overrides drive the exit status (2 on failure)."""
    tool, root, out, rc = harness_run
    metrics, _ = tool.eval_general_metrics(
        str(root / "label_cor" / "*txt"), str(out / "dt" / "*.json"),
        1024, 512)
    rc_fail = tool.main(["--pth", CKPT, "--root_dir", str(root),
                         "--dataset", "custom", "--mode", "general",
                         "--output_dir", str(tmp_path),
                         "--batch_size", "1",
                         "--expect", "3DIoU=%.2f" % (metrics["3DIoU"] + 50),
                         "--tol", "3DIoU=0.5"])
    assert rc_fail == 2
    rc_pass = tool.main(["--pth", CKPT, "--root_dir", str(root),
                         "--dataset", "custom", "--mode", "general",
                         "--output_dir", str(tmp_path),
                         "--batch_size", "1",
                         "--expect", "3DIoU=%.2f" % metrics["3DIoU"]])
    assert rc_pass == 0


def test_presets_cover_published_tables():
    tool = _load_tool()
    assert tool.PRESETS["panocontext"]["expect"]["3DIoU"] == 83.39
    assert tool.PRESETS["st3d"]["expect"]["3DIoU"] == 91.31
    assert tool.PRESETS["zind_raw"]["force_raw"] is True
    assert tool.PRESETS["stanford2d3d"]["gt_pattern"] == "camera*txt"
