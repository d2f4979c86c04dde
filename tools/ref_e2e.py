"""Measure the REFERENCE HorizonNet pipeline end-to-end on this host.

Produces REF_E2E.json — the measured divisor for bench.py's
``e2e_vs_baseline`` (raw pano -> VP alignment -> forward -> Manhattan
post-processing -> corners). The reference is run exactly as its CLIs
do for this task: preprocess.py:56-66 under ``--rgbonly``
(panoEdgeDetection + the RGB rotatePanorama warp; the aligned line map
is LayoutNet input, not HorizonNet's — preprocess.py:70-72 is the
reference's own flag for skipping it, matching bench.py's
want_pano_edge=False path like-for-like) and inference.py:65-141
(``inference(net, x, device, force_cuboid=True)``), strictly serially
per pano, which is how the reference processes datasets
(preprocess.py:52, inference.py:192). Note panoEdgeDetection still
paints its internal pano edge map (pano_lsd_align.py:856-859) — the
reference pays that even under --rgbonly because it is unconditional
inside the function; our pipeline makes it optional, which is a
disclosed pipeline improvement, not skipped contract work.

The environment lacks four of the reference's binary deps; each gets a
minimal shim chosen to be timing-neutral or GENEROUS to the reference:

- ``pylsd.lsd``      -> our C++ LSD (same von Gioi algorithm; pylsd is
                        also a C extension, so this is speed-neutral at
                        worst and slightly generous: ours batches 26
                        views through one call when asked, but the shim
                        keeps the reference's per-view call shape).
- ``cv2``            -> numpy grayscale (exact ITU-R 601) + segment
                        raster for cv2.line; both are ms-scale helpers.
- ``torchvision``    -> tests/torch_replica.py: a state-dict-exact
                        architecture replica (validated against the
                        flax forward to 2e-4, tests/test_full_parity).
                        Same torch CPU kernels the reference would run.
- ``shapely``        -> stub; never called under force_cuboid=True
                        (inference.py:114 branch is general-mode only).
- ``sklearn.PCA``    -> stub; imported by misc/post_proc.py:4 but only
                        used by get_rot_rad, which the pipeline never
                        calls.

Usage: python tools/ref_e2e.py [--n 3] [--out REF_E2E.json]
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
DEMO_RAW = os.path.join(REFERENCE, "assets/demo.png")


def install_shims():
    """Stub the reference's missing binary deps (see module docstring)."""
    # --- pylsd -> in-house C++ LSD --------------------------------------
    sys.path.insert(0, REPO)
    from horizonnet_tpu.preprocess.lsd import lsd as our_lsd

    pylsd = types.ModuleType("pylsd")

    def lsd(img, quant=2.0, **kw):
        # pylsd returns (N, 5) [x1 y1 x2 y2 width]; ours adds log_nfa
        return our_lsd(img, quant=quant, **kw)[:, :5]

    pylsd.lsd = lsd
    sys.modules["pylsd"] = pylsd

    # --- cv2: cvtColor + line + ocl toggle ------------------------------
    cv2 = types.ModuleType("cv2")
    cv2.COLOR_RGB2GRAY = 7

    def cvtColor(img, code):
        assert code == cv2.COLOR_RGB2GRAY
        w = np.asarray([0.299, 0.587, 0.114])
        out = img.astype(np.float64) @ w
        if img.dtype == np.uint8:
            return np.round(out).astype(np.uint8)
        return out.astype(img.dtype)

    def line(canvas, pt1, pt2, color, thickness=1):
        x1, y1 = pt1
        x2, y2 = pt2
        n = int(max(abs(x2 - x1), abs(y2 - y1), 1)) * 2
        ts = np.linspace(0, 1, n + 1)
        xs = np.round(x1 + ts * (x2 - x1)).astype(int)
        ys = np.round(y1 + ts * (y2 - y1)).astype(int)
        r = max(int(thickness) // 2, 0)
        H, W = canvas.shape[:2]
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                canvas[np.clip(ys + dy, 0, H - 1),
                       np.clip(xs + dx, 0, W - 1)] = color
        return canvas

    cv2.cvtColor = cvtColor
    cv2.line = line
    cv2.ocl = types.SimpleNamespace(setUseOpenCL=lambda *_: None)
    sys.modules["cv2"] = cv2

    # --- shapely: force_cuboid never reaches Polygon ---------------------
    shapely = types.ModuleType("shapely")
    geometry = types.ModuleType("shapely.geometry")

    class Polygon:  # pragma: no cover - never invoked under force_cuboid
        def __init__(self, *a, **k):
            raise RuntimeError("shapely stub invoked — general-mode "
                               "timing needs real shapely")

    geometry.Polygon = Polygon
    shapely.geometry = geometry
    sys.modules["shapely"] = shapely
    sys.modules["shapely.geometry"] = geometry

    # --- sklearn.decomposition.PCA: imported, never called --------------
    sklearn = types.ModuleType("sklearn")
    decomposition = types.ModuleType("sklearn.decomposition")

    class PCA:  # pragma: no cover
        def __init__(self, *a, **k):
            raise RuntimeError("sklearn stub invoked")

    decomposition.PCA = PCA
    sklearn.decomposition = decomposition
    sys.modules["sklearn"] = sklearn
    sys.modules["sklearn.decomposition"] = decomposition

    # --- model / dataset modules the reference inference.py imports -----
    # (HorizonNet only used via load_trained_model, visualize_a_data only
    # under --visualize; neither is in the timed path)
    model_mod = types.ModuleType("model")
    model_mod.HorizonNet = object
    sys.modules["model"] = model_mod
    dataset_mod = types.ModuleType("dataset")
    dataset_mod.visualize_a_data = lambda *a, **k: None
    sys.modules["dataset"] = dataset_mod


_RUN_KEYS = ("e2e_panos_per_sec", "e2e_panos_per_sec_gpu_adj",
             "preprocess_s_per_pano", "infer_postproc_s_per_pano",
             "forward_s_per_pano", "host_post_s_per_pano", "n_timed",
             "pipeline")

# README-derived GPU forward estimate for the reference (bench.py
# docstring: ~45 GFLOPs -> 12-19 ms on a V100/A100-class part at batch-1
# utilization); the FAST end, generous to the reference.
GPU_FWD_S = 0.012


def merge_runs(prev, result):
    """Divisor = max over runs (conservative against our ratio).

    The sandbox core's speed swings ~30% between runs, and crediting the
    reference its best observed time keeps e2e_vs_baseline conservative.
    Prior runs (including the pre-rgbonly pipeline, which did MORE work
    per pano) are kept in the "runs" history; the top-level figures are
    copied from the fastest run. ``prev`` is the previously written JSON
    (or None); ``result`` is this run's fresh record.
    """
    runs = []
    if prev is not None:
        runs = list(prev.get("runs", []))
        if not runs and "e2e_panos_per_sec" in prev:
            runs.append({k: prev[k] for k in _RUN_KEYS if k in prev})
    runs.append({k: result[k] for k in _RUN_KEYS if k in result})
    best = max(runs, key=lambda r: r["e2e_panos_per_sec"])
    result = dict(result)
    result["runs"] = runs
    for k in _RUN_KEYS:
        if k in best:
            result[k] = best[k]
    # gpu_adj divisor, rebuilt from the FASTEST components observed
    # across all runs (this 1-core host swings ~30% run to run; taking
    # each stage's best keeps the divisor conservative against our
    # e2e_vs_baseline_gpu_adj, same policy as the main divisor)
    pres = [r["preprocess_s_per_pano"] for r in runs]
    posts = [r["host_post_s_per_pano"] for r in runs
             if "host_post_s_per_pano" in r]
    if posts:
        result["e2e_panos_per_sec_gpu_adj"] = round(
            1.0 / (min(pres) + min(posts) + GPU_FWD_S), 4)
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=3,
                        help="timed panos per stage (after 1 warmup)")
    parser.add_argument("--out", default=os.path.join(REPO, "REF_E2E.json"))
    args = parser.parse_args()

    install_shims()
    sys.path.insert(0, REFERENCE)

    from PIL import Image
    import torch

    from misc.pano_lsd_align import panoEdgeDetection, rotatePanorama
    import inference as ref_inference

    sys.path.insert(0, os.path.join(REPO, "tests"))
    # state-dict-exact HorizonNet replica (resnet50_rnn)
    from torch_replica import TorchHorizonNetReplica, small_init_

    img_ori = np.array(Image.open(DEMO_RAW)
                       .resize((1024, 512), Image.BICUBIC))[..., :3]

    # ---- reference preprocess (preprocess.py:56-66, --rgbonly path) -----
    # --rgbonly (preprocess.py:70-72) skips the l_img edge-map rotation;
    # that is the reference's own raw-pano->corners configuration and the
    # like-for-like twin of bench.py's want_pano_edge=False numerator.
    def ref_preprocess(img):
        _, vp, _, _, _, _, _ = panoEdgeDetection(img, qError=0.7,
                                                 refineIter=3)
        i_img = rotatePanorama(img / 255.0, vp[2::-1])
        return i_img

    i_img = ref_preprocess(img_ori)             # warmup
    t0 = time.time()
    for _ in range(args.n):
        i_img = ref_preprocess(img_ori)
    t_pre = (time.time() - t0) / args.n
    print(f"reference preprocess: {t_pre:.2f} s/pano", file=sys.stderr)

    # ---- reference inference (inference.py:189-208, force_cuboid) ------
    net = small_init_(TorchHorizonNetReplica()).eval()
    x = torch.FloatTensor(np.transpose(
        i_img.astype(np.float32), (2, 0, 1))[None])
    with torch.no_grad():
        ref_inference.inference(net, x, "cpu", force_cuboid=True)  # warmup
        t0 = time.time()
        for _ in range(args.n):
            cor_id, z0, z1, _ = ref_inference.inference(
                net, x, "cpu", force_cuboid=True)
        t_inf = (time.time() - t0) / args.n
        # bare net forward, to split t_inf into forward vs host postproc
        # (feeds the GPU-adjusted divisor below)
        net(x)  # warmup
        t0 = time.time()
        for _ in range(args.n):
            net(x)
        t_fwd = (time.time() - t0) / args.n
    assert len(cor_id) == 8 and np.isfinite(z1)
    print(f"reference forward+postproc: {t_inf:.2f} s/pano "
          f"(bare forward {t_fwd:.2f})", file=sys.stderr)

    e2e = 1.0 / (t_pre + t_inf)
    # GPU-adjusted divisor: BASELINE.json's north star says "vs
    # PyTorch-GPU", but this host can only run the reference's forward on
    # CPU. Replace the measured CPU forward with the GPU estimate derived
    # in bench.py's docstring from the reference's own FLOP count (12-19
    # ms on a V100/A100-class part at batch-1 utilization); take the FAST
    # end (12 ms, generous to the reference). Preprocess and the host
    # Manhattan postproc are CPU-only in the reference either way
    # (SURVEY.md §3.1-3.2: no GPU touches preprocess.py or post_proc.py).
    t_host_post = max(t_inf - t_fwd, 0.0)
    e2e_gpu_adj = 1.0 / (t_pre + t_host_post + GPU_FWD_S)
    result = {
        "e2e_panos_per_sec": round(e2e, 4),
        "e2e_panos_per_sec_gpu_adj": round(e2e_gpu_adj, 4),
        "gpu_adj_policy": "CPU forward replaced by the 12 ms GPU-forward "
                          "estimate (fast end of bench.py's 12-19 ms "
                          "derivation, generous to the reference); "
                          "preprocess + host Manhattan postproc stay "
                          "measured (CPU-only in the reference); "
                          "rebuilt from the fastest stage times across "
                          "recorded runs",
        "forward_s_per_pano": round(t_fwd, 3),
        "host_post_s_per_pano": round(t_host_post, 3),
        "divisor_policy": "max over recorded runs — this 1-core sandbox "
                          "host varies ~30% run to run, so the divisor "
                          "keeps the FASTEST reference figure observed "
                          "(conservative against our e2e_vs_baseline)",
        "preprocess_s_per_pano": round(t_pre, 3),
        "infer_postproc_s_per_pano": round(t_inf, 3),
        "n_timed": args.n,
        "nproc": os.cpu_count(),
        "torch_threads": torch.get_num_threads(),
        "host": "this sandbox (reference runs on CPU; it has no TPU path)",
        "shims": ["pylsd->in-house C++ LSD (speed-neutral/generous)",
                  "cv2->numpy gray+line", "torchvision->torch_replica",
                  "shapely,sklearn->unused stubs"],
        "pipeline": "preprocess.py:56-66 --rgbonly (RGB warp only, like-"
                    "for-like with bench's want_pano_edge=False) + "
                    "inference.py force_cuboid, strictly serial per pano "
                    "as the reference CLIs run",
    }
    result = merge_runs(json.load(open(args.out)) if
                        os.path.isfile(args.out) else None, result)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
