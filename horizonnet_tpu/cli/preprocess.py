"""Preprocess CLI: VP detection + alignment warps + line maps.

Reference surface: preprocess.py. Writes per input pano:
- ``{name}_VP.txt``       3x3 vanishing-point rows (same order/format)
- ``{name}_aligned_rgb.png``  VP-aligned pano
- ``{name}_aligned_line.png`` VP-aligned 3-channel line-segment raster
or just ``{name}.png`` with --rgbonly.

Panos are independent, so the stage parallelizes across a thread pool
(--num_workers): the C++ LSD detector and the device dispatch both
release the GIL, and per-pano host numpy + PNG encode overlap across
threads. The reference processes its 20k-pano datasets strictly
serially (preprocess.py:52).
"""

import argparse
import glob
import os
import sys

import numpy as np


def _process_one(i_path, args, lsd_workers=None):
    from PIL import Image
    from ..preprocess import pano_edge_detection, rotate_panorama_uint8
    from ..utils.profiling import stage_timer

    with stage_timer("preprocess/decode"):
        img_ori = np.array(Image.open(i_path).resize(
            (1024, 512), Image.BICUBIC))[..., :3]

    result = pano_edge_detection(img_ori, q_error=args.q_error,
                                 refine_iter=args.refine_iter,
                                 want_pano_edge=not args.rgbonly,
                                 lsd_workers=lsd_workers)
    vp = result["vp"]
    if vp is None:
        return f"[WARN] VP detection failed for {i_path}"

    basename = os.path.splitext(os.path.basename(i_path))[0]
    if args.rgbonly:
        with stage_timer("preprocess/rotate"):
            i_img = rotate_panorama_uint8(img_ori, vp[2::-1])
        with stage_timer("preprocess/encode_png"):
            Image.fromarray(i_img) \
                .save(os.path.join(args.output_dir, f"{basename}.png"),
                      compress_level=1)
    else:
        # RGB + line raster warped in ONE device program ([H, W, 6]),
        # uint8 both ways across the link (the PNGs are uint8 anyway)
        with stage_timer("preprocess/rotate"):
            pano_edge = (result["pano_edge"] > 0)
            both = np.concatenate(
                [img_ori, pano_edge.astype(np.uint8) * 255], axis=-1)
            both = rotate_panorama_uint8(both, vp[2::-1])
            i_img, l_img = both[..., :3], both[..., 3:]
        with open(os.path.join(args.output_dir,
                               f"{basename}_VP.txt"), "w") as f:
            for i in range(3):
                f.write("%.6f %.6f %.6f\n" % tuple(vp[i]))
        with stage_timer("preprocess/encode_png"):
            # zlib level 1: 56 vs 213 ms/pano measured for ~17% more
            # bytes — these PNGs are pipeline intermediates, not archives
            Image.fromarray(i_img) \
                .save(os.path.join(args.output_dir,
                                   f"{basename}_aligned_rgb.png"),
                      compress_level=1)
            Image.fromarray(l_img) \
                .save(os.path.join(args.output_dir,
                                   f"{basename}_aligned_line.png"),
                      compress_level=1)
    return None


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--img_glob", required=True,
                        help="quoted glob of input panos")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--rgbonly", action="store_true",
                        help="only write the aligned RGB (custom datasets)")
    parser.add_argument("--q_error", default=0.7, type=float)
    parser.add_argument("--refine_iter", default=3, type=int)
    parser.add_argument("--num_workers", default=0, type=int,
                        help="thread pool size for pano-level parallelism "
                             "(0 = min(8, cpu_count))")
    parser.add_argument("--profile", action="store_true",
                        help="print per-stage wall-clock totals to stderr "
                             "at exit (utils.profiling.stage_timer)")
    args = parser.parse_args(argv)

    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    paths = sorted(glob.glob(args.img_glob))
    if len(paths) == 0:
        print("no images found", file=sys.stderr)
        return 1
    os.makedirs(args.output_dir, exist_ok=True)

    workers = args.num_workers or min(8, os.cpu_count() or 1)
    workers = min(workers, len(paths))

    try:  # progress: this is the reference's slowest stage (README TODO)
        from tqdm import tqdm
    except ImportError:
        tqdm = None

    def _report():
        if args.profile:
            from ..utils.profiling import stage_timer
            print(stage_timer.report(), file=sys.stderr)

    if workers <= 1:
        it = tqdm(paths, unit="pano") if tqdm else paths
        for i_path in it:
            warn = _process_one(i_path, args)
            if warn:
                print(warn, file=sys.stderr)
        _report()
        return 0

    # Split the cores between the pano pool and each pano's inner LSD
    # fan-out: ``workers`` panos in flight each get cpu/workers LSD
    # threads instead of a full cpu_count pool per pano
    inner = max(1, (os.cpu_count() or 1) // workers)
    from concurrent.futures import ThreadPoolExecutor, as_completed
    with ThreadPoolExecutor(workers) as pool:
        futs = {pool.submit(_process_one, p, args, inner): p for p in paths}
        done = as_completed(futs)
        if tqdm:
            done = tqdm(done, total=len(futs), unit="pano")
        for fut in done:
            warn = fut.result()
            if warn:
                print(warn, file=sys.stderr)
    _report()
    return 0


if __name__ == "__main__":
    sys.exit(main())
