"""Standalone VP-detection debug harness (one image, timing + overlays).

Reference surface: the __main__ harness of misc/pano_lsd_align.py:871-914
— runs VP detection on a single pano, prints elapsed time and the
vanishing points, and dumps three diagnostics: the VP-aligned edge map
(_edg.png), the VP-aligned pano (_img.png), and a composite overlay with
line classes painted over a dimmed pano (_one.png).
"""

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--i", required=True, help="input pano image")
    parser.add_argument("--o_prefix", required=True,
                        help="output path prefix for _edg/_img/_one.png")
    parser.add_argument("--qError", default=0.7, type=float)
    parser.add_argument("--refineIter", default=3, type=int)
    args = parser.parse_args(argv)

    from PIL import Image
    from ..utils import enable_compilation_cache
    enable_compilation_cache()
    from ..preprocess import pano_edge_detection, rotate_panorama

    img_ori = np.array(Image.open(args.i).resize((1024, 512)))[..., :3]

    s_time = time.time()
    result = pano_edge_detection(img_ori, q_error=args.qError,
                                 refine_iter=args.refineIter)
    print("Elapsed time: %.2f" % (time.time() - s_time))
    vp = result["vp"]
    if vp is None:
        print("VP estimation failed (degenerate line set)", file=sys.stderr)
        return 1
    pano_edge = result["pano_edge"] > 0

    print("Vanishing point:")
    for v in vp[2::-1]:
        print("%.6f %.6f %.6f" % tuple(v))

    edg = np.asarray(rotate_panorama(pano_edge.astype(np.float32),
                                     vp[2::-1]))
    img = np.asarray(rotate_panorama(img_ori.astype(np.float32) / 255.0,
                                     vp[2::-1]))
    one = img.copy() * 0.5
    one[(edg > 0.5).sum(-1) > 0] = 0
    for c in range(3):
        one[edg[..., c] > 0.5, c] = 1
    Image.fromarray((edg * 255).astype(np.uint8)).save(
        f"{args.o_prefix}_edg.png")
    Image.fromarray((img * 255).astype(np.uint8)).save(
        f"{args.o_prefix}_img.png")
    Image.fromarray((one * 255).astype(np.uint8)).save(
        f"{args.o_prefix}_one.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
