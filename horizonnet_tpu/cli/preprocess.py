"""Preprocess CLI: VP detection + alignment warps + line maps.

Reference surface: preprocess.py. Writes per input pano:
- ``{name}_VP.txt``       3x3 vanishing-point rows (same order/format)
- ``{name}_aligned_rgb.png``  VP-aligned pano
- ``{name}_aligned_line.png`` VP-aligned 3-channel line-segment raster
or just ``{name}.png`` with --rgbonly.
"""

import argparse
import glob
import os
import sys

import numpy as np


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
    args = parser.parse_args(argv)

    from PIL import Image
    from ..preprocess import pano_edge_detection, rotate_panorama_uint8

    paths = sorted(glob.glob(args.img_glob))
    if len(paths) == 0:
        print("no images found", file=sys.stderr)
        return 1
    os.makedirs(args.output_dir, exist_ok=True)

    try:  # progress: this is the reference's slowest stage (README TODO)
        from tqdm import tqdm
        paths_iter = tqdm(paths, unit="pano")
    except ImportError:
        paths_iter = paths
    for i_path in paths_iter:
        print("Processing", i_path, flush=True)
        img_ori = np.array(Image.open(i_path).resize(
            (1024, 512), Image.BICUBIC))[..., :3]

        result = pano_edge_detection(img_ori, q_error=args.q_error,
                                     refine_iter=args.refine_iter)
        vp = result["vp"]
        if vp is None:
            print(f"[WARN] VP detection failed for {i_path}",
                  file=sys.stderr)
            continue
        pano_edge = (result["pano_edge"] > 0)

        # RGB + line raster warped in ONE device program ([H, W, 6]),
        # uint8 both ways across the link (the PNGs are uint8 anyway)
        both = np.concatenate(
            [img_ori, pano_edge.astype(np.uint8) * 255], axis=-1)
        both = rotate_panorama_uint8(both, vp[2::-1])
        i_img, l_img = both[..., :3], both[..., 3:]

        basename = os.path.splitext(os.path.basename(i_path))[0]
        if args.rgbonly:
            Image.fromarray(i_img) \
                .save(os.path.join(args.output_dir, f"{basename}.png"))
        else:
            with open(os.path.join(args.output_dir,
                                   f"{basename}_VP.txt"), "w") as f:
                for i in range(3):
                    f.write("%.6f %.6f %.6f\n" % tuple(vp[i]))
            Image.fromarray(i_img) \
                .save(os.path.join(args.output_dir,
                                   f"{basename}_aligned_rgb.png"))
            Image.fromarray(l_img) \
                .save(os.path.join(args.output_dir,
                                   f"{basename}_aligned_line.png"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
