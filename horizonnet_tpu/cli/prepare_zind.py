"""Zillow Indoor (ZInD) dataset preparation.

Reference surface: misc/zind_prepare_dataset.py. Converts each pano's
``merger`` layout tree into the corner-txt format: vertices -> (theta, phi)
-> pixel coords, filtered by layout_visible / is_primary / is_inside /
is_ceiling_flat flags. Fixes the reference's swapped-argument bug on the
non-parallel path (zind_prepare_dataset.py:105).
"""

import argparse
import functools
import json
import multiprocessing
import os
import sys

import numpy as np


def label_iterator(label):
    for floor_id, floor_data in label["merger"].items():
        for complete_room_id, complete_room_data in floor_data.items():
            for partial_room_id, partial_room_data in complete_room_data.items():
                for pano_id, pano_data in partial_room_data.items():
                    yield floor_id, partial_room_id, pano_id, pano_data


def _tri_filter(flag_value, wanted):
    """wanted: -1 don't care / 0 false only / 1 true only."""
    if wanted == -1:
        return True
    return bool(flag_value) == bool(wanted)


def convert_scene(scene_id, split, args):
    from PIL import Image

    with open(os.path.join(args.indir, scene_id, "zind_data.json")) as f:
        label = json.load(f)
    for floor_id, partial_room_id, pano_id, pano_data in label_iterator(label):
        if args.geometry not in pano_data:
            continue
        if not _tri_filter(pano_data["is_primary"], args.is_primary):
            continue
        if not _tri_filter(pano_data["is_inside"], args.is_inside):
            continue
        if not _tri_filter(pano_data.get("is_ceiling_flat", False),
                           args.is_ceiling_flat):
            continue
        key = f"{floor_id}_{partial_room_id}_{pano_id}"
        img_path = os.path.join(args.indir, scene_id, "panos", f"{key}.jpg")
        assert os.path.isfile(img_path), f"Image not found {img_path}"

        floor_z = -pano_data["camera_height"]
        ceiling_z = pano_data["ceiling_height"] - pano_data["camera_height"]
        vertices = np.array(pano_data[args.geometry]["vertices"])
        theta = np.arctan2(-vertices[:, 0], vertices[:, 1])
        dist = np.sqrt((vertices ** 2).sum(1))
        ceiling_phi = np.arctan2(ceiling_z, dist)
        floor_phi = np.arctan2(floor_z, dist)
        coor_x = (theta + np.pi) / (2.0 * np.pi) * (args.width - 1)
        coor_y0 = (1 - (ceiling_phi + np.pi / 2.0) / np.pi) * (args.width / 2 - 1)
        coor_y1 = (1 - (floor_phi + np.pi / 2.0) / np.pi) * (args.width / 2 - 1)

        img = Image.open(img_path).resize((args.width, args.width // 2),
                                          Image.LANCZOS)
        img.save(os.path.join(args.outdir, split, "img",
                              f"{scene_id}_{key}.jpg"),
                 quality=95, optimize=True)
        with open(os.path.join(args.outdir, split, "label_cor",
                               f"{scene_id}_{key}.txt"), "w") as f:
            for i in range(len(coor_x)):
                f.write(f"{coor_x[i]:.1f} {coor_y0[i]:.1f}\n")
                f.write(f"{coor_x[i]:.1f} {coor_y1[i]:.1f}\n")


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--partition", default="zind_partition.json")
    parser.add_argument("--indir", default="data/")
    parser.add_argument("--outdir", default="zind_horizonnet/")
    parser.add_argument("--width", default=1024, type=int)
    parser.add_argument("--geometry", default="layout_visible")
    parser.add_argument("--is_primary", default=1, choices=[-1, 0, 1], type=int)
    parser.add_argument("--is_inside", default=1, choices=[-1, 0, 1], type=int)
    parser.add_argument("--is_ceiling_flat", default=1, choices=[-1, 0, 1],
                        type=int)
    parser.add_argument("--num_workers", default=10, type=int)
    args = parser.parse_args(argv)

    assert os.path.isfile(args.partition), f"Partition not found: {args.partition}"
    assert os.path.exists(args.indir), f"Dir not found: {args.indir}"
    with open(args.partition) as f:
        partition = json.load(f)

    for split, scene_ids in partition.items():
        os.makedirs(os.path.join(args.outdir, split, "img"), exist_ok=True)
        os.makedirs(os.path.join(args.outdir, split, "label_cor"),
                    exist_ok=True)
        print(f"Processing split: {split}", flush=True)
        if args.num_workers > 1:
            fn = functools.partial(convert_scene, split=split, args=args)
            with multiprocessing.Pool(args.num_workers) as pool:
                for _ in pool.imap(fn, scene_ids):
                    pass
        else:
            for scene_id in scene_ids:
                convert_scene(scene_id, split, args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
