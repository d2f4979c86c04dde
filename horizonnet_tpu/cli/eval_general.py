"""General-layout evaluation CLI (reference eval_general.py:125-173 surface)."""

import argparse
import json
import sys

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--dt_glob", required=True,
                        help="quoted glob of inference output jsons")
    parser.add_argument("--gt_glob", required=True,
                        help="quoted glob of GT corner txts")
    parser.add_argument("--w", default=1024, type=int)
    parser.add_argument("--h", default=512, type=int)
    args = parser.parse_args(argv)

    from ..evals import (test_general, new_general_losses, summarize_general,
                         prepare_gtdt_pairs)

    gtdt_pairs = prepare_gtdt_pairs(args.gt_glob, args.dt_glob)
    losses = new_general_losses()
    for gt_path, dt_path in gtdt_pairs:
        with open(gt_path) as f:
            gt_cor_id = np.array([l.split() for l in f], np.float32)
        with open(dt_path) as f:
            dt = json.load(f)
        dt_cor_id = np.array(dt["uv"], np.float32)
        dt_cor_id[:, 0] *= args.w
        dt_cor_id[:, 1] *= args.h
        test_general(dt_cor_id, gt_cor_id, args.w, args.h, losses,
                     gt_path=gt_path)

    summarize_general(losses)
    return 0


if __name__ == "__main__":
    sys.exit(main())
