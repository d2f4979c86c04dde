"""Sweep dct wire budgets on the trained golden checkpoint.

For each (luma_m, chroma_m) budget: wire KiB/pano, demo-pano PSNR, and —
the metric that matters — max corner shift (px) and z1 shift of the
fused cuboid serving path vs the float-RGB path, using the committed
golden resnet18_rnn weights (tests/fixtures/golden). Run on the CPU
platform (same as the golden tests) so numbers are deterministic:

    JAX_PLATFORMS=cpu python tools/dct_sweep.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "golden")
DEMO = "/root/reference/assets/preprocessed/demo_aligned_rgb.png"

BUDGETS = [(6, 3), (10, 4), (15, 6), (21, 10), (28, 15)]


def main():
    from PIL import Image
    import jax

    from horizonnet_tpu.inference import InferenceEngine
    from horizonnet_tpu.postproc import unpack_cuboid_outputs
    from horizonnet_tpu.ops.dct import (pack_dct, unpack_dct_to_rgb,
                                        dct_wire_shape)
    from horizonnet_tpu.train.checkpoint import load_trained_model

    model, variables = load_trained_model(
        os.path.join(FIXDIR, "resnet18_rnn_synth.ckpt"))
    img = np.asarray(Image.open(os.path.join(FIXDIR, "val_room.png")),
                     np.float32)[None] / 255.0
    rgb = (img * 255).astype(np.uint8)
    demo = np.asarray(Image.open(DEMO))[None, ..., :3]

    engf = InferenceEngine(model, variables, batch_size=1, postproc="cuboid")
    cf, z1f = unpack_cuboid_outputs(engf(img))

    print(f"{'budget':>8} {'KiB':>6} {'psnr':>6} {'dcorner_px':>10} "
          f"{'dz1':>6}")
    for ym, cm in BUDGETS:
        kib = dct_wire_shape(1, 512, 1024, ym, cm)[1] / 1024
        rec = np.asarray(unpack_dct_to_rgb(
            pack_dct(demo, ym, cm), 512, 1024, ym, cm)) * 255.0
        err = rec - demo.astype(np.float64)
        psnr = 10 * np.log10(255.0 ** 2 / np.mean(err ** 2))
        engd = InferenceEngine(model, variables, batch_size=1,
                               postproc="cuboid", input_format="dct",
                               dct_luma_m=ym, dct_chroma_m=cm)
        cd, z1d = unpack_cuboid_outputs(engd(pack_dct(rgb, ym, cm)))
        dpx = (np.abs(cd - cf) * np.array([1024.0, 512.0])).max()
        dz1 = abs(float(z1d[0]) - float(z1f[0]))
        print(f"({ym:2d},{cm:2d}) {kib:6.0f} {psnr:6.2f} {dpx:10.2f} "
              f"{dz1:6.2f}")
        del engd

    # dct4 (block-floating-point nibble wire) across the same budgets —
    # this is the serving wire, so its Pareto decides the bench default
    from horizonnet_tpu.ops.dct import (pack_dct4, unpack_dct4_to_rgb,
                                        dct4_wire_shape)
    for ym, cm in BUDGETS:
        kib = dct4_wire_shape(1, 512, 1024, ym, cm)[1] / 1024
        rec = np.asarray(unpack_dct4_to_rgb(
            pack_dct4(demo, ym, cm), 512, 1024, ym, cm)) * 255.0
        err = rec - demo.astype(np.float64)
        psnr = 10 * np.log10(255.0 ** 2 / np.mean(err ** 2))
        engd = InferenceEngine(model, variables, batch_size=1,
                               postproc="cuboid", input_format="dct4",
                               dct_luma_m=ym, dct_chroma_m=cm)
        cd, z1d = unpack_cuboid_outputs(engd(pack_dct4(rgb, ym, cm)))
        dpx = (np.abs(cd - cf) * np.array([1024.0, 512.0])).max()
        dz1 = abs(float(z1d[0]) - float(z1f[0]))
        print(f"dct4({ym:2d},{cm:2d}) {kib:4.0f} {psnr:6.2f} {dpx:10.2f} "
              f"{dz1:6.2f}")
        del engd
    del engf
    jax.clear_caches()


if __name__ == "__main__":
    main()
