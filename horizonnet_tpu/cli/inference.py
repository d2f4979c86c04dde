"""Inference CLI: glob of aligned panos -> {z0, z1, uv} JSON per pano.

Reference surface: inference.py:144-223. Same flags; adds --batch_size
(the reference processes one pano per step; batching is the TPU win).
"""

import argparse
import glob
import json
import os
import sys

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--pth", required=True,
                        help="checkpoint (.ckpt ours or reference .pth)")
    parser.add_argument("--img_glob", required=True,
                        help="quoted glob of VP-aligned input panos")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--visualize", action="store_true")
    parser.add_argument("--flip", action="store_true",
                        help="left-right flip test-time augmentation")
    parser.add_argument("--rotate", nargs="*", default=[], type=float,
                        help="horizontal rotation TTA (fractions of width)")
    parser.add_argument("--r", default=0.05, type=float)
    parser.add_argument("--min_v", default=None, type=float)
    parser.add_argument("--force_cuboid", action="store_true")
    parser.add_argument("--force_raw", action="store_true")
    parser.add_argument("--device_postproc", action="store_true",
                        help="fuse the Manhattan post-processing into the "
                             "device program (cuboid or general per "
                             "--force_cuboid); only [B, <=32, 2] corners "
                             "cross back per batch. Incompatible with "
                             "--force_raw/--visualize/--min_v/--r "
                             "overrides (those take the host path)")
    parser.add_argument("--batch_size", default=4, type=int,
                        help="panos per device step")
    parser.add_argument("--wire", default="uint8",
                        choices=["float", "uint8", "dct"],
                        help="host->device upload format for the "
                             "--device_postproc engine: uint8 panos (4x "
                             "fewer bytes than float, lossless), the "
                             "compressed zig-zag DCT wire (ops/dct.py, "
                             "~42x fewer bytes, lossy ~35 dB), or float")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute for the forward pass")
    parser.add_argument("--s2d_stem", action="store_true",
                        help="space-to-depth rewrite of the resnet stem "
                             "conv (same checkpoint params, identical "
                             "outputs; MXU-friendlier on TPU)")
    parser.add_argument("--quant_int8", action="store_true",
                        help="post-training int8 quantization of the "
                             "resnet encoder for serving (BN folded, "
                             "per-channel weight scales, dynamic "
                             "activation scales; <0.2 px corner drift "
                             "on the committed golden). The checkpoint "
                             "stays float; conversion happens at load")
    parser.add_argument("--lstm_impl", default="auto",
                        choices=["auto", "scan", "pallas"],
                        help="LSTM recurrence: fused Pallas kernel on TPU "
                             "backends, lax.scan elsewhere (auto)")
    parser.add_argument("--profile_dir", default=None,
                        help="write a jax.profiler trace of the serving "
                             "loop to this directory")
    args = parser.parse_args(argv)

    from PIL import Image
    from ..utils import enable_compilation_cache
    enable_compilation_cache()
    from ..train.checkpoint import load_trained_model
    from ..inference import inference

    paths = sorted(glob.glob(args.img_glob))
    if len(paths) == 0:
        print("no images found", file=sys.stderr)
        return 1
    os.makedirs(args.output_dir, exist_ok=True)

    model, variables = load_trained_model(args.pth)
    import jax
    import jax.numpy as jnp
    from ..models import build_model
    lstm_impl = args.lstm_impl
    if lstm_impl == "auto":
        # Pallas lowers for TPU targets only; scan everywhere else
        lstm_impl = ("pallas" if jax.devices()[0].platform == "tpu"
                     else "scan")
    # Serving-time rewrites that reuse the loaded parameter tree: bf16
    # compute, the fused Pallas LSTM, the space-to-depth stem, and the
    # int8 encoder (which also converts the tree, models/quant.py)
    s2d = args.s2d_stem
    if args.bf16 or lstm_impl != "scan" or s2d or args.quant_int8:
        model = build_model(model.backbone, model.use_rnn,
                            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                            seam_pool=model.seam_pool, lstm_impl=lstm_impl,
                            s2d_stem=s2d, quant_int8=args.quant_int8)
    if args.quant_int8:
        from ..models.quant import quantize_variables
        variables = quantize_variables(variables)

    import contextlib
    if args.profile_dir:
        import jax
        profile_cm = jax.profiler.trace(args.profile_dir)
    else:
        profile_cm = contextlib.nullcontext()

    with profile_cm:
        _serve(paths, args, model, variables)
    return 0


def _serve(paths, args, model, variables):
    import json
    import os
    from PIL import Image
    from ..inference import inference
    import numpy as np

    def load(path):
        img = Image.open(path)
        if img.size != (1024, 512):
            img = img.resize((1024, 512), Image.BICUBIC)
        # uint8 until the last moment: the engine path uploads raw bytes
        # (or the dct wire) and normalizes on device
        return np.asarray(img, np.uint8)[..., :3]

    try:  # progress over long globs (ref inference.py:192 uses tqdm too)
        from tqdm import tqdm
        pbar = tqdm(total=len(paths), unit="pano")
    except ImportError:
        pbar = None

    use_device_pp = (args.device_postproc and not args.force_raw
                     and not args.visualize and args.min_v is None
                     and args.r == 0.05)
    if args.device_postproc and not use_device_pp:
        import sys
        print("[WARN] --device_postproc ignored: "
              "--force_raw/--visualize/--min_v/--r take the host path",
              file=sys.stderr)
    engine = None
    if use_device_pp:
        from ..inference import InferenceEngine
        from ..postproc import finish_general_batch
        mode = "cuboid" if args.force_cuboid else "general"
        engine = InferenceEngine(model, variables,
                                 batch_size=args.batch_size,
                                 flip=args.flip, rotate=args.rotate,
                                 postproc=mode, input_format=args.wire)

    from ..utils.profiling import trace_annotation

    chunks = [paths[i:i + args.batch_size]
              for i in range(0, len(paths), args.batch_size)]

    def packed_batches():
        """Lazy ingest: consumed by serve_stream, so reading + wire
        packing of the NEXT chunks overlaps device compute of the
        current one."""
        for chunk in chunks:
            with trace_annotation("serve/ingest"):
                x = np.stack([load(p) for p in chunk])
                # Fixed-batch engine: pad the tail chunk with repeats
                if len(chunk) < args.batch_size:
                    x = np.concatenate(
                        [x, np.repeat(x[-1:], args.batch_size - len(chunk),
                                      0)])
                if args.wire == "dct":
                    from ..ops.dct import pack_dct
                    x = pack_dct(x)
                elif args.wire == "float":
                    x = x.astype(np.float32) / 255.0
            yield x

    def write_results(chunk, results):
        for path, (cor_id, z0, z1, vis) in zip(chunk, results):
            k = os.path.split(path)[-1][:-4]
            with open(os.path.join(args.output_dir, k + ".json"), "w") as f:
                json.dump({
                    "z0": float(z0), "z1": float(z1),
                    "uv": [[float(u), float(v)] for u, v in cor_id],
                }, f)
            if vis is not None:
                vh, vw = vis.shape[:2]
                Image.fromarray(vis).resize((vw // 2, vh // 2),
                                            Image.LANCZOS).save(
                    os.path.join(args.output_dir, k + ".raw.png"))
            if pbar is not None:
                pbar.set_postfix_str(k, refresh=False)
                pbar.update(1)
            else:
                print(k, flush=True)

    if engine is not None:
        from ..inference import serve_stream

        if args.force_cuboid:
            from ..postproc import unpack_cuboid_outputs

            def finish(outs):
                cid, z1 = unpack_cuboid_outputs(outs)
                return [(cid[b], 50.0, float(z1[b]), None)
                        for b in range(len(cid))]
        else:
            def finish(outs):
                with trace_annotation("serve/general_finish"):
                    return [(c, z0, z1, None) for c, z0, z1 in
                            finish_general_batch(outs)]

        # Lazy ingest generator + depth-3 stream: reads/packing/uploads
        # of upcoming chunks, the finish tail (worker thread), and JSON
        # writing of finished ones all overlap the device compute in
        # flight.
        for chunk, results in zip(chunks,
                                  serve_stream(engine, packed_batches(),
                                               depth=3, finish=finish)):
            write_results(chunk, results[:len(chunk)])
    else:
        for chunk in chunks:
            with trace_annotation("serve/ingest"):
                x = np.stack([load(p) for p in chunk])
            x = x.astype(np.float32) / 255.0
            with trace_annotation("serve/forward+postproc"):
                results = inference(model, variables, x, flip=args.flip,
                                    rotate=args.rotate,
                                    visualize=args.visualize,
                                    force_cuboid=args.force_cuboid,
                                    force_raw=args.force_raw,
                                    min_v=args.min_v, r=args.r)
            write_results(chunk, results)

    if pbar is not None:
        pbar.close()


if __name__ == "__main__":
    sys.exit(main())
