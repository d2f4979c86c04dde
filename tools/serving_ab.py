"""A/B every serving knob combination on the device pipeline.

Clocks the compute-bound device figure (same program on a device-resident
batch, completion forced via one-scalar fetch — block_until_ready lies on
the axon backend for queued executions) for each legal knob combination
of the flagship serving engine (resnet50_rnn, dct ingest, fused cuboid
postproc):

  std   — bf16, plain 7x7 stem            (the r03 benched default)
  s2d   — bf16, space-to-depth stem       (--s2d_stem)
  int8  — int8 BN-folded encoder          (models/quant.py)

quant_int8 + s2d_stem is rejected by build_model (the quant stem is the
plain path), so the matrix is 3 configs. All three run the SAME float
weights (int8 quantizes them); corners of the last batch are compared so
a speed win that moves outputs is caught in the same run.

VERDICT r03 weak #2 asked for exactly this: measured panos/s per knob,
recorded, and the winner made the bench default.

Usage: python tools/serving_ab.py [batch] [reps]   (writes AB_SERVING.json)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(B=32, n=48):
    import jax
    import jax.numpy as jnp

    from horizonnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.registry import init_model
    from horizonnet_tpu.models.quant import quantize_variables
    from horizonnet_tpu.inference import InferenceEngine
    from horizonnet_tpu.postproc import unpack_cuboid_outputs
    from horizonnet_tpu.ops.dct import pack_dct
    import bench

    H, W = 512, 1024
    batch = pack_dct(bench._demo_batches(B, H, W, 1)[0])

    fmodel = build_model("resnet50", use_rnn=True, dtype=jnp.bfloat16,
                         lstm_impl="pallas")
    fvars = init_model(fmodel, jax.random.PRNGKey(0), (1, H, W, 3))

    def force(outs):
        return float(jnp.ravel(jax.tree.leaves(outs)[0])[0])

    configs = {
        "std": dict(s2d_stem=False, quant_int8=False),
        "s2d": dict(s2d_stem=True, quant_int8=False),
        "int8": dict(s2d_stem=False, quant_int8=True),
    }
    results = {}
    for name, kw in configs.items():
        model = build_model("resnet50", use_rnn=True, dtype=jnp.bfloat16,
                            lstm_impl="pallas", **kw)
        variables = (quantize_variables(fvars) if kw["quant_int8"]
                     else fvars)
        t0 = time.time()
        eng = InferenceEngine(model, variables, batch_size=B, H=H, W=W,
                              input_format="dct", postproc="cuboid")
        print(f"{name:5s}: engine compile {time.time() - t0:.0f}s",
              flush=True)
        x_dev = eng.put(batch)
        out0 = eng.run(x_dev)
        corners = unpack_cuboid_outputs(out0)[0]
        force(out0)
        reps = []
        for _ in range(3):
            t0 = time.time()
            outs = [eng.run(x_dev) for _ in range(n)]
            force(outs[-1])
            reps.append(n * B / (time.time() - t0))
        pps = float(np.median(reps))
        results[name] = {"device_panos_per_sec": round(pps, 1),
                         "reps": [round(r, 1) for r in reps],
                         "corners": corners}
        print(f"{name:5s}: {pps:8.1f} panos/s device "
              f"(reps {['%.1f' % r for r in reps]})", flush=True)
        del eng

    base = results["std"]["corners"]
    out = {"batch": B, "n_per_rep": n, "fmt": "dct",
           "postproc": "cuboid", "lstm": "pallas"}
    for name, r in results.items():
        # corners are normalized uv; u spans W=1024 px, v spans H=512
        # (dt_cor_id = uv * [w, h], tools/parity_eval.py)
        dpx = float((np.abs(r["corners"] - base)
                     * np.array([1024.0, 512.0])).max())
        out[name] = {"device_panos_per_sec": r["device_panos_per_sec"],
                     "reps": r["reps"],
                     "vs_std": round(r["device_panos_per_sec"]
                                     / results["std"]["device_panos_per_sec"],
                                     3),
                     "max_corner_delta_px_vs_std": round(dpx, 2)}
        print(f"{name:5s}: {out[name]['vs_std']:.3f}x vs std, "
              f"corner delta {dpx:.2f}px")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "AB_SERVING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    a = sys.argv[1:]
    sys.exit(main(int(a[0]) if a else 32,
                  int(a[1]) if len(a) > 1 else 48))
