"""A/B the fused Pallas bottleneck blocks on the device pipeline.

std   — bf16 encoder, XLA convs (the r05 benched default)
fused — bf16 encoder with every identity bottleneck as ONE Pallas kernel
        (ops/pallas_block.py): intermediates VMEM-resident, HBM sees one
        read + one write per block. Motivated by the round-5 roofline:
        75.8% of device self-time is DMA and the early-stage bottleneck
        convs are the largest op groups.

Same weights, same wire (dct4), same fused cuboid postproc; corners of
the first batch are compared so a speed win that moves outputs is caught
in the same run (bf16 rounding differs at the BN fold points — the delta
is reported in output px).

Usage: python tools/fused_ab.py [batch] [reps]  (updates AB_SERVING.json
with a "fused_ab_r5" entry)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(B=64, n=48):
    import jax
    import jax.numpy as jnp

    from horizonnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.registry import init_model
    from horizonnet_tpu.inference import InferenceEngine
    from horizonnet_tpu.postproc import unpack_cuboid_outputs
    from horizonnet_tpu.ops.dct import pack_dct4
    import bench

    H, W = 512, 1024
    batch = pack_dct4(bench._demo_batches(B, H, W, 1)[0])

    fmodel = build_model("resnet50", use_rnn=True, dtype=jnp.bfloat16,
                         lstm_impl="pallas")
    fvars = init_model(fmodel, jax.random.PRNGKey(0), (1, H, W, 3))

    def force(outs):
        return float(jnp.ravel(jax.tree.leaves(outs)[0])[0])

    results = {}
    for name, fb in (("std", ""), ("fused", "pallas")):
        model = build_model("resnet50", use_rnn=True, dtype=jnp.bfloat16,
                            lstm_impl="pallas", fused_blocks=fb)
        t0 = time.time()
        eng = InferenceEngine(model, fvars, batch_size=B, H=H, W=W,
                              input_format="dct4", postproc="cuboid")
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
    entry = {"batch": B, "n_per_rep": n, "fmt": "dct4",
             "postproc": "cuboid", "lstm": "pallas"}
    for name, r in results.items():
        dpx = float((np.abs(r["corners"] - base)
                     * np.array([1024.0, 512.0])).max())
        entry[name] = {"device_panos_per_sec": r["device_panos_per_sec"],
                       "reps": r["reps"],
                       "vs_std": round(r["device_panos_per_sec"]
                                       / results["std"]
                                       ["device_panos_per_sec"], 3),
                       "max_corner_delta_px_vs_std": round(dpx, 2)}
        print(f"{name:5s}: {entry[name]['vs_std']:.3f}x vs std, "
              f"corner delta {dpx:.2f}px")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "AB_SERVING.json")
    with open(path) as f:
        out = json.load(f)
    out["fused_ab_r5"] = entry
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path} (fused_ab_r5)")
    return 0


if __name__ == "__main__":
    a = sys.argv[1:]
    sys.exit(main(int(a[0]) if a else 64,
                  int(a[1]) if len(a) > 1 else 48))
