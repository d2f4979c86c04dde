"""A/B the space-to-depth stem on the serving device pipeline.

Builds the flagship serving engine (resnet50_rnn bf16, dct ingest,
fused cuboid postproc) twice — standard stem vs S2DStemConv — on the
SAME weights in one process, and clocks the device-resident figure for
each (forced completion via one-scalar fetch; block_until_ready lies on
the axon backend for queued executions).

Usage: python tools/s2d_ab.py [batch] [reps]
"""

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
    from horizonnet_tpu.inference import InferenceEngine
    from horizonnet_tpu.ops.dct import pack_dct
    import bench

    H, W = 512, 1024
    variables = None
    batch = pack_dct(bench._demo_batches(B, H, W, 1)[0])

    def force(outs):
        return float(jnp.ravel(jax.tree.leaves(outs)[0])[0])

    results = {}
    for name, s2d in (("std", False), ("s2d", True)):
        model = build_model("resnet50", use_rnn=True, dtype=jnp.bfloat16,
                            lstm_impl="pallas", s2d_stem=s2d)
        if variables is None:
            variables = init_model(model, jax.random.PRNGKey(0),
                                   (1, H, W, 3))
        t0 = time.time()
        eng = InferenceEngine(model, variables, batch_size=B, H=H, W=W,
                              input_format="dct", postproc="cuboid")
        print(f"{name}: engine compile {time.time() - t0:.0f}s",
              flush=True)
        x_dev = eng.put(batch)
        out0 = eng.run(x_dev)
        force(out0)
        t0 = time.time()
        outs = [eng.run(x_dev) for _ in range(n)]
        c0 = force(outs[-1])
        dt = time.time() - t0
        results[name] = (n * B / dt, c0)
        print(f"{name}: {n * B / dt:8.1f} panos/s device "
              f"({dt / n * 1e3:.1f} ms/batch)", flush=True)
        del eng
    # same weights, exact-equivalent math: first corner coordinate of the
    # last batch must agree
    a, b = results["std"][1], results["s2d"][1]
    print(f"corner check: std {a:.5f} s2d {b:.5f} (|d|={abs(a-b):.5f})")
    print(f"speedup s2d/std: {results['s2d'][0] / results['std'][0]:.3f}x")
    return 0


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 32, int(a[1]) if len(a) > 1 else 48)
