"""Per-op device-time breakdown of the serving program.

Same xplane parsing as tools/trace_ops.py, pointed at the
InferenceEngine executable (dct ingest + forward + fused cuboid
postproc) to show where the device-pipeline ms/batch go — forward vs
wire-format decode vs the fused Manhattan fit.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
      python tools/trace_serving.py [batch] [fmt] [postproc] [top_n]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_ops import report  # noqa: E402  (same directory)


def capture(B=32, fmt="dct", postproc="cuboid", S=8):
    import jax
    import jax.numpy as jnp

    from horizonnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.registry import init_model
    from horizonnet_tpu.inference import InferenceEngine

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    H, W = 512, 1024
    model = build_model("resnet50", use_rnn=True, dtype=jnp.bfloat16,
                        lstm_impl="pallas")
    variables = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    t0 = time.time()
    engine = InferenceEngine(model, variables, batch_size=B, H=H, W=W,
                             input_format=fmt, postproc=postproc)
    print(f"engine compile: {time.time() - t0:.0f}s", flush=True)

    from horizonnet_tpu.ops.dct import (DEFAULT_CHROMA_M, DEFAULT_LUMA_M,
                                        DEFAULT_QUALITY)
    batch = bench._pack(bench._demo_batches(B, H, W, 1), fmt,
                        DEFAULT_LUMA_M, DEFAULT_CHROMA_M, DEFAULT_QUALITY)[0]
    x_dev = engine.put(batch)

    def force(outs):
        return float(jnp.ravel(jax.tree.leaves(outs)[0])[0])

    force(engine.run(x_dev))  # warmup
    tdir = tempfile.mkdtemp(prefix="trace_serving_")
    with jax.profiler.trace(tdir):
        outs = [engine.run(x_dev) for _ in range(S)]
        force(outs[-1])
    return tdir, S


if __name__ == "__main__":
    a = sys.argv[1:]
    B = int(a[0]) if a else 32
    fmt = a[1] if len(a) > 1 else "dct"
    pp = a[2] if len(a) > 2 else "cuboid"
    top = int(a[3]) if len(a) > 3 else 35
    tdir, S = capture(B, fmt, pp)
    report(tdir, S, top)
