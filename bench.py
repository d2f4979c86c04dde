"""End-to-end throughput benchmark: panos/sec through the full serving path.

Measures the reference pipeline's unit of work (inference.py:192-223):
pano image -> HorizonNet forward (flagship resnet50_rnn, bf16, 512x1024)
-> Manhattan post-processing -> corner JSON dict. Device forward and host
post-processing are pipelined (dispatch batch k+1 before postprocessing
batch k), as a production server would.

Baseline note: the reference publishes NO throughput numbers (SURVEY.md §6).
vs_baseline is computed against a 20 panos/sec estimate for the reference's
serving loop (PyTorch resnet50+LSTM forward at 512x1024 single-image with
host postproc on a contemporary datacenter GPU — the reference processes
one pano per step with host round-trips). BASELINE.json's north star is
>= 5x that: 100 panos/sec.
"""

import json
import os
import sys
import time

import numpy as np

# Ensure the package resolves in this process AND in spawned postproc
# workers regardless of the caller's cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_PANOS_PER_SEC_ESTIMATE = 20.0


def _warm_worker():
    """Import the package in the spawned worker (off the timed path)."""
    import horizonnet_tpu.inference  # noqa: F401
    return True


def _postprocess_batch(bon, cor, H, W):
    """Worker-process job: Manhattan-fit one batch of raw outputs."""
    from horizonnet_tpu.inference import postprocess

    return [postprocess(bon[b], cor[b, 0], H, W, force_cuboid=True)
            for b in range(len(bon))]


def main():
    import jax
    import jax.numpy as jnp

    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.registry import init_model
    from horizonnet_tpu.inference import InferenceEngine, postprocess

    B = 32
    H, W = 512, 1024
    model = build_model("resnet50", use_rnn=True, dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    # uint8 input: real panos are uint8 on disk; normalize on device and
    # cross the host->device link 4x cheaper
    engine = InferenceEngine(model, variables, batch_size=B, H=H, W=W,
                             input_uint8=True)

    rng = np.random.default_rng(0)
    n_batches = 12
    batches = [rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
               for _ in range(3)]

    # Warmup (compile already done in engine init; run a full cycle)
    bon, cor = engine(batches[0])
    for b in range(B):
        postprocess(np.asarray(bon[b]), np.asarray(cor[b, 0]), H, W,
                    force_cuboid=True)

    # Pipelined serving loop: upload + dispatch batch k+1 before
    # postprocessing batch k. Postprocessing fans out to worker processes
    # so the host CPU isn't on the device-feed critical path. (A
    # background-thread UPLOADER was tried and measured WORSE — 3.9 vs
    # 20.9 panos/s — the remote-device transport serializes transfers
    # against dispatch; process workers only touch the small outputs.)
    import multiprocessing
    from concurrent.futures import ProcessPoolExecutor
    # spawn: forking after the TPU client initialized would duplicate its
    # transport state into the workers
    pool = ProcessPoolExecutor(4, mp_context=multiprocessing.get_context("spawn"))
    futures = []
    # Warm the workers before the timed region (spawned processes import
    # the package on first use)
    dummy = [pool.submit(_warm_worker) for _ in range(4)]
    for d in dummy:
        d.result()

    t0 = time.time()
    pending = engine.run(engine.put(batches[0 % len(batches)]))
    for k in range(1, n_batches + 1):
        nxt = (engine.run(engine.put(batches[k % len(batches)]))
               if k < n_batches else None)
        bon, cor = np.asarray(pending[0]), np.asarray(pending[1])
        futures.append(pool.submit(_postprocess_batch, bon, cor, H, W))
        pending = nxt
    results = [r for f in futures for r in f.result()]
    dt = time.time() - t0
    pool.shutdown()
    assert len(results) == n_batches * B

    panos_per_sec = n_batches * B / dt
    print(json.dumps({
        "metric": "end-to-end panos/sec (bf16 resnet50_rnn fwd + cuboid "
                  "post-proc, batch 32, 512x1024)",
        "value": round(panos_per_sec, 2),
        "unit": "panos/sec",
        "vs_baseline": round(panos_per_sec / REFERENCE_PANOS_PER_SEC_ESTIMATE,
                             2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
