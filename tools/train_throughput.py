"""Measure sustained training throughput at the reference recipe.

Reference recipe (README_ST3D.md:24): resnet50_rnn, batch 24, 512x1024,
Adam 3e-4. Reports, over N measured steps after warmup:

- device step time / panos/s with device-resident batches (the
  compute-bound figure a real TPU host with local data sees),
- host-fed step time (batch uploaded every step) so the input-bound
  fraction on THIS host's link is explicit,
- MFU from the compiled step's XLA cost analysis vs the chip's peak.

Usage: python tools/train_throughput.py [steps] [batch] [backbone]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16_TFLOPS = 394.0 / 2  # one v5e chip: 394 TOPs int8, bf16 half


def main(steps=30, bs=24, backbone="resnet50"):
    import jax
    import jax.numpy as jnp

    from horizonnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from horizonnet_tpu.data.synth import synth_batch
    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.registry import init_model
    from horizonnet_tpu.train import create_train_state, warmup_poly_schedule
    from horizonnet_tpu.train.engine import TrainEngine
    from horizonnet_tpu.train.step import make_optimizer

    H, W = 512, 1024
    rng = np.random.default_rng(0)
    print(f"generating {bs}-pano synthetic batch...", flush=True)
    imgs, y_bon, y_cor, _ = synth_batch(rng, bs)

    model = build_model(backbone, use_rnn=True)
    variables = init_model(model, jax.random.PRNGKey(0))
    tx = make_optimizer("Adam", warmup_poly_schedule(3e-4, max_iters=10000))
    state = create_train_state(model, variables, tx)
    t0 = time.time()
    engine = TrainEngine(model, state, batch_size=bs, H=H, W=W)
    print(f"train step compile: {time.time() - t0:.0f}s", flush=True)

    flops = None
    try:
        ca = engine.compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    x_host = imgs.astype(np.float32) / 255.0
    x_dev = jax.device_put(jnp.asarray(x_host))
    jrng = jax.random.PRNGKey(0)

    # Warmup (first dispatch + donation layout settle)
    jrng, s = jax.random.split(jrng)
    jax.block_until_ready(engine.step(x_dev, y_bon, y_cor, s))

    # (a) device-resident batches
    t0 = time.time()
    for _ in range(steps):
        jrng, s = jax.random.split(jrng)
        m = engine.step(x_dev, y_bon, y_cor, s)
    jax.block_until_ready(m)
    dt_dev = (time.time() - t0) / steps

    # (b) host-fed batches (full upload every step)
    n_host = max(4, steps // 4)
    t0 = time.time()
    for _ in range(n_host):
        jrng, s = jax.random.split(jrng)
        m = engine.step(x_host, y_bon, y_cor, s)
    jax.block_until_ready(m)
    dt_host = (time.time() - t0) / n_host

    mb = x_host.nbytes / 1e6
    print(f"\nbackbone={backbone} bs={bs} {H}x{W} ({steps} steps)")
    print(f"device-resident: {dt_dev * 1e3:8.1f} ms/step  "
          f"{bs / dt_dev:7.1f} panos/s")
    if flops:
        mfu = flops / dt_dev / (V5E_PEAK_BF16_TFLOPS * 1e12)
        print(f"  step flops {flops / 1e12:.2f} TF -> "
              f"{flops / dt_dev / 1e12:.1f} TF/s "
              f"({100 * mfu:.0f}% of v5e bf16 peak)")
    print(f"host-fed:        {dt_host * 1e3:8.1f} ms/step  "
          f"{bs / dt_host:7.1f} panos/s  "
          f"({mb:.0f} MB/step upload; input-bound "
          f"{100 * (1 - dt_dev / dt_host):.0f}% on this link)")
    return 0


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 30, int(a[1]) if len(a) > 1 else 24,
         a[2] if len(a) > 2 else "resnet50")
