"""Measure sustained training throughput at the reference recipe.

Reference recipe (README_ST3D.md:24): resnet50_rnn, batch 24, 512x1024,
Adam 3e-4. Reports, over N measured steps after warmup:

- device step time / panos/s with device-resident batches (the
  compute-bound figure a real TPU host with local data sees),
- fused-scan step time: ``lax.scan`` of S steps inside ONE compiled
  program, so per-dispatch tunnel latency (hundreds of ms on this
  sandbox's link in bad phases) is excluded — this is the pure device
  compute figure, and also the idiomatic TPU serving-side fix (run
  multiple steps per dispatch when the host link is slow),
- host-fed step time (batch uploaded every step) so the input-bound
  fraction on THIS host's link is explicit,
- MFU from the compiled step's XLA cost analysis vs the chip's peak.

Usage: python tools/train_throughput.py [steps] [batch] [backbone] [dtype]
           [lstm_impl]
(dtype: f32 | bf16 — bf16 matches the reference's AMP recipe and the
train CLI's --bf16 flag; lstm_impl: scan | pallas_train — the train
CLI's --lstm_impl)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16_TFLOPS = 394.0 / 2  # one v5e chip: 394 TOPs int8, bf16 half


def main(steps=30, bs=24, backbone="resnet50", dtype="bf16",
         lstm_impl="scan"):
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

    model = build_model(backbone, use_rnn=True,
                        dtype=jnp.bfloat16 if dtype == "bf16"
                        else jnp.float32,
                        lstm_impl=lstm_impl)
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

    # Forcing: fetch ONE scalar from the last step's metrics. Device
    # executions complete in dispatch order, so this forces the whole
    # chain; jax.block_until_ready has been observed NOT to wait for
    # queued executions on the remote axon backend (returns in ~1 ms for
    # a 20-deep queue of 40 ms programs), silently faking the timings.
    force = lambda m: float(m["total"])  # noqa: E731

    # Warmup (first dispatch + donation layout settle)
    jrng, s = jax.random.split(jrng)
    force(engine.step(x_dev, y_bon, y_cor, s))

    # (a) device-resident batches
    t0 = time.time()
    for _ in range(steps):
        jrng, s = jax.random.split(jrng)
        m = engine.step(x_dev, y_bon, y_cor, s)
    force(m)
    dt_dev = (time.time() - t0) / steps

    # (b) host-fed batches (full upload every step)
    n_host = max(4, steps // 4)
    t0 = time.time()
    for _ in range(n_host):
        jrng, s = jax.random.split(jrng)
        m = engine.step(x_host, y_bon, y_cor, s)
    force(m)
    dt_host = (time.time() - t0) / n_host

    # (b2) uint8-fed: what the real input pipeline uploads — the CLI's
    # augment_batch ships uint8 and normalizes on device (data/augment.py)
    cast = jax.jit(lambda u: u.astype(jnp.float32) / 255.0)
    jax.block_until_ready(cast(jax.device_put(imgs)))  # warmup
    t0 = time.time()
    for _ in range(n_host):
        jrng, s = jax.random.split(jrng)
        m = engine.step(cast(jax.device_put(imgs)), y_bon, y_cor, s)
    force(m)
    dt_u8 = (time.time() - t0) / n_host

    # (b3) dct-fed: the compressed zig-zag wire (ops/dct.py) packed on
    # host, decoded on device — the --wire dct train CLI path (decode
    # fuses with the augment warp there; here with the normalize).
    from horizonnet_tpu.ops.dct import pack_dct, unpack_dct_to_rgb
    packed = pack_dct(imgs)
    decode = jax.jit(lambda p: unpack_dct_to_rgb(p, H, W))
    jax.block_until_ready(decode(jax.device_put(packed)))  # warmup
    t0 = time.time()
    for _ in range(n_host):
        jrng, s = jax.random.split(jrng)
        m = engine.step(decode(jax.device_put(packed)), y_bon, y_cor, s)
    force(m)
    dt_dct = (time.time() - t0) / n_host

    # (b4) dct4-fed: the block-floating-point nibble wire — the
    # --wire dct4 train CLI path (~17x fewer bytes than uint8).
    from horizonnet_tpu.ops.dct import pack_dct4, unpack_dct4_to_rgb
    packed4 = pack_dct4(imgs)
    decode4 = jax.jit(lambda p: unpack_dct4_to_rgb(p, H, W))
    jax.block_until_ready(decode4(jax.device_put(packed4)))  # warmup
    t0 = time.time()
    for _ in range(n_host):
        jrng, s = jax.random.split(jrng)
        m = engine.step(decode4(jax.device_put(packed4)), y_bon, y_cor, s)
    force(m)
    dt_dct4 = (time.time() - t0) / n_host

    # (c) fused scan: S steps per dispatch, ONE compiled program.
    # Excludes per-dispatch link latency entirely; rng folded per step.
    # Runs LAST with the engine's device state freed first — two resident
    # copies of params+opt+BN plus the scan's activation working set
    # exceed HBM at bs 24.
    from functools import partial

    from horizonnet_tpu.train.step import train_step

    S = 8
    host_state = engine.host_state()
    del engine, x_dev, m
    st_spec = jax.eval_shape(lambda: host_state)

    @partial(jax.jit, donate_argnums=(0,))
    def multi(state, x, y_bon, y_cor, rng):
        def body(carry, _):
            st, r = carry
            r, s = jax.random.split(r)
            st, m = train_step(model, st, x, y_bon, y_cor, s)
            return (st, r), m["total"]

        (state, rng), totals = jax.lax.scan(body, (state, rng), None,
                                            length=S)
        return state, totals

    t0 = time.time()
    mc = multi.lower(
        st_spec,
        jax.ShapeDtypeStruct(x_host.shape, jnp.float32),
        jax.ShapeDtypeStruct(y_bon.shape, jnp.float32),
        jax.ShapeDtypeStruct(y_cor.shape, jnp.float32),
        jax.eval_shape(lambda: jrng)).compile()
    print(f"fused {S}-step scan compile: {time.time() - t0:.0f}s",
          flush=True)
    fmts, _ = mc.input_formats
    mstate = jax.device_put(host_state, fmts[0])
    margs = [jax.device_put(np.asarray(a, np.float32), f)
             for a, f in zip((x_host, y_bon, y_cor), fmts[1:4])]
    s = jax.device_put(jax.random.PRNGKey(1), fmts[4])
    mstate, tot = mc(mstate, *margs, s)   # warmup dispatch
    float(jnp.ravel(tot)[0])              # force (see note above)
    n_scan = max(2, steps // S)
    t0 = time.time()
    for _ in range(n_scan):
        mstate, tot = mc(mstate, *margs, s)
    float(jnp.ravel(tot)[0])
    dt_fused = (time.time() - t0) / (n_scan * S)

    mb = x_host.nbytes / 1e6
    print(f"\nbackbone={backbone} bs={bs} {H}x{W} {dtype} "
          f"lstm={lstm_impl} ({steps} steps)")
    print(f"device-resident: {dt_dev * 1e3:8.1f} ms/step  "
          f"{bs / dt_dev:7.1f} panos/s")
    print(f"fused {S}-scan:    {dt_fused * 1e3:8.1f} ms/step  "
          f"{bs / dt_fused:7.1f} panos/s  (pure device compute, "
          f"no per-step dispatch)")
    if flops:
        mfu = flops / dt_fused / (V5E_PEAK_BF16_TFLOPS * 1e12)
        print(f"  step flops {flops / 1e12:.2f} TF -> "
              f"{flops / dt_fused / 1e12:.1f} TF/s "
              f"({100 * mfu:.0f}% of v5e bf16 peak)")
    print(f"host-fed f32:    {dt_host * 1e3:8.1f} ms/step  "
          f"{bs / dt_host:7.1f} panos/s  "
          f"({mb:.0f} MB/step upload; input-bound "
          f"{100 * (1 - dt_dev / dt_host):.0f}% on this link)")
    print(f"host-fed uint8:  {dt_u8 * 1e3:8.1f} ms/step  "
          f"{bs / dt_u8:7.1f} panos/s  "
          f"({imgs.nbytes / 1e6:.0f} MB/step upload + device "
          f"normalize — the CLI augment path's wire format)")
    print(f"host-fed dct:    {dt_dct * 1e3:8.1f} ms/step  "
          f"{bs / dt_dct:7.1f} panos/s  "
          f"({packed.nbytes / 1e6:.1f} MB/step upload + device "
          f"decode — the CLI's --wire dct path)")
    print(f"host-fed dct4:   {dt_dct4 * 1e3:8.1f} ms/step  "
          f"{bs / dt_dct4:7.1f} panos/s  "
          f"({packed4.nbytes / 1e6:.1f} MB/step upload + device "
          f"decode — the CLI's --wire dct4 path)")
    return 0


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 30, int(a[1]) if len(a) > 1 else 24,
         a[2] if len(a) > 2 else "resnet50",
         a[3] if len(a) > 3 else "bf16",
         a[4] if len(a) > 4 else "scan")
