"""End-to-end serving throughput: panos/sec through the aligned-pano path.

Measures the reference serving unit of work (inference.py:192-223): pano
ingest -> HorizonNet forward (flagship resnet50_rnn, bf16, 512x1024) ->
full Manhattan post-processing -> corner coordinates on host. The entire
data-parallel postprocess (peak find, consensus vote, wall fit, corner
back-projection) runs ON DEVICE fused into the forward program
(postproc/device.py), so the host receives only tiny per-pano results;
uploads of batch k+1 overlap the device compute of batch k.

Ingest wire format (BENCH_FMT): "dct" ships quantized zig-zag DCT
coefficients (ops/dct.py; 144 KiB/pano at luma_m=15/chroma_m=6 — what a
JPEG entropy decode naturally yields, 5.3x less than yuv420) and the
device performs dequant + IDCT + color conversion inside the compiled
program. The corner outputs match the RGB path to sub-pixel on the
committed demo pano (tests/test_dct.py + the drive check in
.claude/skills/verify). "yuv420" and "uint8" remain available.

Reported figures (one JSON line):
- value: serving panos/sec, MEDIAN of BENCH_REPS-1 timed loops after
  ONE discarded tunnel-warmup loop (the sandbox host<->device tunnel
  is bimodal — see README; the first loop routinely lands in a colder
  phase). The warmup loop, every counted rep, and the max/min spread
  are disclosed via "warmup_rep_panos_per_sec", "reps_panos_per_sec"
  and "reps_spread_pct"; the best rep via "best_panos_per_sec";
  "ingest_mb_per_s" (measured before/after the timed reps) annotates
  which tunnel phase the run landed in.
- device_panos_per_sec: the compute-bound figure — same compiled
  program clocked on a device-resident batch (no ingest).
- e2e_panos_per_sec: the BASELINE.json "preprocess+infer+post-proc"
  metric — raw pano -> VP alignment (preprocess/) -> aligned ingest ->
  forward -> corners, with host preprocess fanned across a thread pool
  (BENCH_E2E_WORKERS) and overlapped with device serving via
  serve_stream; "preprocess_s_per_pano" is the warm single-stream
  preprocess time. Divisor: the measured reference pipeline on this
  host (REF_E2E.json, tools/ref_e2e.py) -> "e2e_vs_baseline".

Baseline (vs_baseline divisor): the reference publishes NO throughput
numbers (SURVEY.md §6). 20 panos/sec is a derived estimate of its
serving loop on a contemporary datacenter GPU host, anchored in
measurements on this machine (tests/torch_replica.py forward: 6.14
s/pano on one CPU core; host cuboid postproc 32 ms; PNG decode+resize
108 ms): the loop is strictly serial per pano (ref inference.py:192-223)
with ~45 GFLOPs/pano forward (resnet50 at 512x1024 plus head) -> 12-19
ms at the 15-25% batch-1 utilization typical of a V100/A100-class part,
plus ~30 ms decode and ~11 ms postproc on a faster server core =
~55 ms/pano ~= 18 panos/s, rounded UP to 20 (conservative against us).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_PANOS_PER_SEC_ESTIMATE = 20.0
DEMO_PANO = "/root/reference/assets/preprocessed/demo_aligned_rgb.png"
DEMO_RAW = "/root/reference/assets/demo.png"


def _demo_batches(B, H, W, n_distinct=3):
    """Real-content batches: the committed demo pano, rolled per sample.

    Random noise would exercise the postproc's degenerate fallback
    instead of the real wall-fit workload; horizontal rolls keep every
    sample a valid pano (the wrap axis is periodic) while varying the
    bytes.
    """
    from PIL import Image

    img = np.asarray(Image.open(DEMO_PANO))[..., :3]
    if img.shape[:2] != (H, W):
        img = np.asarray(Image.fromarray(img).resize((W, H),
                                                     Image.BICUBIC))
    rng = np.random.default_rng(0)
    out = []
    for _ in range(n_distinct):
        rolls = rng.integers(0, W, B)
        out.append(np.stack([np.roll(img, r, axis=1) for r in rolls]))
    return out


def _pack(batches, fmt, dct_ym, dct_cm, dct_q):
    """Client-side wire packing (outside the serve loop, like a JPEG
    decoder feeding the server)."""
    if fmt == "yuv420":
        from horizonnet_tpu.ops.yuv import pack_yuv420
        return [pack_yuv420(b) for b in batches]
    if fmt == "dct":
        from horizonnet_tpu.ops.dct import pack_dct
        return [pack_dct(b, luma_m=dct_ym, chroma_m=dct_cm, quality=dct_q)
                for b in batches]
    if fmt == "dct4":
        from horizonnet_tpu.ops.dct import pack_dct4
        return [pack_dct4(b, luma_m=dct_ym, chroma_m=dct_cm, quality=dct_q)
                for b in batches]
    if fmt == "uint8":
        return batches
    return [b.astype(np.float32) / 255.0 for b in batches]


def _wait_for_backend():
    """Ride out device-tunnel outages before touching jax in-process.

    The remote TPU link has hour-scale outage windows where backend init
    hangs forever and a mid-compile process wedges unrecoverably (see
    .claude/skills/verify/SKILL.md). Probing in a THROWAWAY subprocess
    keeps this process clean; retrying within a budget lets an
    unattended bench run land after the outage instead of hanging.
    BENCH_PROBE_BUDGET_S=0 disables the guard.
    """
    import subprocess
    budget = float(os.environ.get("BENCH_PROBE_BUDGET_S", 3600))
    if budget <= 0:
        return
    probe = ("import jax, jax.numpy as jnp\n"
             "print(jax.jit(lambda x: (x @ x.T).sum())"
             "(jnp.ones((256, 256))))\n")
    deadline = time.time() + budget
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run([sys.executable, "-c", probe], timeout=150,
                           check=True, capture_output=True)
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            if time.time() >= deadline:
                print(f"bench: device probe still failing after "
                      f"{attempt} attempts / {budget:.0f}s; proceeding",
                      file=sys.stderr)
                return
            print(f"bench: device probe attempt {attempt} failed "
                  f"(outage or slow phase); retrying in 120s",
                  file=sys.stderr)
            time.sleep(120)


def main():
    _wait_for_backend()
    import jax
    import jax.numpy as jnp

    from horizonnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()  # warmup compile from disk after first run

    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.registry import init_model
    from horizonnet_tpu.inference import InferenceEngine

    # Defaults from the round-4 ingest A/B (AB_SERVING.json "wire_ab"):
    # the tunnel charges a large fixed latency per device_put, so batch
    # 64 amortizes it (32 -> 64 took dct4 166.4 -> 393.3 panos/s, tight
    # reps). At 64 the 5.5 MB puts run ~34 MB/s — the link's measured
    # bandwidth ceiling — so the stream is bytes-bound there and dct4's
    # 88 KiB/pano is the right wire (dct@32 measured 173.3 the same
    # session; dct@64's fresh compile outlived its budget window).
    B = int(os.environ.get("BENCH_B", 64))
    depth = int(os.environ.get("BENCH_DEPTH", 3))
    fmt = os.environ.get("BENCH_FMT", "dct4")
    from horizonnet_tpu.ops.dct import (DEFAULT_CHROMA_M, DEFAULT_LUMA_M,
                                        DEFAULT_QUALITY)
    dct_ym = int(os.environ.get("BENCH_DCT_LUMA_M", DEFAULT_LUMA_M))
    dct_cm = int(os.environ.get("BENCH_DCT_CHROMA_M", DEFAULT_CHROMA_M))
    dct_q = int(os.environ.get("BENCH_DCT_Q", DEFAULT_QUALITY))
    lstm_impl = os.environ.get("BENCH_LSTM", "pallas")
    postproc = os.environ.get("BENCH_POSTPROC", "cuboid")
    s2d = os.environ.get("BENCH_S2D", "0") != "0"
    quant = os.environ.get("BENCH_QUANT", "0") != "0"
    fused = ("pallas" if os.environ.get("BENCH_FUSED", "0") != "0"
             else "")  # fused Pallas bottleneck blocks (ops/pallas_block)
    H, W = 512, 1024
    model = build_model("resnet50", use_rnn=True, dtype=jnp.bfloat16,
                        lstm_impl=lstm_impl, s2d_stem=s2d,
                        quant_int8=quant, fused_blocks=fused)
    fmodel = (build_model("resnet50", use_rnn=True, dtype=jnp.bfloat16,
                          lstm_impl=lstm_impl) if quant else model)
    variables = init_model(fmodel, jax.random.PRNGKey(0), (1, H, W, 3))
    if quant:
        from horizonnet_tpu.models.quant import quantize_variables
        variables = quantize_variables(variables)
    engine = InferenceEngine(model, variables, batch_size=B, H=H, W=W,
                             input_format=fmt, postproc=postproc,
                             dct_luma_m=dct_ym, dct_chroma_m=dct_cm,
                             dct_quality=dct_q)

    if postproc == "general":
        from horizonnet_tpu.postproc import finish_general_batch

        def finish(outs):
            batch = []
            for cor_id, z0, z1 in finish_general_batch(outs, W, H):
                assert np.isfinite(z1) and len(cor_id) >= 8
                batch.append({"z0": z0, "z1": z1, "uv": cor_id})
            return batch
    else:
        from horizonnet_tpu.postproc import unpack_cuboid_outputs

        def finish(outs):
            cid, z1 = unpack_cuboid_outputs(outs)
            assert np.all(np.isfinite(z1)) and cid.shape[1:] == (8, 2)
            return [{"z0": 50.0, "z1": float(z1[b]), "uv": cid[b]}
                    for b in range(len(cid))]

    n_batches = max(1, 384 // B)
    batches = _pack(_demo_batches(B, H, W), fmt, dct_ym, dct_cm, dct_q)
    wire_bytes = batches[0].nbytes // B

    # Warmup: one full upload+forward+postproc+download cycle
    res0 = finish(engine(batches[0]))
    assert len(res0) == B

    # Pipelined serving loop, ``depth`` batches in flight: upload +
    # dispatch batch k+depth before pulling batch k's (tiny) results.
    # jax dispatch is async, so device compute overlaps the next uploads;
    # the host finish tail runs on a worker thread so its fetch + numpy
    # work overlap the main thread's (link-bound) uploads too.
    # This is the product serving loop (inference.serve_stream) — the
    # same code path the inference CLI drives.
    from horizonnet_tpu.inference import serve_stream

    def serve_loop():
        t0 = time.time()
        results = []
        feed = (batches[k % len(batches)] for k in range(n_batches))
        for batch_res in serve_stream(engine, feed, depth=depth,
                                      finish=finish):
            results.extend(batch_res)
        dt = time.time() - t0
        assert len(results) == n_batches * B
        return n_batches * B / dt

    # The loop is repeated and the MEDIAN rep reported as the headline
    # (cross-round comparisons read this; a best-of-N headline would
    # credit tunnel luck). The FIRST rep is a tunnel warm-up and is
    # excluded from the median (round-4 records show it landing in a
    # different tunnel phase than the rest — 174 vs 302/380 in
    # BENCH_r04); it is still disclosed, along with every counted rep
    # and the max/min spread — the sandbox's host<->device tunnel is
    # bimodal (see README), so the spread is part of the story.
    n_reps = max(1, int(os.environ.get("BENCH_REPS", 5)))

    def ingest_rate():
        """Measured host->device rate of one real batch upload (MB/s).

        This annotates the tunnel phase the reps ran in: the sandbox's
        link is bimodal (README), and a spread in reps_panos_per_sec is
        explained by the phase, not the program. block_until_ready is
        safe here — it lies only for QUEUED executions, not a single
        transfer (.claude/skills/verify/SKILL.md)."""
        t0 = time.time()
        jax.block_until_ready(engine.put(batches[0]))
        return batches[0].nbytes / (time.time() - t0) / 1e6

    ingest_rate()  # warm the path once
    warmup_rep = serve_loop() if n_reps > 1 else None
    rate0 = ingest_rate()
    reps = [serve_loop() for _ in range(max(1, n_reps - 1))]
    rate1 = ingest_rate()
    panos_per_sec = float(np.median(reps))
    spread_pct = round(100 * (max(reps) - min(reps)) / panos_per_sec, 1)

    # Compute-bound figure: the same program clocked on a device-resident
    # batch — no host->device ingest in the timed window. Completion is
    # forced by fetching ONE scalar of the last queued result (device
    # executions finish in dispatch order); jax.block_until_ready does
    # NOT reliably wait for queued executions on the remote axon backend
    # and would report a fantasy number here.
    import jax.numpy as _jnp

    def _force(outs):
        return float(_jnp.ravel(jax.tree.leaves(outs)[0])[0])

    x_dev = engine.put(batches[0])
    _force(engine.run(x_dev))
    n_dev = 48
    t0 = time.time()
    outs = [engine.run(x_dev) for _ in range(n_dev)]
    _force(outs[-1])
    device_pps = n_dev * B / (time.time() - t0)

    # Serving MFU: XLA's own flop count of the compiled program (wire
    # decode + forward + fused postproc) against the chip's bf16 peak.
    # v5e: 394 TOPS int8 -> 197 TFLOPs bf16 (public spec).
    serving_mfu = flops_per_pano = None
    try:
        ca = engine.compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            flops_per_pano = flops / B
            serving_mfu = round(
                100.0 * flops * (device_pps / B) / 197e12, 1)
    except Exception:
        pass

    # The BASELINE.json end-to-end metric: raw pano -> VP align -> infer,
    # pipelined the way a production ingester would run it: a host
    # thread pool VP-aligns panos (pure host work since round 4 —
    # preprocess/host_resample) while serve_stream keeps the device fed,
    # so preprocess overlaps device compute instead of serializing with
    # it. The line-map raster is skipped (want_pano_edge=False):
    # HorizonNet consumes only the aligned RGB (ref inference.py:196-200
    # reads *_aligned_rgb.png; *_aligned_line.png feeds LayoutNet, not
    # this model).
    e2e_pps = preprocess_s = e2e_vs_baseline = ref_e2e = None
    e2e_vs_baseline_gpu_adj = ref_e2e_gpu = None
    e2e_workers = None
    if os.environ.get("BENCH_E2E", "1") != "0" and os.path.isfile(DEMO_RAW):
        from concurrent.futures import ThreadPoolExecutor
        from PIL import Image
        from horizonnet_tpu.preprocess import (pano_edge_detection,
                                               rotate_panorama_uint8)
        raw = np.array(Image.open(DEMO_RAW).resize((W, H),
                                                   Image.BICUBIC))[..., :3]
        rng = np.random.default_rng(1)
        e2e_workers = int(os.environ.get(
            "BENCH_E2E_WORKERS", min(8, os.cpu_count() or 1)))
        B_e2e = int(os.environ.get("BENCH_E2E_B", 8))
        n_e2e = int(os.environ.get(
            "BENCH_E2E_N", max(2 * B_e2e, 2 * B_e2e * e2e_workers)))
        # Round down to a whole number of batches, but never below one
        # batch (BENCH_E2E_N < BENCH_E2E_B would otherwise yield 0).
        n_e2e = max(B_e2e, (n_e2e // B_e2e) * B_e2e)
        raws = [np.roll(raw, int(r), axis=1)
                for r in rng.integers(0, W, n_e2e)]

        def preprocess_one(pano):
            r = pano_edge_detection(pano, want_pano_edge=False,
                                    lsd_workers=1)
            return rotate_panorama_uint8(pano, r["vp"][2::-1])

        e2e_engine = (engine if B_e2e == B else
                      InferenceEngine(model, variables, batch_size=B_e2e,
                                      H=H, W=W, input_format=fmt,
                                      postproc=postproc, dct_luma_m=dct_ym,
                                      dct_chroma_m=dct_cm,
                                      dct_quality=dct_q))
        # Warm up one pano through both stages UNTIMED — the cold call
        # pays one-time costs (native .so builds on a fresh clone,
        # gather-table/direction-grid precompute) — then clock a warm
        # pano for the steady-state single-stream figure.
        preprocess_one(raws[0])
        t0 = time.time()
        warm = preprocess_one(raws[1 % len(raws)])
        preprocess_s = time.time() - t0   # single-stream s/pano figure
        res0 = finish(e2e_engine(
            _pack([np.broadcast_to(warm, (B_e2e, H, W, 3))],
                  fmt, dct_ym, dct_cm, dct_q)[0]))
        assert len(res0) == B_e2e

        results = []
        t0 = time.time()
        with ThreadPoolExecutor(e2e_workers) as pool:
            aligned_iter = pool.map(preprocess_one, raws)

            def batch_feed():
                buf = []
                for a in aligned_iter:
                    buf.append(a)
                    if len(buf) == B_e2e:
                        yield _pack([np.stack(buf)], fmt, dct_ym,
                                    dct_cm, dct_q)[0]
                        buf = []

            for batch_res in serve_stream(e2e_engine, batch_feed(),
                                          depth=2, finish=finish):
                results.extend(batch_res)
        dt = time.time() - t0
        assert len(results) == n_e2e
        e2e_pps = n_e2e / dt
        # Divisor: the measured reference pipeline on this host
        # (tools/ref_e2e.py writes REF_E2E.json), else None.
        ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "REF_E2E.json")
        if os.path.isfile(ref_path):
            with open(ref_path) as f:
                ref_rec = json.load(f)
            ref_e2e = ref_rec.get("e2e_panos_per_sec")
            ref_e2e_gpu = ref_rec.get("e2e_panos_per_sec_gpu_adj")
            if ref_e2e:
                e2e_vs_baseline = round(e2e_pps / ref_e2e, 2)
            # The north star says "vs PyTorch-GPU": also quote the ratio
            # against the GPU-adjusted reference (its CPU forward swapped
            # for the README-derived 12 ms GPU estimate — see
            # tools/ref_e2e.py gpu_adj_policy), pre-empting the
            # "you compared against CPU torch" objection.
            if ref_e2e_gpu:
                e2e_vs_baseline_gpu_adj = round(e2e_pps / ref_e2e_gpu, 2)

    print(json.dumps({
        "metric": f"serving panos/sec (bf16 resnet50_rnn fwd + full "
                  f"{postproc} post-proc on device, batch {B}, 512x1024 "
                  f"aligned demo panos, {fmt} ingest "
                  f"[{wire_bytes // 1024} KiB/pano], median of "
                  f"{len(reps)} timed loops after 1 tunnel-warmup loop; "
                  f"spread + compute-bound + preprocess-inclusive "
                  f"figures in extra fields)",
        "value": round(panos_per_sec, 2),
        "unit": "panos/sec",
        "vs_baseline": round(panos_per_sec / REFERENCE_PANOS_PER_SEC_ESTIMATE,
                             2),
        "reps_panos_per_sec": [round(r, 2) for r in reps],
        "warmup_rep_panos_per_sec": (round(warmup_rep, 2)
                                     if warmup_rep is not None else None),
        "reps_spread_pct": spread_pct,
        "ingest_mb_per_s": [round(rate0, 1), round(rate1, 1)],
        "best_panos_per_sec": round(max(reps), 2),
        "device_panos_per_sec": round(device_pps, 2),
        "serving_mfu_pct": serving_mfu,
        "fwd_gflops_per_pano": (round(flops_per_pano / 1e9, 1)
                                if flops_per_pano else None),
        "e2e_panos_per_sec": (round(e2e_pps, 2)
                              if e2e_pps is not None else None),
        "e2e_vs_baseline": e2e_vs_baseline,
        "e2e_vs_baseline_gpu_adj": e2e_vs_baseline_gpu_adj,
        "ref_e2e_panos_per_sec": ref_e2e,
        "ref_e2e_gpu_adj_panos_per_sec": ref_e2e_gpu,
        "e2e_workers": e2e_workers,
        "preprocess_s_per_pano": (round(preprocess_s, 3)
                                  if preprocess_s is not None else None),
        "wire_bytes_per_pano": int(wire_bytes),
        "baseline_panos_per_sec": REFERENCE_PANOS_PER_SEC_ESTIMATE,
        "config": {"batch": B, "depth": depth, "fmt": fmt,
                   "postproc": postproc, "lstm": lstm_impl,
                   "s2d_stem": s2d, "quant_int8": quant,
                   "fused_blocks": bool(fused)},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
