"""bench.py contract: the driver runs it unattended at round end, so an
API drift between bench's helpers and the library (wire packers, engine
signatures) must turn the suite red FIRST. (trace_serving.py broke this
way once when pack_dct's signature changed; bench is the copy that
matters.)
"""

import importlib.util
import os

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_helpers_match_engine_contract():
    import pytest
    if not os.path.isfile(
            "/root/reference/assets/preprocessed/demo_aligned_rgb.png"):
        pytest.skip("reference demo assets not mounted")
    bench = _load_bench()
    from horizonnet_tpu.ops.dct import (DEFAULT_CHROMA_M, DEFAULT_LUMA_M,
                                        DEFAULT_QUALITY, dct_wire_shape)

    B, H, W = 2, 64, 128
    batches = bench._demo_batches(B, H, W, n_distinct=1)
    assert batches[0].shape == (B, H, W, 3)
    assert batches[0].dtype == np.uint8

    packed = bench._pack(batches, "dct", DEFAULT_LUMA_M, DEFAULT_CHROMA_M,
                         DEFAULT_QUALITY)
    assert packed[0].shape == dct_wire_shape(B, H, W)
    assert packed[0].dtype == np.int8

    yuv = bench._pack(batches, "yuv420", DEFAULT_LUMA_M, DEFAULT_CHROMA_M,
                      DEFAULT_QUALITY)
    assert yuv[0].shape == (B, 6, H // 2, W // 2)

    f32 = bench._pack(batches, "float", DEFAULT_LUMA_M, DEFAULT_CHROMA_M,
                      DEFAULT_QUALITY)
    assert f32[0].dtype == np.float32 and f32[0].max() <= 1.0

    # The env knobs bench reads must stay known to this test (a rename
    # silently reverts the driver run to defaults)
    src = open(os.path.join(ROOT, "bench.py")).read()
    for knob in ("BENCH_B", "BENCH_DEPTH", "BENCH_FMT", "BENCH_POSTPROC",
                 "BENCH_REPS", "BENCH_E2E", "BENCH_DCT_LUMA_M",
                 "BENCH_DCT_CHROMA_M", "BENCH_DCT_Q", "BENCH_LSTM",
                 "BENCH_S2D", "BENCH_PROBE_BUDGET_S", "BENCH_QUANT",
                 "BENCH_E2E_WORKERS", "BENCH_E2E_B", "BENCH_E2E_N"):
        assert knob in src, knob

    # Headline contract (round-3 + round-4 verdicts): value = MEDIAN of
    # the counted reps after ONE discarded tunnel-warmup loop, best +
    # warmup + spread kept as side fields; e2e carries its own measured
    # divisor, both raw and GPU-adjusted.
    assert "panos_per_sec = float(np.median(reps))" in src
    assert "warmup_rep = serve_loop() if n_reps > 1 else None" in src
    for field in ("best_panos_per_sec", "warmup_rep_panos_per_sec",
                  "reps_spread_pct", "e2e_vs_baseline",
                  "e2e_vs_baseline_gpu_adj", "ref_e2e_panos_per_sec",
                  "ref_e2e_gpu_adj_panos_per_sec", "serving_mfu_pct",
                  "fwd_gflops_per_pano"):
        assert field in src, field


def test_bench_finish_callsites_single_arg():
    """bench.py defines finish(outs) -> list and uses it in TWO sections
    (the timed serving loop and the e2e block). Round 5 regression: the
    serving section moved to the single-arg return-the-batch convention
    while the e2e block still called finish(outs, results) — a TypeError
    that only fired in the (default-on) e2e stage of an unattended driver
    run. Pin the convention at every call site."""
    import ast

    tree = ast.parse(open(os.path.join(ROOT, "bench.py")).read())
    calls = [n for n in ast.walk(tree)
             if isinstance(n, ast.Call)
             and isinstance(n.func, ast.Name) and n.func.id == "finish"]
    assert calls, "bench.py no longer calls finish()?"
    for c in calls:
        assert len(c.args) == 1 and not c.keywords, (
            f"bench.py:{c.lineno}: finish() must take exactly the device "
            f"outputs and return the finished batch")
    defs = [n for n in ast.walk(tree)
            if isinstance(n, ast.FunctionDef) and n.name == "finish"]
    for d in defs:
        assert len(d.args.args) == 1, (
            f"bench.py:{d.lineno}: finish must stay single-arg")


def test_serve_stream_ordering_with_fake_engine():
    """bench's timed loop and the CLI both ride inference.serve_stream;
    its in-order, one-output-per-input contract must hold regardless of
    depth (a real-engine equivalence test lives in test_inference)."""
    from horizonnet_tpu.inference import serve_stream

    class FakeEngine:
        def put(self, x):
            return x

        def run(self, x):
            return ("out", x)

    eng = FakeEngine()
    for depth in (1, 3, 10):
        got = list(serve_stream(eng, iter(range(7)), depth=depth))
        assert got == [("out", k) for k in range(7)]
    assert list(serve_stream(eng, iter([]), depth=3)) == []

    # finish= variant (worker-thread host tail): same in-order,
    # one-result-per-input contract, with finish applied.
    def finish(outs):
        return ("fin",) + outs

    for depth in (1, 3, 10):
        for workers in (1, 2):
            got = list(serve_stream(eng, iter(range(7)), depth=depth,
                                    finish=finish, workers=workers))
            assert got == [("fin", "out", k) for k in range(7)]
    assert list(serve_stream(eng, iter([]), depth=3, finish=finish)) == []

    # Exceptions from the tail re-raise at yield, not silently dropped.
    def boom(outs):
        raise RuntimeError("tail failed")

    import pytest
    with pytest.raises(RuntimeError, match="tail failed"):
        list(serve_stream(eng, iter(range(3)), depth=1, finish=boom))


def test_ref_e2e_divisor_merge_is_conservative():
    """REF_E2E.json's divisor policy: the recorded e2e figure must be the
    MAX over run history (fastest reference observed -> smallest credited
    speedup for us), with every run preserved. Also: legacy files without
    a runs list seed the history from their top-level figures."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_e2e", os.path.join(ROOT, "tools", "ref_e2e.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def run(e2e, pre=5.0, inf=2.0, n=2, pipe="p"):
        return {"e2e_panos_per_sec": e2e, "preprocess_s_per_pano": pre,
                "infer_postproc_s_per_pano": inf, "n_timed": n,
                "pipeline": pipe, "host": "x"}

    # Fresh file: the single run is the divisor
    out = mod.merge_runs(None, run(0.10, pipe="a"))
    assert out["e2e_panos_per_sec"] == 0.10 and len(out["runs"]) == 1

    # Slower re-measurement must NOT lower the divisor
    out2 = mod.merge_runs(out, run(0.08, pre=6.0, pipe="b"))
    assert out2["e2e_panos_per_sec"] == 0.10
    assert out2["pipeline"] == "a" and out2["preprocess_s_per_pano"] == 5.0
    assert [r["e2e_panos_per_sec"] for r in out2["runs"]] == [0.10, 0.08]

    # Faster re-measurement raises it
    out3 = mod.merge_runs(out2, run(0.14, pipe="c"))
    assert out3["e2e_panos_per_sec"] == 0.14 and len(out3["runs"]) == 3

    # Legacy file (no runs list) seeds history from top-level figures
    legacy = run(0.12, pipe="old")
    out4 = mod.merge_runs(legacy, run(0.09, pipe="new"))
    assert out4["e2e_panos_per_sec"] == 0.12 and len(out4["runs"]) == 2

    # gpu_adj divisor is rebuilt from the fastest stage times across runs
    out5 = mod.merge_runs(
        out3, dict(run(0.09, pre=6.0, pipe="d"),
                   host_post_s_per_pano=0.05,
                   e2e_panos_per_sec_gpu_adj=0.16))
    assert out5["e2e_panos_per_sec_gpu_adj"] == round(
        1.0 / (5.0 + 0.05 + mod.GPU_FWD_S), 4)

    # The committed artifact follows the policy
    import json as _json
    with open(os.path.join(ROOT, "REF_E2E.json")) as f:
        rec = _json.load(f)
    assert rec["e2e_panos_per_sec"] == max(
        r["e2e_panos_per_sec"] for r in rec["runs"])
    pres = [r["preprocess_s_per_pano"] for r in rec["runs"]]
    posts = [r["host_post_s_per_pano"] for r in rec["runs"]
             if "host_post_s_per_pano" in r]
    assert rec["e2e_panos_per_sec_gpu_adj"] == round(
        1.0 / (min(pres) + min(posts) + mod.GPU_FWD_S), 4)
