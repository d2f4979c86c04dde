"""Per-op device-time breakdown of the train step via jax.profiler.

Captures a profiler trace of S fused train steps, parses the xplane proto
directly (the tensorboard converter in this image is broken against its
own TF build), and prints the top ops by total device time with their
fraction of the step. This is the ground truth for where the 170+ ms of
a bs-24 train step actually goes.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
      python tools/trace_ops.py [batch] [dtype] [lstm_impl] [top_n]
"""

import collections
import glob
import os
import re
import sys
import tempfile
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(bs=24, dtype="bf16", lstm_impl="scan", S=4):
    import jax
    import jax.numpy as jnp

    from horizonnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from horizonnet_tpu.data.synth import synth_batch
    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.registry import init_model
    from horizonnet_tpu.train import create_train_state
    from horizonnet_tpu.train.step import loss_terms, make_optimizer
    import optax

    H, W = 512, 1024
    cdtype = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    imgs, y_bon, y_cor, _ = synth_batch(rng, bs)
    x = imgs.astype(np.float32) / 255.0

    model = build_model("resnet50", use_rnn=True, dtype=cdtype,
                        lstm_impl=lstm_impl)
    variables = init_model(model, jax.random.PRNGKey(0))
    state = create_train_state(model, variables, make_optimizer("Adam"))
    tx = state.tx

    def step(st, srng, x, yb, yc):
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": st.batch_stats},
                x, train=True, rngs={"dropout": srng},
                mutable=["batch_stats"])
            bl, cl = loss_terms(*out, yb, yc)
            return bl + cl, mutated["batch_stats"]

        (_, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(st.params)
        upd, opt = tx.update(grads, st.opt_state, st.params)
        return st.replace(step=st.step + 1,
                          params=optax.apply_updates(st.params, upd),
                          batch_stats=stats, opt_state=opt)

    @partial(jax.jit, donate_argnums=(0,))
    def multi(st, rng, x, yb, yc):
        def body(carry, _):
            s0, r = carry
            r, s = jax.random.split(r)
            return (step(s0, s, x, yb, yc), r), ()

        (st, rng), _ = jax.lax.scan(body, (st, rng), None, length=S)
        return st

    rng0 = jax.random.PRNGKey(0)
    specs = [jax.eval_shape(lambda v=v: v)
             for v in (state, rng0, x, y_bon, y_cor)]
    t0 = time.time()
    mc = multi.lower(*specs).compile()
    print(f"compile {time.time() - t0:.0f}s", flush=True)
    fmts, _ = mc.input_formats
    dstate = jax.device_put(state, fmts[0])
    drng = jax.device_put(rng0, fmts[1])
    dargs = [jax.device_put(a, f)
             for a, f in zip((x, y_bon, y_cor), fmts[2:])]
    dstate = mc(dstate, drng, *dargs)
    jax.block_until_ready(dstate)

    tdir = tempfile.mkdtemp(prefix="trace_ops_")
    with jax.profiler.trace(tdir):
        dstate = mc(dstate, drng, *dargs)
        jax.block_until_ready(dstate)
    return tdir, S


_CLASS_RULES = [
    ("convolution", re.compile(r"%?convolution")),
    ("while/control", re.compile(r"%?(while|conditional)")),
    ("async copy (DMA)", re.compile(r"copy-start|copy-done")),
    ("maxpool-bwd (select-scatter)", re.compile(r"select-and-scatter")),
    ("fusion (elementwise/BN/etc)", re.compile(r"fusion")),
    ("copy/transpose", re.compile(r"%?(copy|transpose|bitcast)")),
    ("collectives", re.compile(r"all-reduce|reduce-scatter|all-gather")),
    ("custom(pallas)", re.compile(r"custom-call|tpu_custom_call")),
]


def _group_key(name):
    """'%convolution.123 = bf16[24,256,512,64]{...} convolution(...)'
    -> 'convolution bf16[24,256,512,64]'."""
    head = name.split(" = ", 1)
    kind = re.sub(r"\.\d+$", "", head[0].lstrip("%"))
    shape = ""
    if len(head) > 1:
        m = re.match(r"\(?([a-z0-9]+\[[0-9,]*\])", head[1])
        if m:
            shape = " " + m.group(1)
    return kind + shape


def report(tdir, S, top_n=35):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {tdir}"
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())

    print(f"planes: {[p.name for p in xs.planes]}", flush=True)
    dev = None
    for p in xs.planes:
        if "TPU" in p.name and "HOST" not in p.name.upper():
            dev = p
            break
    if dev is None:
        for p in xs.planes:
            if p.name.startswith("/device:"):
                dev = p
                break
    assert dev is not None, "no device plane"

    # Aggregate SELF time: events on an XLA-op line nest (while/fusion
    # contain their body ops), so credit each event its duration minus the
    # time covered by nested events (stack sweep over properly-nested
    # spans). Without this, summing durations counts the whole step once
    # per nesting level (a naive sum reports ~8x the real step time).
    totals = collections.Counter()
    meta = dev.event_metadata

    def pop_one(stack):
        s, e, name, child = stack.pop()
        totals[name] += (e - s - child) / 1e6  # -> us
        if stack:
            stack[-1][3] += e - s

    for line in dev.lines:
        if "Ops" not in line.name:
            continue
        evs = sorted(((ev.offset_ps, ev.offset_ps + ev.duration_ps,
                       meta[ev.metadata_id].name) for ev in line.events),
                     key=lambda e: (e[0], -(e[1] - e[0])))
        stack = []  # [start, end, name, child_time]
        for s, e, name in evs:
            while stack and stack[-1][1] <= s:
                pop_one(stack)
            stack.append([s, e, name, 0])
        while stack:
            pop_one(stack)

    grand = sum(totals.values())
    grouped = collections.Counter()
    counts = collections.Counter()
    for name, us in totals.items():
        k = _group_key(name)
        grouped[k] += us
        counts[k] += 1
    print(f"\ntotal device self-time {grand / 1e3 / S:.1f} ms/step "
          f"over {S} steps; top {top_n} op groups:")
    print(f"{'us/step':>10}  {'%':>5}  {'n':>4}  op group")
    for k, us in grouped.most_common(top_n):
        print(f"{us / S:10.0f}  {100 * us / grand:5.1f}  {counts[k]:4d}  "
              f"{k[:90]}")

    classes = collections.Counter()
    for name, us in totals.items():
        for label, rx in _CLASS_RULES:
            if rx.search(name):
                classes[label] += us
                break
        else:
            classes["other"] += us
    print("\nby class:")
    for label, us in classes.most_common():
        print(f"{us / S / 1e3:8.2f} ms/step  {100 * us / grand:5.1f}%  "
              f"{label}")


if __name__ == "__main__":
    a = sys.argv[1:]
    bs = int(a[0]) if a else 24
    dtype = a[1] if len(a) > 1 else "bf16"
    impl = a[2] if len(a) > 2 else "scan"
    top = int(a[3]) if len(a) > 3 else 35
    tdir, S = capture(bs, dtype, impl)
    report(tdir, S, top)
