"""Decompose the training-step time by ablation (where do the ms go?).

Times four compiled programs on device-resident data, all at the reference
recipe shape (README_ST3D.md:24 — bs 24, 512x1024):

  full        fwd+bwd+Adam, use_rnn=True   (the real train step)
  no_rnn      fwd+bwd+Adam, use_rnn=False  (MLP head; full - no_rnn ~= the
                                            bi-LSTM recurrence fwd+bwd cost,
                                            the one sequential piece)
  fwd_only    forward + loss only, use_rnn=True
  encoder     fwd+bwd of the encoder alone (sum-of-features loss) — the
              conv FLOPs the MXU should be spending its time on

Each is timed as a fused lax.scan of S steps per dispatch so this sandbox's
tunnel latency is excluded (same method as tools/train_throughput.py's
fused row, which pins the per-step row to <1%% in both dtypes).

Usage: python tools/train_profile.py [steps] [batch] [dtype]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_scan(make_step, state_like, args, S=4, reps=3):
    """Compile scan-of-S-steps of make_step, run, return (s/step, flops)."""
    import jax

    @partial(jax.jit, donate_argnums=(0,))
    def multi(state, rng, *a):
        def body(carry, _):
            st, r = carry
            r, s = jax.random.split(r)
            st = make_step(st, s, *a)
            return (st, r), ()

        (state, rng), _ = jax.lax.scan(body, (state, rng), None, length=S)
        return state

    rng0 = jax.random.PRNGKey(0)
    specs = [jax.eval_shape(lambda v=v: v) for v in (state_like, rng0, *args)]
    t0 = time.time()
    mc = multi.lower(*specs).compile()
    compile_s = time.time() - t0
    flops = None
    try:
        ca = mc.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) / S or None
    except Exception:
        pass
    fmts, _ = mc.input_formats
    dstate = jax.device_put(state_like, fmts[0])
    drng = jax.device_put(rng0, fmts[1])
    dargs = [jax.device_put(a, f) for a, f in zip(args, fmts[2:])]
    import jax.numpy as jnp

    def force(st):
        # one-scalar fetch forces the queued execution chain;
        # block_until_ready does not reliably wait on the axon backend
        return float(jnp.ravel(jax.tree.leaves(st)[0])[0])

    dstate = mc(dstate, drng, *dargs)  # warmup
    force(dstate)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        dstate = mc(dstate, drng, *dargs)
        force(dstate)
        best = min(best, (time.time() - t0) / S)
    del dstate
    return best, flops, compile_s


def main(steps=4, bs=24, dtype="bf16"):
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

    def train_like(model, state):
        tx = state.tx

        def step(st, srng, x, yb, yc):
            def loss_fn(params):
                out, mutated = model.apply(
                    {"params": params, "batch_stats": st.batch_stats},
                    x, train=True, rngs={"dropout": srng},
                    mutable=["batch_stats"])
                bon, cor = out
                bl, cl = loss_terms(bon, cor, yb, yc)
                return bl + cl, mutated["batch_stats"]

            (_, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params)
            upd, opt = tx.update(grads, st.opt_state, st.params)
            return st.replace(step=st.step + 1,
                              params=optax.apply_updates(st.params, upd),
                              batch_stats=stats, opt_state=opt)

        return step

    rows = []
    for name, use_rnn, impl in (("full", True, "scan"),
                                ("full_pl", True, "pallas_train"),
                                ("no_rnn", False, "scan")):
        model = build_model("resnet50", use_rnn=use_rnn, dtype=cdtype,
                            lstm_impl=impl)
        variables = init_model(model, jax.random.PRNGKey(0))
        state = create_train_state(model, variables, make_optimizer("Adam"))
        dt, fl, cs = timed_scan(train_like(model, state), state,
                                (x, y_bon, y_cor), S=steps)
        rows.append((name, dt, fl))
        print(f"{name:9s} {dt * 1e3:7.1f} ms/step"
              f"  ({fl / 1e12:.2f} TF, compile {cs:.0f}s)", flush=True)
        del model, variables, state

    # forward-only (loss value, no grad)
    model = build_model("resnet50", use_rnn=True, dtype=cdtype)
    variables = init_model(model, jax.random.PRNGKey(0))
    state = create_train_state(model, variables, make_optimizer("Adam"))

    def fwd_step(st, srng, x, yb, yc):
        out, _ = model.apply(
            {"params": st.params, "batch_stats": st.batch_stats},
            x, train=True, rngs={"dropout": srng}, mutable=["batch_stats"])
        bl, cl = loss_terms(*out, yb, yc)
        # Data-dependent predicate (False for NaN) so XLA can neither
        # constant-fold the increment nor DCE the forward: `loss * 0`
        # folds to 0 and silently times an EMPTY program.
        return st.replace(step=st.step
                          + (bl + cl > -jnp.inf).astype(jnp.int32))

    dt, fl, cs = timed_scan(fwd_step, state, (x, y_bon, y_cor), S=steps)
    rows.append(("fwd_only", dt, fl))
    print(f"{'fwd_only':9s} {dt * 1e3:7.1f} ms/step"
          f"  ({fl / 1e12:.2f} TF, compile {cs:.0f}s)", flush=True)

    # encoder-only fwd+bwd (where the conv FLOPs live)
    from horizonnet_tpu.models.resnet import ResNetEncoder

    enc = ResNetEncoder("resnet50", cdtype, False, 0.1)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        enc_vars = jax.jit(lambda k: enc.init(
            {"params": k}, jnp.zeros((1, H, W, 3), jnp.float32),
            False))(jax.random.PRNGKey(0))
    enc_state = create_train_state(enc, enc_vars, make_optimizer("Adam"))

    def enc_step(st, srng, x):
        def loss_fn(params):
            feats, mutated = enc.apply(
                {"params": params, "batch_stats": st.batch_stats},
                x.astype(cdtype), True, mutable=["batch_stats"])
            s = sum(jnp.mean(f.astype(jnp.float32) ** 2) for f in feats)
            return s, mutated["batch_stats"]

        (_, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(st.params)
        upd, opt = st.tx.update(grads, st.opt_state, st.params)
        return st.replace(step=st.step + 1,
                          params=optax.apply_updates(st.params, upd),
                          batch_stats=stats, opt_state=opt)

    try:
        dt, fl, cs = timed_scan(enc_step, enc_state, (x,), S=steps)
        rows.append(("encoder", dt, fl))
        print(f"{'encoder':9s} {dt * 1e3:7.1f} ms/step"
              f"  ({fl / 1e12:.2f} TF, compile {cs:.0f}s)", flush=True)
    except Exception as e:  # ablation-only; don't lose the main rows
        print(f"encoder ablation failed: {e}", flush=True)

    full = dict((n, d) for n, d, _ in rows)
    if "full" in full and "no_rnn" in full:
        print(f"\nbi-LSTM recurrence share (full - no_rnn): "
              f"{(full['full'] - full['no_rnn']) * 1e3:.1f} ms "
              f"({100 * (1 - full['no_rnn'] / full['full']):.0f}%)")
    if "full" in full and "fwd_only" in full:
        print(f"backward+optimizer share: "
              f"{(full['full'] - full['fwd_only']) * 1e3:.1f} ms")
    return 0


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 4, int(a[1]) if len(a) > 1 else 24,
         a[2] if len(a) > 2 else "bf16")
