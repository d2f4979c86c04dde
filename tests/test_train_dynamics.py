"""Learning-dynamics pin: training from scratch must still learn.

The golden-checkpoint tests (test_golden_ckpt.py) pin *numerics* of a
frozen checkpoint, but a silent regression in the optimizer, the LR
schedule, BN statistics updates, or the loss plumbing would leave those
green while real training quietly stops working — exactly the gap
VERDICT r03 "Next #6" names. This slow test trains the synthetic
resnet18_rnn from scratch at reduced resolution through the REAL stack
(make_optimizer + warmup_poly_schedule + TrainEngine.step, the same path
cli/train.py drives) and asserts the raw-polygon 3DIoU on held-out
synth rooms clears a committed threshold — the metric the training
loop's best-checkpoint selection runs on (ref train.py:289-346).

Runtime is bounded by the reduced resolution (128x256 is 1/16 the
pixels of the flagship 512x1024); the threshold is calibrated with
margin (see THRESHOLD note below).
"""

import os

import numpy as np
import pytest

SEED = 594277            # the reference training seed (train.py:129)
H, W = 128, 256
STEPS = int(os.environ.get("DYN_STEPS", 150))
BS = 4
N_BATCHES = 8
N_VAL = 8
# Calibration on this commit's stack (1-core CPU, ~6 min):
#   untrained init  -> 0.007 raw 3DIoU on the same held-out rooms
#   150 steps @3e-4 -> 0.259   (400 steps -> 0.297; lr 1e-3 plateaus
#                               with HIGHER loss and fails the halving
#                               check below — 3e-4 is the better recipe)
# The assert sits ~1.7x below the measured value so only a real dynamics
# regression (not seed jitter) trips it, while any broken optimizer/
# schedule/BN path (which leaves IoU near the 0.007 floor) fails loudly.
THRESHOLD = float(os.environ.get("DYN_THRESHOLD", 0.15))


def _run_dynamics(steps, threshold):
    import jax
    import jax.numpy as jnp

    from horizonnet_tpu.data.synth import synth_batch, synth_room
    from horizonnet_tpu.evals import new_general_losses, test_general
    from horizonnet_tpu.inference import InferenceEngine, postprocess
    from horizonnet_tpu.models import build_model
    from horizonnet_tpu.models.registry import init_model
    from horizonnet_tpu.train import (create_train_state,
                                      warmup_poly_schedule)
    from horizonnet_tpu.train.engine import TrainEngine
    from horizonnet_tpu.train.step import make_optimizer

    rng = np.random.default_rng(SEED)
    data = [synth_batch(rng, BS, H=H, W=W) for _ in range(N_BATCHES)]

    model = build_model("resnet18", use_rnn=True)
    variables = init_model(model, jax.random.PRNGKey(SEED), (1, H, W, 3))
    tx = make_optimizer("Adam", warmup_poly_schedule(
        float(os.environ.get("DYN_LR", 3e-4)),
        max_iters=steps, warmup_iters=max(1, steps // 6)))
    state = create_train_state(model, variables, tx)
    engine = TrainEngine(model, state, batch_size=BS, H=H, W=W)

    xs = [jnp.asarray(d[0], jnp.float32) / 255.0 for d in data]
    jrng = jax.random.PRNGKey(SEED)
    early, late = [], []
    for it in range(steps):
        k = it % N_BATCHES
        jrng, srng = jax.random.split(jrng)
        m = engine.step(xs[k], data[k][1], data[k][2], srng)
        (early if it < 20 else late).append(float(m["total"]))

    # The loss itself must have moved: a dead optimizer (zero LR, broken
    # grads) fails here even before the IoU check
    assert np.mean(late[-20:]) < 0.5 * np.mean(early), \
        (np.mean(early), np.mean(late[-20:]))

    st = engine.host_state()
    trained = {"params": st.params, "batch_stats": st.batch_stats}
    val_engine = InferenceEngine(model, trained, batch_size=1, H=H, W=W)

    val_rng = np.random.default_rng(SEED + 1)
    losses = new_general_losses()
    for _ in range(N_VAL):
        img, gt_cor = synth_room(val_rng, H=H, W=W)
        bon, cor = (np.asarray(a) for a in
                    val_engine(img[None].astype(np.float32) / 255.0))
        dt_cor_id, _, _ = postprocess(bon[0], cor[0, 0], H=H, W=W,
                                      force_raw=True)
        # test_general consumes 1024x512 pixel coords (evals/general.py)
        test_general(dt_cor_id * [1024, 512],
                     gt_cor * [1024 / W, 512 / H], 1024, 512, losses)

    iou3d = float(np.mean(losses["overall"]["3DIoU"]))
    print(f"train-dynamics: {steps} steps -> held-out raw 3DIoU "
          f"{iou3d:.3f} (threshold {threshold})")
    assert iou3d >= threshold, (
        f"training dynamics regressed: held-out 3DIoU {iou3d:.3f} < "
        f"{threshold} after {steps} steps")


@pytest.mark.slow
def test_training_from_scratch_reaches_3diou():
    _run_dynamics(STEPS, THRESHOLD)


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get("DYN_LONG"),
                    reason="long tier: set DYN_LONG=1 (~16 min on 1 core)")
def test_training_from_scratch_long_tier():
    """Stricter pin (round-4 verdict #8): 150 steps -> 0.15 catches
    "optimizer broken", not "optimizer degraded" — a ~2x LR error or a
    subtly wrong BN update can still clear it. 400 steps must reach
    0.25 (run green on this stack 2026-08-19: 0.297, 19 min on one
    throttled core). Env-gated so the default slow tier's runtime is
    unchanged; CI can opt in with DYN_LONG=1."""
    _run_dynamics(int(os.environ.get("DYN_LONG_STEPS", 400)),
                  float(os.environ.get("DYN_LONG_THRESHOLD", 0.25)))
