"""Training CLI (reference train.py:61-352 surface).

Same flags and loop structure: per-iter poly LR (inside the jitted
optimizer), optional second "aug" dataset concatenated into each batch,
per-epoch validation computing true 2D/3D IoU / rmse / delta_1 via raw-
polygon inference, best-by-3DIoU checkpointing, periodic epoch saves,
tensorboard scalars.

TPU deltas: one jitted SPMD train step over the device mesh (batch sharded
on the 'data' axis), device-side fused augmentation, bf16 compute option.
"""

import argparse
import os
import sys

import numpy as np


def build_argparser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--id", required=True,
                        help="experiment id for checkpoints and logs")
    parser.add_argument("--ckpt", default="./ckpt")
    parser.add_argument("--logs", default="./logs")
    parser.add_argument("--pth", default=None,
                        help="checkpoint to finetune from (weights only, "
                             "fresh optimizer — reference --pth semantics)")
    parser.add_argument("--resume", default=None,
                        help="training checkpoint (or its ckpt dir) to "
                             "resume from: restores params, BN stats, "
                             "optimizer state, epoch and best score")
    parser.add_argument("--backbone", default="resnet50")
    parser.add_argument("--no_rnn", action="store_true")
    parser.add_argument("--train_root_dir",
                        default="data/layoutnet_dataset/train")
    parser.add_argument("--train_aug_root_dir", default=None)
    parser.add_argument("--valid_root_dir",
                        default="data/layoutnet_dataset/valid")
    parser.add_argument("--no_flip", action="store_true")
    parser.add_argument("--no_rotate", action="store_true")
    parser.add_argument("--no_gamma", action="store_true")
    parser.add_argument("--no_pano_stretch", action="store_true")
    parser.add_argument("--freeze_earlier_blocks", default=-1, type=int)
    parser.add_argument("--batch_size_train", default=8, type=int)
    parser.add_argument("--batch_size_valid", default=2, type=int)
    parser.add_argument("--epochs", default=300, type=int)
    parser.add_argument("--optim", default="Adam")
    parser.add_argument("--lr", default=1e-4, type=float)
    parser.add_argument("--lr_pow", default=0.9, type=float)
    parser.add_argument("--warmup_lr", default=1e-6, type=float)
    parser.add_argument("--warmup_epochs", default=0, type=int)
    parser.add_argument("--beta1", default=0.9, type=float)
    parser.add_argument("--weight_decay", default=0, type=float)
    parser.add_argument("--bn_momentum", default=None, type=float,
                        help="override BatchNorm running-stat momentum")
    parser.add_argument("--num_workers", default=2, type=int,
                        help="batch-prefetch worker threads (0 = sync)")
    parser.add_argument("--wire", default="uint8",
                        choices=["uint8", "dct", "dct4"],
                        help="training-batch upload format: raw uint8 "
                             "pixels, the compressed zig-zag DCT wire "
                             "(ops/dct.py; ~11x fewer bytes, decoded on "
                             "device fused with the augmentation warp), "
                             "or the block-floating-point nibble wire "
                             "dct4 (~17x fewer bytes) — for hosts whose "
                             "accelerator link is the input bottleneck")
    parser.add_argument("--n_model", default=1, type=int,
                        help="tensor-parallel mesh axis size (conv "
                             "channels sharded per parallel/sharding.py)")
    parser.add_argument("--lstm_impl", default="scan",
                        choices=["scan", "pallas_train"],
                        help="LSTM recurrence in the train step: lax.scan "
                             "or the fused differentiable Pallas kernel "
                             "(TPU only; ops/pallas_lstm.py)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (f32 params)")
    parser.add_argument("--s2d_stem", action="store_true",
                        help="space-to-depth rewrite of the stem conv "
                             "(identical math and parameter tree; "
                             "MXU-friendlier on TPU)")
    parser.add_argument("--seed", default=594277, type=int)
    parser.add_argument("--save_every", default=25, type=int)
    parser.add_argument("--seam_pool", action="store_true",
                        help="wrap-padded maxpool (exact seam equivariance; "
                             "breaks torch-checkpoint parity)")
    return parser


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    from ..models import build_model
    from ..models.registry import init_model
    from ..data import PanoCorBonDataset
    from ..data.dataset import make_training_batch
    from ..parallel import make_mesh
    from ..train import create_train_state, warmup_poly_schedule
    from ..train.step import make_optimizer, encoder_freeze_mask
    from ..train.checkpoint import (save_checkpoint, save_model,
                                    load_trained_model, load_checkpoint)
    from ..inference import InferenceEngine, postprocess
    from ..evals import test_general, new_general_losses

    os.makedirs(os.path.join(args.ckpt, args.id), exist_ok=True)

    # Datasets
    aug_flags = dict(flip=not args.no_flip, rotate=not args.no_rotate,
                     gamma=not args.no_gamma, stretch=not args.no_pano_stretch)
    dataset_train = PanoCorBonDataset(args.train_root_dir, wire=args.wire,
                                      **aug_flags)
    dataset_aug = (PanoCorBonDataset(args.train_aug_root_dir, wire=args.wire,
                                     **aug_flags)
                   if args.train_aug_root_dir else None)
    dataset_valid = (PanoCorBonDataset(args.valid_root_dir, return_cor=True)
                     if args.valid_root_dir else None)
    print(f"training dataset contains {len(dataset_train)} images")

    # Peek one sample for the dataset resolution (parameters bind H, W)
    img0 = dataset_train[0][0]
    H, W = img0.shape[:2]

    # Model
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.pth:
        print("Finetune model is given. Ignore --backbone and --no_rnn")
        model, variables = load_trained_model(args.pth)
        # The checkpoint pins backbone/use_rnn; compute config is ours
        model = build_model(model.backbone, model.use_rnn, dtype=dtype,
                            seam_pool=args.seam_pool,
                            lstm_impl=args.lstm_impl,
                            s2d_stem=args.s2d_stem,
                            bn_momentum=(args.bn_momentum
                                         if args.bn_momentum else 0.1))
    else:
        model = build_model(args.backbone, not args.no_rnn, dtype=dtype,
                            seam_pool=args.seam_pool,
                            lstm_impl=args.lstm_impl,
                            s2d_stem=args.s2d_stem,
                            bn_momentum=(args.bn_momentum
                                         if args.bn_momentum else 0.1))
        variables = init_model(model, jax.random.PRNGKey(args.seed),
                               (1, H, W, 3))

    # Effective batch splits when an aug dataset is present. The reference
    # has a bug here (train.py:145-162 re-overwrites the halved batch size,
    # silently training at 1.5x the flag); we do the documented thing.
    if dataset_aug is not None:
        bs_main = args.batch_size_train // 2
        bs_aug = args.batch_size_train - bs_main
    else:
        bs_main, bs_aug = args.batch_size_train, 0
    steps_per_epoch = len(dataset_train) // bs_main
    max_iters = args.epochs * steps_per_epoch
    warmup_iters = args.warmup_epochs * steps_per_epoch

    schedule = warmup_poly_schedule(args.lr, max_iters, args.warmup_lr,
                                    warmup_iters, args.lr_pow)
    mask = (encoder_freeze_mask(variables["params"],
                                args.freeze_earlier_blocks)
            if args.freeze_earlier_blocks != -1 else None)
    tx = make_optimizer(args.optim, schedule, args.lr, args.beta1,
                        args.weight_decay, mask)
    state = create_train_state(model, variables, tx)

    # Resume: restore params/BN/optimizer/epoch/best-score from a training
    # checkpoint (the reference cannot — its --pth restarts the optimizer,
    # train.py:182-186; an interrupted 300-epoch run is unrecoverable there)
    start_epoch, resume_best = 1, 0.0
    if args.resume:
        rp = args.resume
        if os.path.isdir(rp):
            rp = os.path.join(rp, "checkpoint.ckpt")
        state, header = load_checkpoint(rp, state)
        kw = header.get("kwargs", {})
        assert kw.get("backbone", args.backbone) == args.backbone and \
            kw.get("use_rnn", not args.no_rnn) == (not args.no_rnn), \
            f"--resume checkpoint was trained with {kw}, flags disagree"
        start_epoch = int(header["epoch"]) + 1
        resume_best = float(header["best_valid_score"])
        print(f"Resumed from {rp}: epoch {header['epoch']}, "
              f"step {int(state.step)}, best {resume_best:.4f}")

    # Mesh: data parallelism over the local devices, optionally crossed
    # with tensor parallelism (--n_model: conv channels sharded over the
    # 'model' axis, parallel/sharding.py). The engine AOT-compiles the
    # step, lays out the state in the executable's preferred formats and
    # donates it (see train/engine.py).
    from ..train.engine import TrainEngine
    import math
    n_model = max(1, args.n_model)
    assert n_model <= len(jax.devices()), \
        f"--n_model {n_model} exceeds the {len(jax.devices())} local devices"
    n_dev = len(jax.devices()) // n_model
    # SPMD needs batch % n_data == 0; use the largest device count that
    # divides the batch (a 2-sample debug run on an 8-device host must
    # not crash, it just uses fewer devices)
    n_data = math.gcd(bs_main + bs_aug, n_dev)
    mesh = (make_mesh(n_data=n_data, n_model=n_model,
                      devices=jax.devices()[:n_data * n_model])
            if n_data * n_model > 1 else None)
    engine = TrainEngine(model, state, batch_size=bs_main + bs_aug,
                         H=H, W=W, mesh=mesh)

    try:
        from tensorboardX import SummaryWriter
        tb = SummaryWriter(log_dir=os.path.join(args.logs, args.id))
    except ImportError:
        tb = None

    best_valid_score = resume_best
    cur_iter = (start_epoch - 1) * steps_per_epoch
    valid_engine = None  # built lazily; weights swapped per epoch

    from concurrent.futures import ThreadPoolExecutor
    prefetch = (ThreadPoolExecutor(args.num_workers)
                if args.num_workers > 0 else None)

    try:  # per-epoch progress (ref train.py:246,258 uses trange)
        from tqdm import trange
    except ImportError:
        trange = lambda n, **kw: range(n)  # noqa: E731

    def build_batch(epoch_order, aug_epoch_order, it, bat_rng):
        idx = epoch_order[it * bs_main:(it + 1) * bs_main]
        x, y_bon, y_cor = make_training_batch(dataset_train, idx, bat_rng)
        if dataset_aug is not None:
            a_idx = aug_epoch_order[(it * bs_aug) % len(dataset_aug):][:bs_aug]
            xa, ba, ca = make_training_batch(dataset_aug, a_idx, bat_rng)
            x = jnp.concatenate([x, xa], 0)
            y_bon = np.concatenate([y_bon, ba], 0)
            y_cor = np.concatenate([y_cor, ca], 0)
        return x, y_bon, y_cor

    for epoch in range(start_epoch, args.epochs + 1):
        # Per-epoch RNGs derive from (seed, epoch), not a continuous
        # stream, so a --resume'd run sees the exact data order and aug
        # draws of an unbroken run (tested in test_train.py)
        ep_rng = np.random.default_rng([args.seed, epoch])
        jrng = jax.random.fold_in(jax.random.PRNGKey(args.seed), epoch)
        order = ep_rng.permutation(len(dataset_train))
        aug_order = (ep_rng.permutation(len(dataset_aug))
                     if dataset_aug is not None else None)
        # Prefetch: the next batch's host IO + label synthesis + device
        # augmentation run while the current step trains
        nxt = (prefetch.submit(build_batch, order, aug_order, 0, ep_rng)
               if prefetch else None)
        for it in trange(steps_per_epoch, desc=f"Train ep{epoch}",
                         leave=False):
            if prefetch:
                x, y_bon, y_cor = nxt.result()
                if it + 1 < steps_per_epoch:
                    nxt = prefetch.submit(build_batch, order, aug_order,
                                          it + 1, ep_rng)
            else:
                x, y_bon, y_cor = build_batch(order, aug_order, it, ep_rng)
            jrng, step_rng = jax.random.split(jrng)
            metrics = engine.step(x, y_bon, y_cor, step_rng)
            cur_iter += 1
            if tb is not None:
                for k, v in metrics.items():
                    tb.add_scalar(f"train/{k}", float(v), cur_iter)
                tb.add_scalar("train/lr", float(schedule(cur_iter)), cur_iter)

        # Validation: losses + true metrics via raw-polygon inference.
        # The forward is batched at --batch_size_valid (ref runs batch 1,
        # train.py:293-296); postprocess/eval stay per sample on host.
        state = engine.host_state()
        if dataset_valid is not None:
            valid_loss = {}
            variables_now = {"params": state.params,
                             "batch_stats": state.batch_stats}
            bsv = max(1, args.batch_size_valid)
            if valid_engine is None:
                valid_engine = InferenceEngine(model, variables_now,
                                               batch_size=bsv, H=H, W=W)
            else:
                valid_engine.update_variables(variables_now)
            eps = 1e-7
            for j0 in range(0, len(dataset_valid), bsv):
                samples = [dataset_valid[j]
                           for j in range(j0, min(j0 + bsv,
                                                  len(dataset_valid)))]
                nb = len(samples)
                # Fixed-batch engine: pad the tail chunk with repeats
                xb = np.stack([s[0] for s in samples]
                              + [samples[-1][0]] * (bsv - nb))
                try:
                    vb_all, vc_all = valid_engine(xb)
                    vb_all = np.asarray(vb_all)
                    vc_all = np.clip(np.asarray(vc_all), eps, 1 - eps)
                except Exception:
                    vb_all = None
                n_placeheld = 0
                for i in range(nb):
                    img, y_bon, y_cor, gt_cor = samples[i]
                    true_eval = new_general_losses()
                    try:
                        if vb_all is None:
                            # Chunk forward failed (transient device
                            # error): retry THIS sample alone through the
                            # fixed-batch engine so one bad dispatch
                            # doesn't zero a whole bsv-chunk's metrics
                            # and skew best-checkpoint selection
                            x1 = np.broadcast_to(img, (bsv, *img.shape))
                            vb1, vc1 = valid_engine(np.ascontiguousarray(x1))
                            vb = np.asarray(vb1)[0]
                            vp = np.clip(np.asarray(vc1)[0], eps, 1 - eps)
                        else:
                            vb, vp = vb_all[i], vc_all[i]
                        # Validation losses from the same forward (the
                        # engine emits sigmoid probs; BCE from probs ==
                        # BCE-with-logits)
                        bon_l = float(np.abs(vb - y_bon).mean())
                        cor_l = float(-(y_cor * np.log(vp) +
                                        (1 - y_cor) * np.log(1 - vp)).mean())
                        losses = {"bon": bon_l, "cor": cor_l,
                                  "total": bon_l + cor_l}
                        dt_cor_id, _, _ = postprocess(vb, vp[0],
                                                      force_raw=True)
                        dt_cor_id = dt_cor_id * [1024, 512]
                    except Exception:
                        n_placeheld += 1
                        losses = {"bon": 0.0, "cor": 0.0, "total": 0.0}
                        dt_cor_id = np.array([
                            [k // 2 * 1024, 256 - ((k % 2) * 2 - 1) * 120]
                            for k in range(8)])
                    test_general(dt_cor_id, gt_cor, 1024, 512, true_eval)
                    for m in ("2DIoU", "3DIoU", "rmse", "delta_1"):
                        vals = true_eval["overall"][m]
                        losses[m] = float(vals[0]) if vals else 0.0
                    for k, v in losses.items():
                        valid_loss[k] = valid_loss.get(k, 0) + v
                if n_placeheld:
                    print(f"[WARN] validation: {n_placeheld}/{nb} samples "
                          f"in chunk {j0 // bsv} fell back to placeholder "
                          f"metrics after forward failure", file=sys.stderr)
            n = len(dataset_valid)
            if tb is not None:
                for k, v in valid_loss.items():
                    tb.add_scalar(f"valid/{k}", v / n, epoch)
            now_score = valid_loss["3DIoU"] / n
            print(f"Ep{epoch:3d} {now_score:.4f} vs. Best "
                  f"{best_valid_score:.4f}", flush=True)
            is_best = now_score > best_valid_score
            if is_best:
                best_valid_score = now_score
            save_checkpoint(os.path.join(args.ckpt, args.id), state,
                            args.backbone, not args.no_rnn, epoch,
                            best_valid_score, is_best,
                            args=vars(args))

        if epoch % args.save_every == 0:
            save_model(os.path.join(args.ckpt, args.id,
                                    f"epoch_{epoch}.ckpt"),
                       {"params": state.params,
                        "batch_stats": state.batch_stats},
                       args.backbone, not args.no_rnn, args=vars(args))
    return 0


if __name__ == "__main__":
    sys.exit(main())
