"""Inference pipeline: batched TTA forward on device + Manhattan fitting.

Reference behavior: inference.py:21-141. TPU-first deltas:
- test-time augmentation (flip / rolls) is built, run and undone entirely on
  device as one batched forward (the reference round-trips numpy per copy,
  inference.py:32-62);
- many panos run per step (the reference loops one at a time);
- in the serving engine's ``postproc="cuboid"`` mode the ENTIRE cuboid
  Manhattan fit (peaks, vote, corner back-projection) runs on device fused
  with the forward (postproc/device.py), so only one packed [B, 17]
  corners+z1 array crosses back to host (postproc.unpack_cuboid_outputs).

This module's host ``postprocess`` is the reference-exact float64 path; the
greedy general-layout fit always stays on host (tiny, sequential;
SURVEY.md §7).
"""

import sys
from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp

from .geometry.equirect import refine_by_fix_z, infer_coory
from .geometry.polygon import polygon_is_valid
from .ops.filters import find_peaks_np
from .postproc import gen_ww


def _tta_forward_fn(model, flip: bool, rotate: tuple):
    """Build the batched-TTA forward. (bon [B,2,W], cor_prob [B,1,W]).

    Augmented copies are concatenated along batch, run in one forward, then
    undone and averaged on device. Sigmoid is applied to cor before
    averaging (inference.py:80).
    """

    def fn(variables, x):
        B, H, W, _ = x.shape
        xs = [x]
        if flip:
            xs.append(jnp.flip(x, axis=2))
        shifts = [int(round(p * W)) for p in rotate]
        for s in shifts:
            xs.append(jnp.roll(x, s, axis=2))
        xa = jnp.concatenate(xs, axis=0)

        bon, cor = model.apply(variables, xa, train=False)
        cor = jax.nn.sigmoid(cor)

        outs_bon, outs_cor = [bon[:B]], [cor[:B]]
        k = 1
        if flip:
            outs_bon.append(jnp.flip(bon[k * B:(k + 1) * B], axis=-1))
            outs_cor.append(jnp.flip(cor[k * B:(k + 1) * B], axis=-1))
            k += 1
        for s in shifts:
            outs_bon.append(jnp.roll(bon[k * B:(k + 1) * B], -s, axis=-1))
            outs_cor.append(jnp.roll(cor[k * B:(k + 1) * B], -s, axis=-1))
            k += 1
        bon = jnp.mean(jnp.stack(outs_bon), axis=0)
        cor = jnp.mean(jnp.stack(outs_cor), axis=0)
        return bon, cor

    return fn


def _format_put(tree, fmt):
    """device_put a pytree into executable formats, detouring through host
    for arrays currently sharded across multiple devices (device_put cannot
    reshard multi-device -> single-device directly)."""
    def to_host_if_sharded(a):
        if isinstance(a, jax.Array) and len(a.devices()) > 1:
            return np.asarray(a)
        return a

    return jax.device_put(jax.tree.map(to_host_if_sharded, tree), fmt)


class InferenceEngine:
    """AOT-compiled, layout-matched serving engine for one config.

    Why this exists: a plain ``jit(model.apply)(variables, x)`` whose
    device arrays don't match the executable's preferred layouts falls
    back to python dispatch and silently re-lays-out every parameter on
    EVERY call (~6 s/call measured vs 41 ms with matched layouts). The
    engine compiles once for a fixed (batch, H, W, TTA) config, then
    device-puts the variables with ``compiled.input_formats`` so each call
    takes the fast path. Calls are async: postprocess the previous batch
    on host while the device runs the next.
    """

    def __init__(self, model, variables, batch_size=1, H=512, W=1024,
                 flip=False, rotate=(), input_uint8=False, postproc=None,
                 mesh=None, input_format=None, dct_luma_m=None,
                 dct_chroma_m=None, dct_quality=None):
        self.model = model
        self.batch_size = batch_size
        self.H, self.W = H, W
        self.postproc = postproc
        if input_format is None:
            input_format = "uint8" if input_uint8 else "float"
        assert input_format in ("float", "uint8", "yuv420", "dct",
                                "dct4"), input_format
        self.input_format = input_format
        self.input_uint8 = input_format == "uint8"
        from .ops import dct as _dct
        dct_luma_m = (_dct.DEFAULT_LUMA_M if dct_luma_m is None
                      else dct_luma_m)
        dct_chroma_m = (_dct.DEFAULT_CHROMA_M if dct_chroma_m is None
                        else dct_chroma_m)
        dct_quality = (_dct.DEFAULT_QUALITY if dct_quality is None
                       else dct_quality)
        self.dct_luma_m, self.dct_chroma_m = dct_luma_m, dct_chroma_m
        self.dct_quality = dct_quality
        base = _tta_forward_fn(model, bool(flip), tuple(rotate))
        if input_format == "float":
            in_dtype, in_shape = jnp.float32, (batch_size, H, W, 3)
        elif input_format == "uint8":
            # uint8 panos cross the host->device link 4x cheaper than f32
            in_dtype, in_shape = jnp.uint8, (batch_size, H, W, 3)
        elif input_format == "yuv420":
            # YUV 4:2:0 planes (the decoded form of JPEG/video sources):
            # half the bytes of RGB uint8; RGB is rebuilt on device
            in_dtype = jnp.uint8
            in_shape = (batch_size, 6, H // 2, W // 2)
        elif input_format == "dct":
            # Quantized zig-zag DCT coefficients (the JPEG-like compressed
            # wire format, ops/dct.py): (15, 6) is 5.3x fewer bytes than
            # yuv420; dequant + IDCT + color run inside the program
            in_dtype = jnp.int8
            in_shape = _dct.dct_wire_shape(batch_size, H, W,
                                           dct_luma_m, dct_chroma_m)
        else:
            # dct4: block-floating-point nibble wire — int8 DC + per-tile
            # 4-bit shift + int4 AC mantissas (ops/dct.py); (15, 6) lands
            # at 88 KiB/pano vs dct's 144 on the same budget
            in_dtype = jnp.int8
            in_shape = _dct.dct4_wire_shape(batch_size, H, W,
                                            dct_luma_m, dct_chroma_m)

        def fn(variables, x):
            if input_format == "uint8":
                x = x.astype(jnp.float32) / 255.0
            elif input_format == "yuv420":
                from .ops.yuv import unpack_yuv420_to_rgb
                x = unpack_yuv420_to_rgb(x)
            elif input_format == "dct":
                from .ops.dct import unpack_dct_to_rgb
                x = unpack_dct_to_rgb(x, H, W, dct_luma_m, dct_chroma_m,
                                      dct_quality)
            elif input_format == "dct4":
                from .ops.dct import unpack_dct4_to_rgb
                x = unpack_dct4_to_rgb(x, H, W, dct_luma_m, dct_chroma_m,
                                       dct_quality)
            bon, cor = base(variables, x)
            if postproc == "cuboid":
                # Full Manhattan cuboid fit fused into the same XLA program:
                # the host receives ONE packed [B, 17] array (corners + z1,
                # postproc.unpack_cuboid_outputs) instead of [B, 3, W] raw
                # outputs — one array because the remote transport charges
                # fixed latency per fetch (pack_general_outputs docstring)
                from .postproc.device import (pack_cuboid_outputs,
                                              postprocess_cuboid_batch)
                return pack_cuboid_outputs(
                    postprocess_cuboid_batch(bon, cor[:, 0], H, W))
            elif postproc == "general":
                # General (non-cuboid) serving: peaks + projection +
                # per-segment votes fused on device; the host runs only
                # the tiny greedy commitment on the ~1.3 KB candidate
                # summary (postproc/serving.py finish_general_batch).
                # The summary crosses back as ONE packed array — the
                # remote transport charges fixed latency per fetched
                # array, and 7 separate fetches measured slower than the
                # device program itself (pack_general_outputs docstring)
                from .postproc.device import (pack_general_outputs,
                                              postprocess_general_batch)
                return pack_general_outputs(
                    postprocess_general_batch(bon, cor[:, 0], H, W))
            elif postproc is not None:
                raise ValueError(f"unknown postproc mode {postproc!r}")
            return bon, cor

        self._in_dtype = in_dtype
        if mesh is not None:
            # Data-parallel serving: TTA batch sharded over the mesh's
            # 'data' axis, params replicated. GSPMD partitions the forward;
            # there is no hand-written collective (parallel/mesh.py).
            from jax.sharding import NamedSharding, PartitionSpec as P
            assert batch_size % mesh.shape["data"] == 0, \
                (batch_size, dict(mesh.shape))
            jitted = jax.jit(fn,
                             in_shardings=(NamedSharding(mesh, P()),
                                           NamedSharding(mesh, P("data"))))
        else:
            jitted = jax.jit(fn)
        x_spec = jax.ShapeDtypeStruct(in_shape, in_dtype)
        v_spec = jax.eval_shape(lambda: variables)
        self.compiled = jitted.lower(v_spec, x_spec).compile()
        (v_fmt, x_fmt), _ = self.compiled.input_formats
        self.variables = _format_put(variables, v_fmt)
        self._x_fmt = x_fmt
        jax.block_until_ready(self.variables)

    def put(self, x):
        """Start the async host->device upload of a batch (double-buffer
        this against run() of the previous batch).

        The host array goes to the executable's preferred format in ONE
        device_put. Never pre-wrap in jnp.asarray: that commits the array
        to the default device first and the second device_put re-lands it
        (a measured 2x upload cost on the remote transport)."""
        x = np.asarray(x, self._in_dtype)
        return jax.device_put(x, self._x_fmt)

    def run(self, x_dev):
        """Run the compiled forward on an already-uploaded batch (async)."""
        return self.compiled(self.variables, x_dev)

    def __call__(self, x):
        """x: [B, H, W, 3] (float32 in [0,1], or uint8 if input_uint8;
        packed [B, 6, H/2, W/2] planes for input_format="yuv420").
        Returns device arrays WITHOUT blocking — call np.asarray on the
        results to synchronize. The result depends on the postproc mode:
        (bon [B,2,W], cor_prob [B,1,W]) by default, a packed [B, 17]
        array for postproc.unpack_cuboid_outputs with postproc="cuboid",
        or the packed candidate array for postproc.finish_general_batch
        with postproc="general"."""
        return self.run(self.put(x))

    def update_variables(self, variables):
        """Swap in new weights (e.g. per validation epoch) without
        recompiling: device-put with the executable's preferred formats."""
        (v_fmt, _), _ = self.compiled.input_formats
        self.variables = _format_put(variables, v_fmt)


def serve_stream(engine, batches, depth=3, finish=None, workers=1):
    """Pipelined serving loop: yield engine outputs in input order while
    keeping up to ``depth`` batches in flight.

    ``batches`` is any iterable of host batches in the engine's wire
    format; because it is consumed lazily, the caller's ingest work for
    batch k+1..k+depth (disk read, wire packing) and the async uploads
    overlap the device compute of batch k. The yielded outputs are
    device arrays exactly as ``engine(x)`` returns them — np.asarray
    synchronizes. This is the serving loop bench.py clocks; the
    inference CLI drives it for --device_postproc runs.

    ``finish``: optional host tail ``finish(outs) -> result`` (e.g.
    postproc.finish_general_batch). When given, each device output is
    handed to a thread pool of ``workers`` threads and the finished
    results are yielded, still in input order. The tail's device->host
    fetch and numpy work then overlap the MAIN thread's upload IO —
    on this box the host->device link is the serving bottleneck
    (~30-45 MB/s after first program load, see
    .claude/skills/verify/SKILL.md), so a tail run inline would add
    1:1 to the per-batch wall time while the link sits idle. Ordering
    is preserved (FIFO future queue); exceptions re-raise at yield.
    """
    from collections import deque

    q = deque()
    if finish is None:
        for x in batches:
            q.append(engine.run(engine.put(x)))
            if len(q) > depth:
                yield q.popleft()
        while q:
            yield q.popleft()
        return

    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        for x in batches:
            q.append(pool.submit(finish, engine.run(engine.put(x))))
            if len(q) > depth:
                yield q.popleft().result()
        while q:
            yield q.popleft().result()


# Engine cache for the convenience net_forward/inference path. Entries
# hold STRONG references to their (model, variables) key objects: the key
# uses id(), and CPython reuses a freed object's id — without the pinned
# refs, new weights allocated at a recycled address would silently hit a
# stale engine. Bounded LRU so swapped-out configs release their device
# parameter copies.
_ENGINE_CACHE = OrderedDict()
_ENGINE_CACHE_MAX = 4


def _get_engine(model, variables, B, H, W, flip, rotate):
    key = (id(model), id(variables), B, H, W, bool(flip), tuple(rotate))
    hit = _ENGINE_CACHE.get(key)
    if hit is not None:
        _ENGINE_CACHE.move_to_end(key)
        return hit[0]
    eng = InferenceEngine(model, variables, B, H, W, flip, rotate)
    _ENGINE_CACHE[key] = (eng, model, variables)
    while len(_ENGINE_CACHE) > _ENGINE_CACHE_MAX:
        _ENGINE_CACHE.popitem(last=False)
    return eng


def net_forward(model, variables, x, flip=False, rotate=()):
    """Public TTA forward; x numpy/jax [B, H, W, 3] in [0,1]."""
    x = np.asarray(x)
    B, H, W, _ = x.shape
    eng = _get_engine(model, variables, B, H, W, flip, rotate)
    return eng(x)


def postprocess(y_bon_, y_cor_, H=512, W=1024, force_cuboid=False,
                force_raw=False, min_v=None, r=0.05):
    """Host post-processing of one pano's raw outputs -> corner list.

    y_bon_: [2, W] boundary angles (radians); y_cor_: [W] corner probability.
    Returns (cor_id [(2N,2) normalized uv], z0, z1).
    Ref: inference.py:90-141.
    """
    y_bon_ = np.asarray(y_bon_, np.float64)
    y_cor_ = np.asarray(y_cor_, np.float64)

    y_bon_ = (y_bon_ / np.pi + 0.5) * H - 0.5
    y_bon_[0] = np.clip(y_bon_[0], 1, H / 2 - 1)
    y_bon_[1] = np.clip(y_bon_[1], H / 2 + 1, H - 2)

    z0 = 50.0
    _, z1 = refine_by_fix_z(y_bon_[0], y_bon_[1], z0, coorH=H)

    if force_raw:
        # Raw per-column ceiling polygon (train-time validation path)
        cor = np.stack([np.arange(W), y_bon_[0]], 1)
    else:
        if min_v is None:
            min_v = 0 if force_cuboid else 0.05
        r_px = int(round(W * r / 2))
        N = 4 if force_cuboid else None
        xs_ = find_peaks_np(y_cor_, r=r_px, min_v=min_v, N=N)[0]

        cor, walls = gen_ww(xs_, y_bon_[0], z0, coorW=W, coorH=H,
                            tol=abs(0.16 * z1 / 1.6),
                            force_cuboid=force_cuboid)
        if not force_cuboid:
            # Guard against self-intersecting general layouts
            xy2d = np.zeros((len(walls), 2), np.float32)
            for i in range(len(walls)):
                xy2d[i, walls[i].axis] = walls[i].value
                xy2d[i, walls[i - 1].axis] = walls[i - 1].value
            if not polygon_is_valid(xy2d):
                print("Fail to generate valid general layout!! "
                      "Generate cuboid as fallback.", file=sys.stderr)
                xs_ = find_peaks_np(y_cor_, r=r_px, min_v=0, N=4)[0]
                cor, walls = gen_ww(xs_, y_bon_[0], z0, coorW=W, coorH=H,
                                    tol=abs(0.16 * z1 / 1.6),
                                    force_cuboid=True)

    # Derive the floor row of every corner from its ceiling row
    cor = np.hstack([cor, infer_coory(cor[:, 1], z1 - z0, z0,
                                      coorH=H)[:, None]])

    cor_id = np.zeros((len(cor) * 2, 2), np.float32)
    for j in range(len(cor)):
        cor_id[j * 2] = cor[j, 0], cor[j, 1]
        cor_id[j * 2 + 1] = cor[j, 0], cor[j, 2]
    cor_id[:, 0] /= W
    cor_id[:, 1] /= H
    return cor_id, z0, float(z1)


def inference(model, variables, x, flip=False, rotate=(), visualize=False,
              force_cuboid=False, force_raw=False, min_v=None, r=0.05):
    """Reference-compatible single/batched inference.

    x: [B, H, W, 3] in [0,1]. Returns a list of (cor_id, z0, z1, vis_out)
    per pano (the reference handles B=1 only; we return a list).
    """
    # Host-side dtype normalization only: a jnp.asarray here would commit
    # the batch to device and the engine's device_put would re-land it
    # (the 2x-upload anti-pattern put()'s docstring warns about)
    x = np.asarray(x, np.float32)
    B, H, W, _ = x.shape
    bon, cor = net_forward(model, variables, x, flip, rotate)
    bon = np.asarray(bon)
    cor = np.asarray(cor)

    results = []
    for b in range(B):
        vis_out = None
        if visualize:
            from .viewer.visualize import visualize_a_data
            vis_out = visualize_a_data(np.asarray(x[b]), bon[b], cor[b, 0])
        cor_id, z0, z1 = postprocess(bon[b], cor[b, 0], H, W, force_cuboid,
                                     force_raw, min_v, r)
        results.append((cor_id, z0, z1, vis_out))
    return results
