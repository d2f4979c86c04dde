"""Tensor-parallel sharding rules for the ('data', 'model') mesh.

The reference's only distribution mechanism is single-host DataParallel
(train.py:190-192); params are replicated there and on our 'data' axis.
This module makes the mesh's 'model' axis real: a rule function mapping
every array in a TrainState/variables pytree to a PartitionSpec, sharding
the encoder's convolution kernels channel-wise over 'model'. GSPMD then
propagates the channel sharding through the activations and inserts the
collectives (there are no hand-written collectives anywhere).

What gets sharded and why:
- Under the conv stacks (the 'encoder' and 'height' subtrees — >95% of
  the FLOPs): conv kernels [kh, kw, cin, cout] -> P(None, None, None,
  'model'), and the per-channel vectors that ride on them (BN
  scale/bias, running mean/var, conv bias) -> P('model') so they stay
  aligned with the sharded cout (GSPMD propagates channel sharding onto
  BN stats; a replicated spec there would disagree with the propagated
  layout and force per-step resharding). Only cout is ever sharded —
  cin stays replicated, so GSPMD all-gathers each layer's
  channel-sharded activation before the next conv instead of reducing
  Megatron-style partial sums; at these activation sizes (<= a few MB)
  the all-gather rides ICI cheaply and keeps the rules one-sided and
  simple.
- The bi-LSTM and head stay replicated (nothing outside
  'encoder'/'height' is sharded). The recurrence carries [B, H] state
  through 256 sequential steps; sharding its 4H gate axis puts a
  collective inside every scan step for <5% of total FLOPs. At
  reference scale (H=512) replication is the faster and simpler
  mapping; the rule function is the single place to change if a larger
  head ever warrants it.
- Optimizer moments follow their parameters: the rules key on names
  along the tree path, and optax's Adam mu/nu mirror the param tree, so
  one tree_map_with_path over the whole TrainState shards params,
  batch_stats and moments consistently. Scalars (step, schedule count)
  and everything unmatched replicate.

Divisibility: a leaf is only sharded when the channel dim divides
n_model; anything else replicates. With n_model=1 every spec is P() and
the layout degenerates to pure data parallelism — dp/tp is a mesh-shape
change, not a code change.
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, FlattenedIndexKey, GetAttrKey, SequenceKey

# Module subtrees whose conv channels shard over 'model'. Everything
# else (bi_rnn, linear head, step counters) replicates by design.
_TP_SUBTREES = ("encoder", "height")


def _path_names(path):
    """All string-valued keys along a tree path (module/param names)."""
    names = []
    for k in path:
        if isinstance(k, DictKey):
            names.append(str(k.key))
        elif isinstance(k, GetAttrKey):
            names.append(str(k.name))
        elif isinstance(k, (SequenceKey, FlattenedIndexKey)):
            continue
    return names


def tp_spec(path, leaf, n_model: int) -> P:
    """PartitionSpec for one array leaf under channel-parallel TP rules."""
    shape = getattr(leaf, "shape", None)
    if shape is None or n_model <= 1:
        return P()
    names = _path_names(path)
    if not any(n in _TP_SUBTREES for n in names):
        return P()
    name = names[-1] if names else ""
    if name == "kernel" and len(shape) == 4 and shape[3] % n_model == 0:
        return P(None, None, None, "model")
    if (name in ("scale", "bias", "mean", "var") and len(shape) == 1
            and shape[0] % n_model == 0):
        return P("model")
    return P()


def state_shardings(mesh: Mesh, tree):
    """NamedSharding pytree for a TrainState/variables under TP rules.

    Works on concrete arrays or ShapeDtypeStruct trees (eval_shape).
    """
    n_model = mesh.shape.get("model", 1)

    def spec(path, leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        return NamedSharding(mesh, tp_spec(path, leaf, n_model))

    return jax.tree_util.tree_map_with_path(spec, tree)


def shard_state(mesh: Mesh, tree):
    """device_put a TrainState/variables pytree per the TP rules."""
    sh = state_shardings(mesh, tree)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, s)
        if isinstance(s, NamedSharding) else a,
        tree, sh)
