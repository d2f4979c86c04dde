"""Tensor-parallel sharding rules for the ('data', 'model') mesh.

The reference's only distribution mechanism is single-host DataParallel
(train.py:190-192); params are replicated there and on our 'data' axis.
This module makes the mesh's 'model' axis real: a rule function mapping
every array in a TrainState/variables pytree to a PartitionSpec, sharding
the encoder's convolution kernels channel-wise over 'model'. GSPMD then
propagates the channel sharding through the activations and inserts the
collectives (there are no hand-written collectives anywhere).

What gets sharded and why:
- Conv kernels [kh, kw, cin, cout] -> P(None, None, None, 'model'), and
  the matching per-channel BN scale/bias/mean/var vectors -> P('model').
  The encoder is >95% of the FLOPs and channel-parallel convolution is
  the textbook TP mapping for it; successive convs alternate
  cout-sharded / cin-sharded, so XLA reduces partial sums over 'model'
  exactly where Megatron-style TP places its all-reduce.
- The bi-LSTM and head stay replicated. The recurrence carries [B, H]
  state through 256 sequential steps; sharding its 4H gate axis puts a
  collective inside every scan step for <5% of total FLOPs. At reference
  scale (H=512) replication is the faster and simpler mapping; the rule
  function is the single place to change if a larger head ever warrants
  it.
- Optimizer moments follow their parameters: the rules key on the leaf
  name at the END of the tree path, and optax's Adam mu/nu mirror the
  param tree, so one tree_map_with_path over the whole TrainState shards
  params, batch_stats and moments consistently. Scalars (step, schedule
  count) and everything unmatched replicate.

Divisibility: a leaf is only sharded when the channel dim divides
n_model; anything else (e.g. the 12-unit head bias) replicates. With
n_model=1 every spec is P() and the layout degenerates to pure data
parallelism — dp/tp is a mesh-shape change, not a code change.
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, FlattenedIndexKey, GetAttrKey, SequenceKey


def _leaf_name(path) -> str:
    """Last string-valued key on the tree path (param/collection name)."""
    for k in reversed(path):
        if isinstance(k, DictKey):
            return str(k.key)
        if isinstance(k, GetAttrKey):
            return str(k.name)
        if isinstance(k, (SequenceKey, FlattenedIndexKey)):
            continue
    return ""


def tp_spec(path, leaf, n_model: int) -> P:
    """PartitionSpec for one array leaf under channel-parallel TP rules."""
    shape = getattr(leaf, "shape", None)
    if shape is None or n_model <= 1:
        return P()
    name = _leaf_name(path)
    if name == "kernel" and len(shape) == 4 and shape[3] % n_model == 0:
        return P(None, None, None, "model")
    # Per-channel vectors (BN scale/bias + running mean/var, conv bias):
    # sharded whenever divisible so they stay aligned with the sharded
    # cout of the conv that feeds them (GSPMD propagates channel sharding
    # onto BN stats; a replicated spec here would disagree with the
    # propagated output layout and force per-step resharding).
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
    n_model = mesh.shape.get("model", 1)

    def put(path, leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        return jax.device_put(
            leaf, NamedSharding(mesh, tp_spec(path, leaf, n_model)))

    return jax.tree_util.tree_map_with_path(put, tree)
