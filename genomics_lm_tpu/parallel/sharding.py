"""Sharding rules: replicated params, data-sharded batches, ZeRO-1 moments.

Under pjit, parameters stay replicated (the models are small — 20–60M), the
global batch is sharded on its batch axis over ``data``, and XLA inserts the
gradient all-reduce. For the d512 tier, AdamW first/second moments are
sharded over ``data`` (ZeRO-1): each leaf is split on its first axis whose
length divides the axis size, falling back to replication.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from genomics_lm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, *, batch_axis_index: int = 0, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard an array on its batch axis (default axis 0) over the data axis."""
    spec = [None] * (batch_axis_index + 1)
    spec[batch_axis_index] = axis
    return NamedSharding(mesh, P(*spec))


def tree_replicated(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree.map(lambda _: sharding, tree)


def zero1_opt_state_sharding(opt_state, mesh: Mesh, *, axis: str = DATA_AXIS):
    """Shard optimizer-state leaves over ``axis`` where a dimension divides.

    Scalars (step counts) and indivisible leaves replicate. Applied as the
    ``out_shardings``/carry sharding of the train step, GSPMD then keeps the
    moments resident in shards and re-materializes updates with a
    reduce-scatter/all-gather pair — ZeRO-1 semantics without manual
    collectives.
    """
    axis_size = mesh.shape[axis]

    def leaf_sharding(leaf):
        shape = getattr(leaf, "shape", ())
        for dim, size in enumerate(shape):
            if size % axis_size == 0 and size > 0:
                spec = [None] * len(shape)
                spec[dim] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf_sharding, opt_state)


# --- Tensor parallelism (Megatron-style column/row splits via GSPMD) --------
#
# The CodonGPT parameter tree keeps per-layer weights stacked on a leading L
# axis, so every rule below leaves axis 0 unsharded. Column-parallel weights
# (QKV, MLP up/gate) shard their fan-out; row-parallel weights (attention
# output proj, MLP down) shard their fan-in, and XLA inserts the partial-sum
# all-reduce that Megatron writes by hand. Embeddings, layer norms, and the
# LM/termination heads replicate — they are small next to the blocks.
#
# Correctness never depends on divisibility: any rule whose sharded dimension
# does not divide the axis size falls back to replication for that leaf. For
# zero-reshard propagation through the (B,T,D)->(B,T,H,hd) reshape, pick a
# tensor-parallel degree that divides n_head (and kv_heads under GQA).

_COLUMN_SUFFIXES = (
    ("attn", "query"),
    ("attn", "key"),
    ("attn", "value"),
    ("mlp", "w_gate"),
    ("mlp", "w_up"),
    ("mlp", "fc"),
)
_ROW_SUFFIXES = (
    ("attn", "proj"),
    ("mlp", "w_down"),
    ("mlp", "proj"),
)


def _path_names(path) -> tuple[str, ...]:
    names = []
    for entry in path:
        key = getattr(entry, "key", None)
        if key is None:
            key = getattr(entry, "idx", None)
        names.append(str(key))
    return tuple(names)


def tp_spec(path_names: tuple[str, ...], shape, tp: int, axis: str):
    """PartitionSpec for one leaf under tensor parallelism (or replication).

    ``path_names`` is the flattened pytree path; rules match on the module
    suffix so the same function applies to the parameter tree and to
    optimizer-moment trees that mirror it (optax ``mu``/``nu``).
    """
    from jax.sharding import PartitionSpec as P

    if tp <= 1 or len(shape) == 0:
        return P()
    # ('attn'|'mlp', <layer name>) possibly followed by 'w'/'b'
    if path_names and path_names[-1] in ("w", "b"):
        suffix, leaf = tuple(path_names[-3:-1]), path_names[-1]
    else:
        suffix, leaf = tuple(path_names[-2:]), "w"

    if suffix in _COLUMN_SUFFIXES:
        # weight (L, fan_in, fan_out) -> shard fan_out; bias (L, fan_out) too
        dim = len(shape) - 1
        if shape[dim] % tp == 0:
            spec = [None] * len(shape)
            spec[dim] = axis
            return P(*spec)
        return P()
    if suffix in _ROW_SUFFIXES:
        if leaf == "b":  # row-parallel bias is added after the all-reduce
            return P()
        dim = len(shape) - 2  # weight (L, fan_in, fan_out) -> shard fan_in
        if dim >= 0 and shape[dim] % tp == 0:
            spec = [None] * len(shape)
            spec[dim] = axis
            return P(*spec)
        return P()
    return P()


def ep_spec(path_names: tuple[str, ...], shape, ep: int, axis: str,
            n_experts: int):
    """PartitionSpec for one leaf under expert parallelism, or None.

    MoE expert weights live under ``blocks.mlp`` with a leading (L, E, ...)
    stack — shard the E axis (dim 1) over ``axis`` when the expert count
    divides. The router and every non-expert leaf return None (no EP rule;
    the caller falls back to TP/replication).
    """
    if ep <= 1 or n_experts % ep or "mlp" not in path_names:
        return None
    if len(shape) >= 2 and shape[1] == n_experts:
        spec = [None] * len(shape)
        spec[1] = axis
        return P(*spec)
    return None


def moe_param_sharding(tree, mesh: Mesh, *, n_experts: int,
                       axis: str = MODEL_AXIS, tp_axis: str | None = None):
    """NamedSharding tree for expert parallelism (optionally + TP).

    Expert-stacked MLP weights shard their E axis over ``axis``; with
    ``tp_axis`` the attention projections additionally take the Megatron
    column/row splits (EP and TP can share one mesh axis — attention is
    tensor-sharded while the MLP is expert-sharded). Router weights and
    everything else replicate. Works on the parameter tree and on moment
    trees that mirror it.
    """
    tp = mesh.shape.get(tp_axis, 1) if tp_axis else 1
    ep = mesh.shape.get(axis, 1)

    def leaf(path, x):
        names = _path_names(path)
        shape = getattr(x, "shape", ())
        spec = ep_spec(names, shape, ep, axis, n_experts)
        if spec is None and tp_axis and "mlp" not in names:
            spec = tp_spec(names, shape, tp, tp_axis)
        return NamedSharding(mesh, spec if spec is not None else P())

    return jax.tree_util.tree_map_with_path(leaf, tree)


def tp_param_sharding(tree, mesh: Mesh, *, axis: str = MODEL_AXIS):
    """NamedSharding tree for Megatron-style tensor parallelism.

    Works on the parameter tree and on any tree that mirrors it (optimizer
    moments): rules match pytree-path suffixes, everything unmatched
    replicates. See module comment for the split layout.
    """
    tp = mesh.shape.get(axis, 1)

    def leaf(path, x):
        return NamedSharding(mesh, tp_spec(_path_names(path), getattr(x, "shape", ()), tp, axis))

    return jax.tree_util.tree_map_with_path(leaf, tree)


def opt_state_sharding(
    opt_state,
    mesh: Mesh,
    *,
    tp_axis: str | None = None,
    zero1: bool = False,
    data_axis: str = DATA_AXIS,
    ep_axis: str | None = None,
    n_experts: int = 0,
):
    """Optimizer-state shardings: TP/EP rules + optional ZeRO-1 data overlay.

    Moment trees mirror the parameter tree, so the tensor-parallel and
    expert-parallel path rules apply unchanged; with ``zero1`` each leaf
    additionally shards its first still-unsharded divisible dimension over
    ``data_axis`` so the AdamW moments never replicate across data-parallel
    peers.
    """
    tp = mesh.shape.get(tp_axis, 1) if tp_axis else 1
    ep = mesh.shape.get(ep_axis, 1) if ep_axis else 1
    dp = mesh.shape[data_axis] if zero1 else 1

    def leaf(path, x):
        names = _path_names(path)
        shape = getattr(x, "shape", ())
        spec = None
        if ep_axis:
            spec = ep_spec(names, shape, ep, ep_axis, n_experts)
            spec = list(spec) if spec is not None else None
        if spec is None and tp_axis and not (ep_axis and "mlp" in names):
            spec = list(tp_spec(names, shape, tp, tp_axis))
        if spec is None:
            spec = []
        spec += [None] * (len(shape) - len(spec))
        if zero1:
            for dim, size in enumerate(shape):
                if spec[dim] is None and size % dp == 0 and size > 0:
                    spec[dim] = data_axis
                    break
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(leaf, opt_state)


__all__ = [
    "batch_sharding",
    "ep_spec",
    "moe_param_sharding",
    "opt_state_sharding",
    "replicated",
    "tp_param_sharding",
    "tp_spec",
    "tree_replicated",
    "zero1_opt_state_sharding",
]
