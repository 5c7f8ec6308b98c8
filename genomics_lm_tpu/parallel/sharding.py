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

from genomics_lm_tpu.parallel.mesh import DATA_AXIS


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


__all__ = [
    "batch_sharding",
    "replicated",
    "tree_replicated",
    "zero1_opt_state_sharding",
]
