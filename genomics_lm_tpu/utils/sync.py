"""Device synchronization that works on remote/tunneled runtimes.

``jax.block_until_ready`` can return immediately on proxied PJRT backends
(observed on the axon relay); fetching a device-computed scalar forces the
execution queue to drain with a single-value transfer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hard_sync(tree) -> float:
    """Drain the device queue; returns a checksum scalar of the first leaf."""
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.sum(leaf).astype(jnp.float32))


__all__ = ["hard_sync"]
