"""Device mesh construction.

One global mesh over all (possibly multi-host) devices. The data axis is the
only required axis for reference parity (BASELINE.json: DP + sharded
optimizer state); the constructor accepts extra axes so tensor/sequence
sharding can be layered on without API changes.
"""

from __future__ import annotations

import logging

import numpy as np

import jax
from jax.sharding import Mesh

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(
    n_devices: int | None = None,
    *,
    axes: dict[str, int] | None = None,
    devices=None,
) -> Mesh:
    """Build a Mesh. Default: 1-D ``('data',)`` over all devices.

    ``axes`` maps axis name → size (row-major over the device list); sizes
    must multiply to the device count, with at most one -1 wildcard.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    devices = np.asarray(devices)

    if axes is None:
        axes = {DATA_AXIS: len(devices)}
    names = tuple(axes.keys())
    sizes = list(axes.values())
    wildcards = [i for i, s in enumerate(sizes) if s == -1]
    if len(wildcards) > 1:
        raise ValueError("at most one mesh axis may be -1")
    if wildcards:
        known = int(np.prod([s for s in sizes if s != -1])) or 1
        if len(devices) % known:
            raise ValueError(f"{len(devices)} devices not divisible by {known}")
        sizes[wildcards[0]] = len(devices) // known
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh axes {dict(zip(names, sizes))} != {len(devices)} devices")
    return Mesh(devices.reshape(sizes), names)


def initialize_distributed(
    coordinator_address: str | None = None,
    *,
    strict: bool = False,
    **kwargs,
) -> bool:
    """Multi-host bring-up (``jax.distributed.initialize``).

    Returns True on success. By default a failed bring-up degrades to
    single-host with a LOUD warning carrying the exception text — never
    silently (a misconfigured coordinator on a real pod would otherwise
    train N disjoint single-host replicas with no log line). Pod worker
    entry points pass ``strict=True`` so a bad coordinator address raises
    instead of degrading.
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)
        return True
    except (RuntimeError, ValueError) as exc:
        if "already initialized" in str(exc).lower():
            return True  # idempotent re-entry: bring-up already happened
        if strict:
            raise RuntimeError(
                f"distributed bring-up failed (coordinator="
                f"{coordinator_address!r}): {exc}"
            ) from exc
        logger.warning(
            "distributed bring-up FAILED — continuing single-host. "
            "coordinator=%r kwargs=%r error: %s",
            coordinator_address, kwargs, exc,
        )
        return False


__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "initialize_distributed",
    "local_device_count",
    "make_mesh",
]
