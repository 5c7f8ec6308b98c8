"""Test harness: force CPU JAX with a virtual 8-device mesh.

Mirrors the reference's "multi-node without a cluster" need (SURVEY.md §4):
pjit/psum logic is unit-tested on fake multi-device CPU meshes via
``--xla_force_host_platform_device_count`` so no TPU hardware is required.

The TPU plugin in this environment selects its platform programmatically
(overriding the JAX_PLATFORMS env var), so the CPU override must also be
programmatic and must run before any backend is initialized.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
