"""Test harness: force CPU JAX with a virtual 8-device mesh.

Mirrors the reference's "multi-node without a cluster" need (SURVEY.md §4):
pjit/psum logic is unit-tested on fake multi-device CPU meshes via
``--xla_force_host_platform_device_count`` so no TPU hardware is required.
Must run before any test module imports jax.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
