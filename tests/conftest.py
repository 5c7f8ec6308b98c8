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

# The axon TPU plugin's registration/re-entry paths call
# jax.config.update("jax_platforms", "axon,cpu") — on this environment
# that can fire MID-SESSION (its deferred claim handshake completes
# minutes into a long pytest-xdist run), flipping workers from the
# 8-device virtual CPU mesh onto the 1-chip remote backend and failing
# every mesh/kernel/parity test that runs afterwards. Tests must stay on
# CPU unconditionally: block any later attempt to change the platform.
_jax_config_update = jax.config.update


def _cpu_pinned_update(name, value, *args, **kwargs):
    if name == "jax_platforms" and value != "cpu":
        import traceback

        print(
            f"[conftest] blocked mid-session jax_platforms={value!r} "
            "(tests are pinned to cpu); origin:",
            file=sys.stderr,
        )
        traceback.print_stack(file=sys.stderr)
        value = "cpu"
    return _jax_config_update(name, value, *args, **kwargs)


jax.config.update = _cpu_pinned_update

# Same defense for the plugin's clear_backends() escape hatch: clearing
# mid-session would invalidate every live array and jit cache in the
# worker even with the platform pinned.
import jax.extend.backend as _jax_ext_backend  # noqa: E402


def _blocked_clear_backends(*args, **kwargs):
    print(
        "[conftest] blocked mid-session jax clear_backends() "
        "(tests are pinned to the initialized cpu backend)",
        file=sys.stderr,
    )


_jax_ext_backend.clear_backends = _blocked_clear_backends

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
