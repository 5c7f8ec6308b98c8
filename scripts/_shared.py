"""Shared CLI plumbing: repo path bootstrap and run-artifact helpers.

Parity: reference ``scripts/_shared.py`` (run-dir resolution helpers).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# Some TPU platform plugins override ``jax_platforms`` programmatically at
# import time, silently ignoring the standard JAX_PLATFORMS env var.  Restore
# the documented env-var semantics so ``JAX_PLATFORMS=cpu python scripts/...``
# reliably pins the backend (tests and CPU-only smoke runs depend on it).
if os.environ.get("JAX_PLATFORMS"):
    try:
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:  # jax missing/unconfigurable: leave platform selection alone
        pass


def resolve_run_dir(run_id: str, root: str | Path = "runs") -> Path:
    """Accept a run id under ``runs/`` or a direct path."""
    direct = Path(run_id)
    if direct.is_dir():
        return direct
    candidate = Path(root) / run_id
    if candidate.is_dir():
        return candidate
    raise FileNotFoundError(f"run directory not found: {run_id}")
