#!/usr/bin/env python3
"""Search the best (batch_size, grad_accum) configuration
(reference optimize_train_batching.py — alias of the OOM-isolated
benchmark_training_speed prober)."""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts.benchmark_training_speed import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
