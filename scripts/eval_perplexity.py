#!/usr/bin/env python3
"""Held-out perplexity evaluation (reference eval_perplexity.py — alias of
evaluate_test, which reports loss/perplexity with the alpha-weighted KPI)."""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts.evaluate_test import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
