#!/usr/bin/env python3
"""Launch the run dashboard (reference dashboard.py — alias of web_dashboard)."""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts.web_dashboard import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
