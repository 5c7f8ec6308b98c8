#!/usr/bin/env python3
"""Global manifest builder and group-aware splitter
(reference build_global_manifest.py — alias of the leakage-resistant
pipeline_prepare flow: gather CDS across GBFFs, group by genome/genus,
split globally, tokenize, pack, freeze a content-addressed manifest)."""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts.pipeline_prepare import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
