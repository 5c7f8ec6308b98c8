#!/usr/bin/env python3
"""Thin generation front-end (reference infer_generate_cds.py)."""

from __future__ import annotations

import sys

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    from scripts.query_model import main as query_main

    argv = list(sys.argv[1:] if argv is None else argv)
    return query_main([*argv[:1], "--mode", "generate", *argv[1:]])


if __name__ == "__main__":
    raise SystemExit(main())
