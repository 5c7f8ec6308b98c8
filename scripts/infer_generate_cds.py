#!/usr/bin/env python3
"""Thin generation front-end (reference infer_generate_cds.py)."""

from __future__ import annotations

import sys

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    from scripts.query_model import main as query_main

    argv = list(sys.argv[1:] if argv is None else argv)
    return query_main([*argv[:1], "--mode", "generate", *argv[1:]])


if __name__ == "__main__":
    raise SystemExit(main())
