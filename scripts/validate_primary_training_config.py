#!/usr/bin/env python3
"""Validate a primary-training config against the frozen contract
(reference validate_primary_training_config.py — CLI over
training.contracts.load_and_validate_primary_training_config)."""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="training config (json/yaml)")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.training.contracts import (
        load_and_validate_primary_training_config,
    )

    try:
        cfg = load_and_validate_primary_training_config(args.config)
    except Exception as exc:
        print(f"[contract] INVALID: {exc}")
        return 1
    print(json.dumps({"status": "valid", **cfg}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
