#!/usr/bin/env python3
"""Print the canonical run id for a config (reference make_run_id.py)."""

from __future__ import annotations

import argparse

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.training.config import (
        auto_run_id,
        load_yaml_config,
        normalize_run_id,
    )

    cfg = load_yaml_config(args.config)
    print(normalize_run_id(cfg.get("run_id")) or auto_run_id(cfg, args.config))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
