#!/usr/bin/env python3
"""Multi-task protein-critic trainer CLI (reference train_multi_task.py)."""

from __future__ import annotations

import argparse

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Train the multi-task protein critic")
    ap.add_argument("--config", required=True)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--transfer_from", default=None)
    ap.add_argument("--run_root", default="runs/protein_critic")
    args = ap.parse_args(argv)

    import yaml

    from genomics_lm_tpu.protein.train_multi_task import train

    with open(args.config) as f:
        cfg = yaml.safe_load(f) or {}
    train(cfg, resume=args.resume, transfer_from=args.transfer_from,
          run_root=args.run_root)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
