#!/usr/bin/env python3
"""Protein LM trainer CLI (reference src/protein_lm/train_lm.py __main__)."""

from __future__ import annotations

import argparse

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Train a protein language model")
    ap.add_argument("--config", required=True)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--run-id", dest="run_id", default=None)
    ap.add_argument("--run_root", default="runs/protein_lm")
    args = ap.parse_args(argv)

    import yaml

    from genomics_lm_tpu.protein.train_lm import train

    with open(args.config) as f:
        config = yaml.safe_load(f) or {}
    train(config, resume=args.resume, run_id=args.run_id, run_root=args.run_root)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
