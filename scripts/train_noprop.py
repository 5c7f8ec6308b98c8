#!/usr/bin/env python3
"""NoProp trainer CLI (reference src/codonlm/train_noprop.py)."""

from __future__ import annotations

import argparse

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--run_id", default=None)
    ap.add_argument("--noise_sigma", type=float, default=0.1)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.training.config import load_yaml_config
    from genomics_lm_tpu.training.train_noprop import run_training

    cfg = load_yaml_config(args.config)
    run_training(
        cfg, noise_sigma=args.noise_sigma, run_id=args.run_id,
        resume=args.resume, run_root=args.run_root,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
