#!/usr/bin/env python3
"""Run the 6-step interpretability analysis (reference analysis.sh steps)."""

from __future__ import annotations

import argparse
import json

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--val_npz", required=True)
    ap.add_argument("--probe_dna", default="ATGAAACCCGGGTTT")
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.evals.analysis import run_full_analysis

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    steps = run_full_analysis(run_dir, args.val_npz, probe_dna=args.probe_dna)
    print(json.dumps({k: v for k, v in steps.items()}, indent=2, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
