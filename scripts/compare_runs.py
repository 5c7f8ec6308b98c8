#!/usr/bin/env python3
"""Aggregate run metrics into _summary (reference compare_runs.py)."""

from __future__ import annotations

import argparse
import json

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="runs")
    ap.add_argument("--metric", default="best_val_loss",
                    help="also render a comparison chart for this metric")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.evals.aggregator import load_all_runs, summary_rows
    from genomics_lm_tpu.evals.summaries import generate_summary
    from genomics_lm_tpu.evals.visualizer import plot_run_comparison

    runs = load_all_runs(args.root)
    md = generate_summary(args.root)
    try:
        plot_run_comparison(
            runs, args.metric, f"{args.root}/_summary/comparison_{args.metric}.png"
        )
    except Exception as exc:
        print(f"[warn] comparison plot failed: {exc}")
    print(json.dumps(summary_rows(runs), indent=2))
    print(f"[compare] summary → {md}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
