#!/usr/bin/env python3
"""Gradient saliency for a probe sequence (reference analyze_saliency.py)."""

from __future__ import annotations

import argparse
import csv
import json
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--dna", default="ATGAAACCCGGGTTT")
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.evals.analysis import analyze_saliency

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    tables = run_dir / "tables"
    report = analyze_saliency(run_dir, args.dna, tables)
    # csv sidecar for report_top_saliency
    rows = json.loads((tables / "saliency.json").read_text())
    with (tables / "saliency.csv").open("w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["position", "token", "saliency"])
        writer.writeheader()
        writer.writerows(rows)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
