#!/usr/bin/env python3
"""Write summary tables for every run under a root
(reference generate_run_summaries.py)."""

from __future__ import annotations

import argparse
import csv
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_root", default="runs")
    ap.add_argument("--out", default=None, help="default: <run_root>/summaries.csv")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.evals.aggregator import load_all_runs, summary_rows

    runs = load_all_runs(args.run_root)
    rows = summary_rows(runs)
    out = Path(args.out) if args.out else Path(args.run_root) / "summaries.csv"
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()) if rows
                                else ["run_id"])
        writer.writeheader()
        writer.writerows(rows)
    print(json.dumps({"runs": len(rows), "out": str(out)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
