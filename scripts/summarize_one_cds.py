#!/usr/bin/env python3
"""Summarize a run's one_cds__best.tsv (reference summarize_one_cds.py)."""

from __future__ import annotations

import argparse
import csv
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--tsv", default=None,
                    help="default: <run>/tables/one_cds__best.tsv")
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    tsv = Path(args.tsv) if args.tsv else run_dir / "tables" / "one_cds__best.tsv"
    if not tsv.exists():
        raise SystemExit(f"{tsv} not found")
    with tsv.open() as f:
        rows = list(csv.DictReader(f, delimiter="\t"))
    if not rows:
        raise SystemExit(f"{tsv} is empty")

    summary: dict = {"rows": len(rows), "columns": list(rows[0].keys())}
    for col in rows[0]:
        vals = []
        for row in rows:
            try:
                vals.append(float(row[col]))
            except (TypeError, ValueError):
                break
        if len(vals) == len(rows):
            arr = np.asarray(vals)
            summary[col] = {
                "mean": float(arr.mean()), "median": float(np.median(arr)),
                "min": float(arr.min()), "max": float(arr.max()),
            }
    out = run_dir / "tables" / "one_cds_summary.json"
    out.write_text(json.dumps(summary, indent=2) + "\n")
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
