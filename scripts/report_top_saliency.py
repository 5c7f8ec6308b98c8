#!/usr/bin/env python3
"""Top-saliency windows report (reference report_top_saliency.py:1-9 —
top-K windows by summed saliency from tables/saliency.csv)."""

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
    ap.add_argument("--window", type=int, default=9)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    saliency_csv = run_dir / "tables" / "saliency.csv"
    if not saliency_csv.exists():
        raise SystemExit(
            f"{saliency_csv} not found — run scripts/analyze_saliency.py first"
        )
    with saliency_csv.open() as f:
        rows = list(csv.DictReader(f))
    tokens = [r["token"] for r in rows]
    values = np.asarray([float(r["saliency"]) for r in rows])

    w = max(1, min(args.window, len(values)))
    windows = [
        {
            "start": s,
            "end": s + w,
            "tokens": "".join(t if len(t) == 3 else "." for t in tokens[s : s + w]),
            "sum_saliency": float(values[s : s + w].sum()),
            "mean_saliency": float(values[s : s + w].mean()),
        }
        for s in range(0, len(values) - w + 1)
    ]
    top = sorted(windows, key=lambda r: -r["sum_saliency"])[: args.top]

    out = run_dir / "tables" / "top_saliency_segments.csv"
    with out.open("w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(top[0].keys()) if top else ["start"])
        writer.writeheader()
        writer.writerows(top)
    print(json.dumps({"windows": len(windows), "top": top[:5], "out": str(out)},
                     indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
