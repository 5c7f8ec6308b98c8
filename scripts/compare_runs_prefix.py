#!/usr/bin/env python3
"""Compare prefix-generation summaries across runs
(reference compare_runs_prefix.py — combined CSV + per-metric plot)."""

from __future__ import annotations

import argparse
import csv
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402

DEFAULT_METRICS = (
    "terminal_stop_rate,hard_cap_rate,mean_generated_codons,pairwise_identity,mean_gc"
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_ids", required=True, help="comma-separated run ids")
    ap.add_argument("--metrics", default=DEFAULT_METRICS)
    ap.add_argument("--out_dir", default="outputs/figs")
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    metrics = [m for m in args.metrics.split(",") if m]
    rows = []
    for run_id in args.run_ids.split(","):
        run_dir = resolve_run_dir(run_id.strip(), args.run_root)
        summary_path = run_dir / "scores" / "generation_prefix.json"
        if not summary_path.exists():
            print(f"[compare] {run_dir.name}: no generation_prefix.json — "
                  "run scripts/eval_generation_prefix.py first; skipping")
            continue
        summary = json.loads(summary_path.read_text())["summary"]
        rows.append({"run_id": run_dir.name,
                     **{m: summary.get(m) for m in metrics}})

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    combined = out_dir / "prefix_comparison.csv"
    with combined.open("w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["run_id", *metrics])
        writer.writeheader()
        writer.writerows(rows)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, len(metrics), figsize=(4 * len(metrics), 3.2))
        axes = [axes] if len(metrics) == 1 else list(axes)
        for ax, metric in zip(axes, metrics):
            vals = [r.get(metric) for r in rows]
            ax.bar(range(len(rows)), [v if v is not None else 0 for v in vals])
            ax.set_xticks(range(len(rows)))
            ax.set_xticklabels([r["run_id"] for r in rows], rotation=45, ha="right",
                               fontsize=7)
            ax.set_title(metric, fontsize=9)
        fig.tight_layout()
        fig.savefig(out_dir / "prefix_comparison.png", dpi=120)
        plt.close(fig)
    except Exception as exc:  # plotting is best-effort
        print(f"[compare] plot skipped: {exc}")

    print(json.dumps({"runs": len(rows), "csv": str(combined)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
