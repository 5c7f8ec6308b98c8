#!/usr/bin/env python3
"""Exploratory EDA over a completed run (reference run_eda.py).

Creates runs/<id>/analysis/eda and summarizes whatever exploratory artifacts
exist: motif clusters (motif_clusters.npz), one-CDS score tables, and the
loss curves.
"""

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
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    eda_dir = run_dir / "analysis" / "eda"
    eda_dir.mkdir(parents=True, exist_ok=True)
    report: dict = {"run_id": run_dir.name, "sections": {}}

    clusters_path = run_dir / "motif_clusters.npz"
    if clusters_path.exists():
        with np.load(clusters_path, allow_pickle=True) as z:
            labels = z["labels"] if "labels" in z else None
            section = {k: list(np.asarray(z[k]).shape) for k in z.files}
            if labels is not None:
                uniq, counts = np.unique(labels, return_counts=True)
                section["cluster_sizes"] = {
                    int(u): int(c) for u, c in zip(uniq, counts)
                }
        report["sections"]["motif_clusters"] = section

    one_cds = run_dir / "tables" / "one_cds__best.tsv"
    if one_cds.exists():
        with one_cds.open() as f:
            rows = list(csv.DictReader(f, delimiter="\t"))
        report["sections"]["one_cds"] = {"rows": len(rows),
                                         "columns": list(rows[0].keys()) if rows else []}

    curves = run_dir / "scores" / "curves.csv"
    if curves.exists():
        with curves.open() as f:
            rows = list(csv.DictReader(f))
        if rows:
            val = [float(r["val_loss"]) for r in rows if r.get("val_loss")]
            report["sections"]["curves"] = {
                "epochs": len(rows),
                "final_val_loss": val[-1] if val else None,
                "best_val_loss": min(val) if val else None,
            }

    out = eda_dir / "eda_summary.json"
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
