#!/usr/bin/env python3
"""Prepare an AMR classification dataset (reference prepare_amr_dataset.py,
CARD-style): sequences + resistance labels → probe-ready splits."""

from __future__ import annotations

import argparse
import csv
import json
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="CSV/TSV with sequence + amr_family (or label) columns")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--label_column", default="amr_family")
    ap.add_argument("--test_fraction", type=float, default=0.2)
    ap.add_argument("--min_class_count", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import numpy as np

    delim = "\t" if args.input.endswith((".tsv", ".tab")) else ","
    with open(args.input) as f:
        rows = list(csv.DictReader(f, delimiter=delim))
    labeled = [
        {"id": row.get("id") or f"seq{i}", "sequence": row["sequence"],
         "label_name": str(row.get(args.label_column) or row.get("label") or "").strip()}
        for i, row in enumerate(rows)
        if row.get("sequence") and (row.get(args.label_column) or row.get("label"))
    ]
    counts: dict[str, int] = {}
    for r in labeled:
        counts[r["label_name"]] = counts.get(r["label_name"], 0) + 1
    kept = sorted(c for c, n in counts.items() if n >= args.min_class_count)
    class_to_id = {c: i for i, c in enumerate(kept)}
    labeled = [r for r in labeled if r["label_name"] in class_to_id]

    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(labeled))
    n_test = int(round(len(labeled) * args.test_fraction))
    test_idx = set(int(i) for i in order[:n_test])

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for split, keep in (("train", lambda i: i not in test_idx),
                        ("test", lambda i: i in test_idx)):
        split_rows = [(i, r) for i, r in enumerate(labeled) if keep(i)]
        with (out_dir / f"{split}_sequences.csv").open("w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(["id", "sequence"])
            for _, r in split_rows:
                writer.writerow([r["id"], r["sequence"]])
        with (out_dir / f"{split}_labels.csv").open("w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(["id", "label", "label_name"])
            for _, r in split_rows:
                writer.writerow([r["id"], class_to_id[r["label_name"]], r["label_name"]])
    report = {"n_records": len(labeled), "n_classes": len(kept),
              "classes": {c: counts[c] for c in kept}}
    (out_dir / "dataset_report.json").write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
