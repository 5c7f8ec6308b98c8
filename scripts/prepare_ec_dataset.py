#!/usr/bin/env python3
"""Prepare an EC-number classification dataset (reference prepare_ec_dataset).

Input: CSV/TSV with ``sequence`` (CDS DNA) and ``ec`` (EC number) columns.
Output: embedding-extraction input CSV + labels CSV with EC level-1 classes,
group-aware train/test split, class-count report.
"""

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
    ap.add_argument("--input", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--ec_level", type=int, default=1, choices=[1, 2, 3, 4])
    ap.add_argument("--group_column", default=None,
                    help="optional genome/genus column for disjoint splits")
    ap.add_argument("--test_fraction", type=float, default=0.2)
    ap.add_argument("--min_class_count", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import numpy as np

    delim = "\t" if args.input.endswith((".tsv", ".tab")) else ","
    with open(args.input) as f:
        rows = list(csv.DictReader(f, delimiter=delim))

    def ec_class(ec: str) -> str | None:
        parts = str(ec).strip().split(".")
        if not parts or not parts[0].isdigit():
            return None
        return ".".join(parts[: args.ec_level])

    labeled = []
    for i, row in enumerate(rows):
        cls = ec_class(row.get("ec") or row.get("ec_number") or "")
        if cls is None or not row.get("sequence"):
            continue
        labeled.append({
            "id": row.get("id") or f"seq{i}",
            "sequence": row["sequence"],
            "ec_class": cls,
            "group": row.get(args.group_column, f"seq{i}") if args.group_column else f"seq{i}",
        })

    counts: dict[str, int] = {}
    for r in labeled:
        counts[r["ec_class"]] = counts.get(r["ec_class"], 0) + 1
    kept_classes = sorted(c for c, n in counts.items() if n >= args.min_class_count)
    class_to_id = {c: i for i, c in enumerate(kept_classes)}
    labeled = [r for r in labeled if r["ec_class"] in class_to_id]

    rng = np.random.default_rng(args.seed)
    groups = sorted({r["group"] for r in labeled})
    rng.shuffle(groups)
    n_test_groups = max(1, int(round(len(groups) * args.test_fraction)))
    test_groups = set(groups[:n_test_groups])

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for split, keep in (("train", lambda r: r["group"] not in test_groups),
                        ("test", lambda r: r["group"] in test_groups)):
        split_rows = [r for r in labeled if keep(r)]
        with (out_dir / f"{split}_sequences.csv").open("w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(["id", "sequence"])
            for r in split_rows:
                writer.writerow([r["id"], r["sequence"]])
        with (out_dir / f"{split}_labels.csv").open("w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(["id", "label", "ec_class"])
            for r in split_rows:
                writer.writerow([r["id"], class_to_id[r["ec_class"]], r["ec_class"]])
    report = {
        "n_records": len(labeled),
        "n_classes": len(kept_classes),
        "classes": {c: counts[c] for c in kept_classes},
        "test_groups": len(test_groups),
        "ec_level": args.ec_level,
    }
    (out_dir / "dataset_report.json").write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
