#!/usr/bin/env python3
"""Audit a prepared dataset's composition (reference audit_stage2_data.py —
sequence counts, length distribution, split balance, organism coverage)."""

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
    ap.add_argument("--dataset_dir", required=True,
                    help="prepared dataset dir (source_metadata.tsv + source_dna.txt)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import numpy as np

    dataset_dir = Path(args.dataset_dir)
    meta_path = dataset_dir / "source_metadata.tsv"
    dna_path = dataset_dir / "source_dna.txt"
    if not meta_path.exists():
        raise SystemExit(f"{meta_path} not found")
    sequences = dna_path.read_text().splitlines() if dna_path.exists() else []
    with meta_path.open(newline="") as f:
        rows = list(csv.DictReader(f, delimiter="\t"))

    lengths = np.asarray([len(s) for s in sequences]) if sequences else np.zeros(0)
    split_counts: dict[str, int] = {}
    organisms: dict[str, int] = {}
    genomes: dict[str, set] = {}
    for row in rows:
        split_counts[row["split"]] = split_counts.get(row["split"], 0) + 1
        org = row.get("organism") or "unknown"
        organisms[org] = organisms.get(org, 0) + 1
        genomes.setdefault(row["split"], set()).add(row.get("genome", ""))

    report = {
        "total_sequences": len(rows),
        "split_counts": split_counts,
        "genomes_per_split": {k: len(v) for k, v in genomes.items()},
        "organisms": dict(sorted(organisms.items(), key=lambda kv: -kv[1])[:10]),
        "length_nt": {
            "min": int(lengths.min()) if len(lengths) else None,
            "median": float(np.median(lengths)) if len(lengths) else None,
            "mean": float(lengths.mean()) if len(lengths) else None,
            "max": int(lengths.max()) if len(lengths) else None,
        },
        "atg_start_fraction": (
            float(np.mean([s.upper().startswith("ATG") for s in sequences]))
            if sequences else None
        ),
    }
    audit_path = dataset_dir / "leakage_audit.json"
    if audit_path.exists():
        report["leakage_audit_status"] = json.loads(
            audit_path.read_text()
        ).get("status")
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
