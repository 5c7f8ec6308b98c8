#!/usr/bin/env python3
"""Audit a downstream test set against frozen pretraining records
(reference audit_downstream_pretraining.py — windowed nucleotide/protein
overlap between a probe dataset and the CodonLM training split)."""

from __future__ import annotations

import argparse
import csv
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def load_pretraining(dataset_dir: Path) -> list[dict]:
    """Training-split source records from a prepared dataset directory
    (source_metadata.tsv rows aligned line-by-line with source_dna.txt)."""
    meta_path = dataset_dir / "source_metadata.tsv"
    dna_path = dataset_dir / "source_dna.txt"
    sequences = dna_path.read_text().splitlines()
    records = []
    with meta_path.open(newline="") as f:
        for idx, row in enumerate(csv.DictReader(f, delimiter="\t")):
            if row.get("split") != "train":
                continue
            if idx >= len(sequences):
                raise SystemExit(f"row {idx} exceeds {dna_path}")
            records.append({
                "source_id": f"pretraining:{row['source_id']}",
                "split": "train",
                "sequence": sequences[idx],
            })
    return records


def load_downstream(path: Path, id_column: str, sequence_column: str) -> list[dict]:
    records = []
    with path.open(newline="") as f:
        reader = csv.DictReader(
            f, delimiter="\t" if path.suffix == ".tsv" else ","
        )
        for i, row in enumerate(reader):
            seq = row.get(sequence_column)
            if seq:
                records.append({
                    "source_id": row.get(id_column) or f"downstream:{i}",
                    "sequence": seq,
                })
    return records


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_dir", required=True,
                    help="prepared dataset dir (source_metadata.tsv + source_dna.txt)")
    ap.add_argument("--downstream", required=True, help="downstream CSV/TSV")
    ap.add_argument("--id_column", default="id")
    ap.add_argument("--sequence_column", default="sequence")
    ap.add_argument("--nucleotide_window", type=int, default=30)
    ap.add_argument("--protein_window", type=int, default=10)
    ap.add_argument("--max_allowed_identity", type=float, default=None,
                    help="fail (exit 1) if any max overlap exceeds this")
    ap.add_argument("--out", default="outputs/audits/downstream_pretraining.json")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.data.leakage import audit_generated_sequences

    training = load_pretraining(Path(args.dataset_dir))
    downstream = load_downstream(Path(args.downstream), args.id_column,
                                 args.sequence_column)
    report = audit_generated_sequences(
        training, downstream, Path(args.out),
        nucleotide_window=args.nucleotide_window,
        protein_window=args.protein_window,
    )
    print(json.dumps(report["summary"], indent=2))
    if args.max_allowed_identity is not None:
        worst = max(
            report["summary"][k]["max"] for k in ("nucleotide", "protein")
            if report["summary"].get(k, {}).get("max") is not None
        )
        if worst > args.max_allowed_identity:
            print(f"[audit] FAIL: max overlap {worst:.3f} > "
                  f"{args.max_allowed_identity}")
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
