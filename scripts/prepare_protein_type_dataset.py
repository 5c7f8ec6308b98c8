#!/usr/bin/env python3
"""Structural-aware protein-type labels from a UniProt TSV
(reference prepare_protein_type_dataset.py — structured_pdb / predicted /
disordered classes from structure evidence)."""

from __future__ import annotations

import argparse
import csv
import json
import random
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402

PROTEIN_TYPE_LABELS = ["structured_pdb", "structured_predicted", "disordered"]


def classify(keywords: str, pdb_xrefs: str, sequence: str) -> str:
    text = (keywords or "").lower()
    if (pdb_xrefs or "").strip() or "3d-structure" in text:
        return "structured_pdb"
    # crude disorder heuristic: high fraction of disorder-promoting residues
    disorder_residues = sum(c in "PESQKGA" for c in sequence)
    if sequence and disorder_residues / len(sequence) > 0.55:
        return "disordered"
    return "structured_predicted"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tsv", required=True)
    ap.add_argument("--out_dir", default="data/processed/protein_type")
    ap.add_argument("--val_fraction", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    def col(row, *names):
        for name in names:
            for key in row:
                if key.lower() == name.lower():
                    return row[key]
        return ""

    records = []
    with open(args.tsv) as f:
        for row in csv.DictReader(f, delimiter="\t"):
            seq = (col(row, "Sequence") or "").strip().upper()
            if not seq:
                continue
            label = classify(col(row, "Keywords"),
                             col(row, "PDB", "Cross-reference (PDB)"), seq)
            records.append({
                "sequence": seq,
                "protein_type": label,
                "entry": col(row, "Entry"),
                "length": len(seq),
            })
    if not records:
        raise SystemExit("no usable rows in TSV")

    rng = random.Random(args.seed)
    rng.shuffle(records)
    n_val = max(1, int(len(records) * args.val_fraction))
    val, train = records[:n_val], records[n_val:]
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, split in (("protein_type_train.jsonl", train),
                        ("protein_type_val.jsonl", val)):
        with (out_dir / name).open("w") as f:
            for r in split:
                f.write(json.dumps(r) + "\n")
    counts = {label: sum(r["protein_type"] == label for r in records)
              for label in PROTEIN_TYPE_LABELS}
    print(json.dumps({"train": len(train), "val": len(val),
                      "label_counts": counts, "out_dir": str(out_dir)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
