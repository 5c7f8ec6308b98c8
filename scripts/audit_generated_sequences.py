#!/usr/bin/env python3
"""Audit generated sequences vs training data (reference audit_generated_sequences)."""

from __future__ import annotations

import argparse
import csv
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def read_records(path: str, id_col: str, seq_col: str) -> list[dict]:
    rows = []
    with open(path) as f:
        for i, record in enumerate(csv.DictReader(f, delimiter="\t" if path.endswith(".tsv") else ",")):
            seq = record.get(seq_col) or record.get("sequence") or record.get("dna")
            if seq:
                rows.append({"source_id": record.get(id_col) or f"r{i}", "sequence": seq})
    return rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--training_csv", required=True)
    ap.add_argument("--generated_csv", required=True)
    ap.add_argument("--nucleotide_window", type=int, default=30)
    ap.add_argument("--protein_window", type=int, default=10)
    ap.add_argument("--out", default="outputs/audits/generated_audit.json")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.data.leakage import audit_generated_sequences

    training = read_records(args.training_csv, "id", "sequence")
    generated = read_records(args.generated_csv, "id", "dna")
    report = audit_generated_sequences(
        training, generated, Path(args.out),
        nucleotide_window=args.nucleotide_window,
        protein_window=args.protein_window,
    )
    print(json.dumps(report["summary"], indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
