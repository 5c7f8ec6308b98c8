#!/usr/bin/env python3
"""UniProt bacterial TSV → protein-LM JSONL splits
(reference protein_lm_data_preparer.py — func/topo labels from EC number
and membrane keywords)."""

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

MEMBRANE_MARKERS = ("membrane", "transmembrane")
VALID_AA = set("ACDEFGHIKLMNPQRSTVWY")


def func_label(ec_number: str) -> str:
    return "ENZYME" if (ec_number or "").strip() else "NON_ENZYME"


def topo_label(keywords: str, location: str) -> str:
    text = f"{keywords or ''} {location or ''}".lower()
    return "TM" if any(m in text for m in MEMBRANE_MARKERS) else "GLOBULAR"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tsv", required=True,
                    help="UniProt TSV with Entry/Sequence/EC number/Keywords")
    ap.add_argument("--out_dir", default="data/processed/protein_lm")
    ap.add_argument("--min_len", type=int, default=50)
    ap.add_argument("--max_len", type=int, default=512)
    ap.add_argument("--val_fraction", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    def col(row, *names):
        for name in names:
            for key in row:
                if key.lower() == name.lower():
                    return row[key]
        return ""

    records, dropped = [], 0
    with open(args.tsv) as f:
        for row in csv.DictReader(f, delimiter="\t"):
            seq = (col(row, "Sequence") or "").strip().upper()
            if (not seq or len(seq) < args.min_len or len(seq) > args.max_len
                    or set(seq) - VALID_AA):
                dropped += 1
                continue
            records.append({
                "sequence": seq,
                "func_label": func_label(col(row, "EC number", "ec_number")),
                "topo_label": topo_label(col(row, "Keywords"),
                                         col(row, "Subcellular location [CC]",
                                             "Subcellular location")),
                "entry": col(row, "Entry", "entry"),
                "organism": col(row, "Organism", "organism"),
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
    for name, split in (("train.jsonl", train), ("val.jsonl", val),
                        ("train_classified.jsonl", train),
                        ("val_classified.jsonl", val)):
        with (out_dir / name).open("w") as f:
            for r in split:
                f.write(json.dumps(r) + "\n")

    enzymes = sum(r["func_label"] == "ENZYME" for r in records)
    tm = sum(r["topo_label"] == "TM" for r in records)
    print(json.dumps({
        "train": len(train), "val": len(val), "dropped": dropped,
        "enzyme_fraction": enzymes / len(records),
        "tm_fraction": tm / len(records),
        "out_dir": str(out_dir),
    }, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
