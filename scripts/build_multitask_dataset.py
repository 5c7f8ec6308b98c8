#!/usr/bin/env python3
"""Merge UniProt metadata and stability data into a unified multitask JSONL
(reference build_multitask_dataset.py — the protein-critic training set)."""

from __future__ import annotations

import argparse
import json
import random
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def read_jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--protein_jsonl", required=True,
                    help="protein_lm_data_preparer output (func/topo labels)")
    ap.add_argument("--stability_jsonl", default=None,
                    help="prepare_stability_dataset output")
    ap.add_argument("--protein_type_jsonl", default=None,
                    help="prepare_protein_type_dataset output")
    ap.add_argument("--out_dir", default="data/processed/multitask")
    ap.add_argument("--val_fraction", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    by_seq: dict[str, dict] = {}
    for record in read_jsonl(args.protein_jsonl):
        entry = by_seq.setdefault(record["sequence"], {"sequence": record["sequence"]})
        if "func_label" in record:
            entry["function"] = record["func_label"]
        if "topo_label" in record:
            entry["topology"] = record["topo_label"]
        if "entry" in record:
            entry.setdefault("entry", record["entry"])
    if args.stability_jsonl:
        for record in read_jsonl(args.stability_jsonl):
            entry = by_seq.setdefault(record["sequence"],
                                      {"sequence": record["sequence"]})
            entry["stability"] = record.get("stability_label")
            entry["stability_score"] = record.get("stability_score")
    if args.protein_type_jsonl:
        for record in read_jsonl(args.protein_type_jsonl):
            entry = by_seq.setdefault(record["sequence"],
                                      {"sequence": record["sequence"]})
            entry["protein_type"] = record.get("protein_type")

    merged = list(by_seq.values())
    if not merged:
        raise SystemExit("nothing to merge")
    rng = random.Random(args.seed)
    rng.shuffle(merged)
    n_val = max(1, int(len(merged) * args.val_fraction))
    val, train = merged[:n_val], merged[n_val:]

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, split in (("multitask_train.jsonl", train),
                        ("multitask_val.jsonl", val)):
        with (out_dir / name).open("w") as f:
            for r in split:
                f.write(json.dumps(r) + "\n")
    tasks = {
        task: sum(task in r for r in merged)
        for task in ("function", "topology", "stability", "protein_type")
    }
    print(json.dumps({"train": len(train), "val": len(val),
                      "task_coverage": tasks, "out_dir": str(out_dir)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
