#!/usr/bin/env python3
"""Convert MegaScale stability measurements into protein-LM JSONL
(reference prepare_stability_dataset.py — aa_seq/deltaG → stability splits)."""

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


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True, help="MegaScale CSV with aa_seq, deltaG")
    ap.add_argument("--out_dir", default="data/processed/stability")
    ap.add_argument("--threshold", type=float, default=3.0,
                    help="deltaG ≥ threshold → stable")
    ap.add_argument("--val_fraction", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    samples = []
    with open(args.csv) as f:
        for row in csv.DictReader(f):
            seq = row.get("aa_seq") or row.get("sequence")
            dg = row.get("deltaG") or row.get("delta_g")
            if not seq or dg in (None, "", "NaN"):
                continue
            try:
                dg = float(dg)
            except ValueError:
                continue
            samples.append({
                "sequence": seq,
                "stability_score": dg,
                "stability_label": "stable" if dg >= args.threshold else "unstable",
                "source": "MegaScale_Tsuboyama_2023",
            })
    if not samples:
        raise SystemExit("no usable rows — need aa_seq + deltaG columns")

    rng = random.Random(args.seed)
    rng.shuffle(samples)
    n_val = max(1, int(len(samples) * args.val_fraction))
    val, train = samples[:n_val], samples[n_val:]

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, split in (("stability_train.jsonl", train), ("stability_val.jsonl", val)):
        with (out_dir / name).open("w") as f:
            for s in split:
                f.write(json.dumps(s) + "\n")
    stable = sum(s["stability_label"] == "stable" for s in samples)
    print(json.dumps({"train": len(train), "val": len(val),
                      "stable_fraction": stable / len(samples),
                      "out_dir": str(out_dir)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
