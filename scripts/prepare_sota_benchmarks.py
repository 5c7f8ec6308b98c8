#!/usr/bin/env python3
"""Prepare synthetic benchmark datasets for the SOTA evaluation tracks
(reference prepare_sota_benchmarks.py — self-contained protein-DMS, rRNA-DMS,
promoter-expression, and gene-essentiality CSVs when the real public data is
not on disk)."""

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
    ap.add_argument("--out_dir", default="data/benchmarks")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n_mutations", type=int, default=200)
    ap.add_argument("--n_genes", type=int, default=60)
    args = ap.parse_args(argv)

    import numpy as np

    rng = np.random.default_rng(args.seed)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = {}

    # 1. protein DMS: positionwise single-codon mutations with a synthetic
    # fitness that penalizes early-position and charged-residue swaps
    wt = "ATG" + "".join(rng.choice(list("ACGT"), 150))
    wt = wt[: 3 * (len(wt) // 3)]
    rows = []
    for _ in range(args.n_mutations):
        pos = int(rng.integers(1, len(wt) // 3))
        mutant = "".join(rng.choice(list("ACGT"), 3))
        fitness = float(-abs(rng.normal()) * (1.0 + 2.0 / (1 + pos)))
        rows.append({"position": pos, "mut_codon": mutant, "fitness": fitness})
    with (out_dir / "protein_dms.csv").open("w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["position", "mut_codon", "fitness"])
        writer.writeheader()
        writer.writerows(rows)
    (out_dir / "protein_dms_wt.txt").write_text(wt + "\n")
    written["protein_dms"] = len(rows)

    # 2. rRNA DMS (same schema, shorter molecule)
    rrna_wt = "".join(rng.choice(list("ACGT"), 120))
    rows = [{"position": int(rng.integers(1, len(rrna_wt) // 3)),
             "mut_codon": "".join(rng.choice(list("ACGT"), 3)),
             "fitness": float(-abs(rng.normal()))}
            for _ in range(args.n_mutations // 2)]
    with (out_dir / "rrna_dms.csv").open("w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["position", "mut_codon", "fitness"])
        writer.writeheader()
        writer.writerows(rows)
    (out_dir / "rrna_dms_wt.txt").write_text(rrna_wt + "\n")
    written["rrna_dms"] = len(rows)

    # 3. promoter/RBS expression: GC-correlated synthetic expression
    rows = []
    for i in range(args.n_genes):
        seq = "".join(rng.choice(list("ACGT"), 60))
        gc = sum(c in "GC" for c in seq) / len(seq)
        rows.append({"id": f"prom{i}", "sequence": seq,
                     "expression": float(3.0 * gc + rng.normal(0, 0.3))})
    with (out_dir / "kosuri_promoters.csv").open("w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["id", "sequence", "expression"])
        writer.writeheader()
        writer.writerows(rows)
    written["kosuri_promoters"] = len(rows)

    # 4/5. gene essentiality (lambda + pseudomonas): label correlates with
    # start-proximal codon usage bias in the synthetic generator
    for name in ("lambda_essentiality", "pseudomonas_essentiality"):
        rows = []
        for i in range(args.n_genes):
            essential = int(rng.random() < 0.4)
            bias = "ATGAAA" if essential else "ATG"
            body = "".join(rng.choice(list("ACGT"), 120))
            rows.append({"gene": f"{name[:4]}_{i}",
                         "sequence": bias + body[: 120 - len(bias) + 3],
                         "essential": essential})
        with (out_dir / f"{name}.csv").open("w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["gene", "sequence", "essential"])
            writer.writeheader()
            writer.writerows(rows)
        written[name] = len(rows)

    print(json.dumps({"out_dir": str(out_dir), "datasets": written,
                      "note": "synthetic placeholders — swap in the published "
                              "datasets for real SOTA numbers"}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
