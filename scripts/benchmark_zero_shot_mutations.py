#!/usr/bin/env python3
"""Zero-shot mutation-effect benchmark (DMS correlation).

Parity: reference ``scripts/benchmark_zero_shot_mutations.py`` — score each
assayed variant by the model's Δlog-P vs wild type and report Spearman/
Pearson correlation against measured fitness. Input CSV columns:
``position`` (0-based codon), ``mutant_codon`` (or ``wt_codon``+``mutant``),
``fitness``.
"""

from __future__ import annotations

import argparse
import csv
import json
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--dna", required=True, help="wild-type CDS (string or file)")
    ap.add_argument("--dms_csv", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np
    from scipy import stats

    from genomics_lm_tpu.evals.mutations import score_mutations
    from genomics_lm_tpu.evals.playground import load_codon_model
    from scripts.score_mutations import read_dna

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    params, cfg, _, _ = load_codon_model(run_dir)
    rows = score_mutations(params, cfg.replace(dropout=0.0), read_dna(args.dna))
    by_position = {r["position"]: r for r in rows}

    predicted, measured, skipped = [], [], 0
    with open(args.dms_csv) as f:
        for record in csv.DictReader(f):
            position = int(record["position"])
            mutant = (record.get("mutant_codon") or record.get("mut_codon")
                      or record.get("mutant", "")).upper()
            if position not in by_position or f"delta_{mutant}" not in by_position[position]:
                skipped += 1
                continue
            predicted.append(by_position[position][f"delta_{mutant}"])
            measured.append(float(record["fitness"]))

    if len(predicted) < 3:
        raise SystemExit(f"too few scoreable variants ({len(predicted)}; skipped {skipped})")
    spearman = stats.spearmanr(predicted, measured)
    pearson = stats.pearsonr(predicted, measured)
    report = {
        "n_variants": len(predicted),
        "skipped": skipped,
        "spearman_rho": float(spearman.statistic),
        "spearman_p": float(spearman.pvalue),
        "pearson_r": float(pearson.statistic),
    }
    out = Path(args.out) if args.out else run_dir / "scores" / "dms_benchmark.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
