#!/usr/bin/env python3
"""Per-position Δlog-P mutation scoring CLI (reference score_mutations.py)."""

from __future__ import annotations

import argparse
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def read_dna(arg: str) -> str:
    path = Path(arg)
    if path.exists():
        text = path.read_text()
        if text.lstrip().startswith(">"):
            return "".join(
                line.strip() for line in text.splitlines() if not line.startswith(">")
            )
        return "".join(text.split())
    return arg


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--dna", required=True, help="DNA string or file (raw/FASTA)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.evals.mutations import score_mutations, write_mutation_tsv
    from genomics_lm_tpu.evals.playground import load_codon_model

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    params, cfg, _, _ = load_codon_model(run_dir, args.checkpoint)
    rows = score_mutations(params, cfg.replace(dropout=0.0), read_dna(args.dna))
    out = Path(args.out) if args.out else run_dir / "scores" / "mutation_scores.tsv"
    write_mutation_tsv(rows, out)
    print(f"[mutations] wrote {len(rows)} positions → {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
