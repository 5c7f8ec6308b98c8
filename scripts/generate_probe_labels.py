#!/usr/bin/env python3
"""Generate biology-aware probe labels for codon tokens
(reference generate_probe_labels.py — runs/<id>/probe_labels.csv consumed by
the linear-probe interpretability step)."""

from __future__ import annotations

import argparse
import csv
import json
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402

HYDROPHOBIC = set("AVLIMFWPC")
CHARGED = set("DEKRH")
POLAR = set("STYNQG")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.generation.genetic_code import AA_TO_CODONS, CODON_TABLE

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    itos_path = run_dir / "itos.txt"
    if not itos_path.exists():
        raise SystemExit(f"{itos_path} not found")
    itos = itos_path.read_text().splitlines()

    degeneracy = {
        codon: len(AA_TO_CODONS[aa])
        for aa, codons in AA_TO_CODONS.items()
        for codon in codons
    }
    stop_codons = {c for c, aa in CODON_TABLE.items() if aa in ("_", "*")}
    rows = []
    for idx, tok in enumerate(itos):
        is_codon = len(tok) == 3 and "<" not in tok
        aa = CODON_TABLE.get(tok, "") if is_codon else ""
        if tok in stop_codons:
            aa_class = "stop"
        elif aa in HYDROPHOBIC:
            aa_class = "hydrophobic"
        elif aa in CHARGED:
            aa_class = "charged"
        elif aa in POLAR:
            aa_class = "polar"
        else:
            aa_class = "special"
        rows.append({
            "token_id": idx,
            "token": tok,
            "is_codon": int(is_codon),
            "amino_acid": aa,
            "aa_class": aa_class,
            "gc_content": (sum(c in "GC" for c in tok) / 3 if is_codon else ""),
            "is_start": int(tok == "ATG"),
            "is_stop": int(tok in stop_codons),
            "degeneracy": degeneracy.get(tok, ""),
            "wobble_base": tok[2] if is_codon else "",
        })

    out = run_dir / "probe_labels.csv"
    with out.open("w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    print(json.dumps({"tokens": len(rows), "out": str(out)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
