#!/usr/bin/env python3
"""Build organism reference tables from CDS sequences
(reference build_reference_tables.py — codon_usage.tsv + cai_weights.tsv)."""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True, help="reference set name, e.g. ecoli_k12")
    ap.add_argument("--cds", required=True, help="one DNA sequence per line / FASTA")
    ap.add_argument("--out_root", default="data/reference")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.generation.genetic_code import AA_TO_CODONS, CODON_TABLE

    text = Path(args.cds).read_text()
    if text.lstrip().startswith(">"):
        seqs, parts = [], []
        for line in text.splitlines():
            if line.startswith(">"):
                if parts:
                    seqs.append("".join(parts))
                    parts = []
            else:
                parts.append(line.strip())
        if parts:
            seqs.append("".join(parts))
    else:
        seqs = [l.strip() for l in text.splitlines() if l.strip()]

    counts: dict[str, int] = {c: 0 for c in CODON_TABLE}
    for dna in seqs:
        dna = dna.upper().replace("U", "T")
        for i in range(0, (len(dna) // 3) * 3, 3):
            codon = dna[i : i + 3]
            if codon in counts:
                counts[codon] += 1
    total = sum(counts.values())

    # CAI relative adaptiveness: w = freq / max freq within the AA family
    cai: dict[str, float] = {}
    for codons in AA_TO_CODONS.values():
        family_max = max(counts[c] for c in codons)
        for c in codons:
            cai[c] = counts[c] / family_max if family_max else 0.0

    out_dir = Path(args.out_root) / args.name
    out_dir.mkdir(parents=True, exist_ok=True)
    with (out_dir / "codon_usage.tsv").open("w") as f:
        f.write("codon\tfreq\n")
        for codon in sorted(counts):
            f.write(f"{codon}\t{counts[codon] / max(total, 1):.6f}\n")
    with (out_dir / "cai_weights.tsv").open("w") as f:
        f.write("codon\tw\n")
        for codon in sorted(cai):
            f.write(f"{codon}\t{cai[codon]:.6f}\n")
    print(json.dumps({"name": args.name, "sequences": len(seqs),
                      "codons": total, "out_dir": str(out_dir)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
