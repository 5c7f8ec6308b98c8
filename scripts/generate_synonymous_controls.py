#!/usr/bin/env python3
"""Generate synonymous control sequences (reference generate_synonymous_controls).

For each input CDS: a codon-shuffled control (same codon multiset) and a
synonymous recode (same protein, random synonymous codons) — the sequence
controls used by the intrinsic evaluation suite.
"""

from __future__ import annotations

import argparse
import csv
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="CDS DNA lines, FASTA, or CSV")
    ap.add_argument("--out", required=True, help="output TSV")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.generation.genetic_code import AA_TO_CODONS, CODON_TABLE

    rng = np.random.default_rng(args.seed)
    text = Path(args.input).read_text()
    named = None
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
    elif "," in text.splitlines()[0] or "\t" in text.splitlines()[0]:
        delim = "\t" if "\t" in text.splitlines()[0] else ","
        named, seqs = [], []
        for j, record in enumerate(csv.DictReader(text.splitlines(), delimiter=delim)):
            seq = next(
                (record[k] for k in ("dna", "sequence", "cds") if record.get(k)), None
            )
            if seq:
                named.append(record.get("id") or f"seq{j}")
                seqs.append(seq)
    else:
        seqs = [l.strip() for l in text.splitlines() if l.strip()]

    rows, skipped = [], 0
    for i, dna in enumerate(seqs):
        dna = dna.upper().replace("U", "T")
        if not dna or set(dna) - set("ACGTN"):
            skipped += 1
            continue
        L = (len(dna) // 3) * 3
        codons = [dna[j : j + 3] for j in range(0, L, 3)]
        if not codons:
            continue
        # codon shuffle: permute interior codons, keep start/stop in place
        interior = codons[1:-1]
        perm = list(interior)
        rng.shuffle(perm)
        shuffled = [codons[0], *perm, codons[-1]] if len(codons) > 2 else list(codons)
        # synonymous recode: random codon with the same amino acid
        recoded = []
        for codon in codons:
            aa = CODON_TABLE.get(codon)
            options = AA_TO_CODONS.get(aa, [codon]) if aa else [codon]
            recoded.append(str(rng.choice(options)))
        rows.append({
            "id": named[i] if named else f"seq{i}",
            "original": "".join(codons),
            "codon_shuffle": "".join(shuffled),
            "synonymous_recode": "".join(recoded),
        })

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("w", newline="") as f:
        writer = csv.DictWriter(
            f, fieldnames=["id", "original", "codon_shuffle", "synonymous_recode"],
            delimiter="\t",
        )
        writer.writeheader()
        writer.writerows(rows)
    suffix = f" (skipped {skipped} non-DNA entries)" if skipped else ""
    print(f"[controls] wrote {len(rows)} control triples → {out}{suffix}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
