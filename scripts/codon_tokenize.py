#!/usr/bin/env python3
"""Codon tokenization CLI (reference src/codonlm/codon_tokenize.py main).

CDS-DNA lines → id lines + vocab/itos files + fragment-provenance TSV.
"""

from __future__ import annotations

import argparse

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inp", default="data/processed/cds_dna.txt")
    ap.add_argument("--out_ids", default="data/processed/codon_ids.txt")
    ap.add_argument("--out_vocab", default="data/processed/vocab_codon.txt")
    ap.add_argument("--out_itos", default="data/processed/itos_codon.txt")
    ap.add_argument("--out_fragments", default=None)
    ap.add_argument("--min_fragment_codons", type=int, default=10)
    ap.add_argument("--termination", choices=["eos", "sep", "none"], default="eos")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.tokenizers.codon import VOCAB, tokenize_file

    stats = tokenize_file(
        args.inp, args.out_ids, args.out_vocab, args.out_itos,
        args.out_fragments,
        min_fragment_codons=args.min_fragment_codons,
        termination=args.termination,
    )
    print(
        f"[tokenize] wrote {stats['retained_fragments']} fragments → {args.out_ids} "
        f"| stats {stats} | vocab size {len(VOCAB)} | itos {args.out_itos}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
