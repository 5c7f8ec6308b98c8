#!/usr/bin/env python3
"""Simple multinomial sampling CLI (reference src/codonlm/sample.py)."""

from __future__ import annotations

import argparse

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--dna", default="ATG")
    ap.add_argument("--max_new_tokens", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--topk", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.evals.playground import dna_to_context_ids, make_decoder
    from genomics_lm_tpu.generation.constrained import generate_model_raw

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    decoder, itos, stoi = make_decoder(run_dir)
    ids = dna_to_context_ids(args.dna, stoi)
    out_ids, info = generate_model_raw(
        decoder, ids, stoi, itos, args.max_new_tokens,
        temperature=args.temperature, topk=args.topk,
        rng=np.random.default_rng(args.seed),
    )
    dna = "".join(itos[t] for t in out_ids if len(itos[t]) == 3 and "<" not in itos[t])
    print(dna)
    print(f"[sample] stop_reason={info['stop_reason']} codons={info['generated_codons']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
