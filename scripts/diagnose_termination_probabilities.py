#!/usr/bin/env python3
"""Diagnose stop-token probability mass along generated contexts
(reference diagnose_termination_probabilities.py)."""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--dna", default="ATG")
    ap.add_argument("--n_steps", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.evals.playground import dna_to_context_ids, make_decoder
    from genomics_lm_tpu.generation.constrained import cds_token_ids, stop_token_ids
    from genomics_lm_tpu.generation.decode import sample_token

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    decoder, itos, stoi = make_decoder(run_dir)
    rng = np.random.default_rng(args.seed)
    ids = dna_to_context_ids(args.dna, stoi)
    stop_ids = stop_token_ids(stoi)
    allowed = cds_token_ids(itos)

    rows = []
    for step in range(args.n_steps):
        logits = decoder.next_logits(ids)
        probs = np.exp(logits - logits.max())
        probs /= probs.sum()
        rows.append({
            "step": step,
            "context_len": len(ids),
            "stop_mass": float(sum(probs[s] for s in stop_ids)),
            "top_token": itos[int(np.argmax(probs))],
            "top_prob": float(probs.max()),
        })
        masked = np.full_like(logits, -np.inf)
        masked[allowed] = logits[allowed]
        ids.append(sample_token(masked, 1.0, 0, rng))

    out = Path(args.out) if args.out else run_dir / "scores" / "termination_probabilities.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(rows, indent=2) + "\n")
    mass = [r["stop_mass"] for r in rows]
    print(json.dumps({"mean_stop_mass": float(np.mean(mass)),
                      "max_stop_mass": float(np.max(mass)),
                      "steps": len(rows)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
