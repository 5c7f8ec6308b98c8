#!/usr/bin/env python3
"""Termination-bias decoding ablation (reference run_decoding_termination_ablation).

Sweep termination stop-bias strengths and report terminal-stop rates /
length statistics per setting.
"""

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
    ap.add_argument("--biases", default="0,1,2,4")
    ap.add_argument("--n_samples", type=int, default=16)
    ap.add_argument("--target_codons", type=int, default=24)
    ap.add_argument("--hard_cap", type=int, default=72)
    ap.add_argument("--bias_window", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.evals.playground import dna_to_context_ids, make_decoder
    from genomics_lm_tpu.generation import constrained as gen

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    decoder, itos, stoi = make_decoder(run_dir)
    ctx = dna_to_context_ids("ATG", stoi)

    rows = []
    for bias in (float(b) for b in args.biases.split(",")):
        rng = np.random.default_rng(args.seed)
        infos = [
            gen.generate_cds_constrained(
                decoder, ctx, stoi, itos,
                target_codons=args.target_codons, hard_cap=args.hard_cap,
                require_terminal_stop=True,
                termination_bias_enabled=bias > 0,
                termination_stop_bias=bias,
                termination_bias_window=args.bias_window,
                rng=rng,
            )[1]
            for _ in range(args.n_samples)
        ]
        rows.append({
            "stop_bias": bias,
            "terminal_stop_rate": float(np.mean([i["had_terminal_stop"] for i in infos])),
            "hard_cap_rate": float(np.mean([i["hit_hard_cap"] for i in infos])),
            "mean_codons": float(np.mean([i["generated_codons"] for i in infos])),
            "mean_bias_steps": float(np.mean([i["termination_bias_steps"] for i in infos])),
        })
    out = Path(args.out) if args.out else run_dir / "scores" / "termination_ablation.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(rows, indent=2) + "\n")
    print(json.dumps(rows, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
