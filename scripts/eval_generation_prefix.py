#!/usr/bin/env python3
"""Prefix-conditioned generation benchmark with quick/standard/full presets.

Parity: reference ``scripts/eval_generation_prefix.py`` — sample prefixes
from a held-out split, generate continuations under the constrained decoder,
and report termination/length/diversity statistics as JSON.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402

PRESETS = {
    "quick": {"n_prefixes": 8, "target_codons": 16, "hard_cap": 48, "attempts": 2},
    "standard": {"n_prefixes": 32, "target_codons": 32, "hard_cap": 96, "attempts": 3},
    "full": {"n_prefixes": 128, "target_codons": 64, "hard_cap": 192, "attempts": 5},
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--npz", required=True, help="held-out split for prefixes")
    ap.add_argument("--preset", choices=list(PRESETS), default="quick")
    ap.add_argument("--prefix_codons", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--termination_bias", type=float, default=0.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.data.datasets import PackedDataset
    from genomics_lm_tpu.evals.diversity import gc_content, pairwise_identity
    from genomics_lm_tpu.evals.playground import make_decoder, translate_codons_to_aa
    from genomics_lm_tpu.generation import constrained as gen

    preset = PRESETS[args.preset]
    run_dir = resolve_run_dir(args.run_id, args.run_root)
    decoder, itos, stoi = make_decoder(run_dir, args.checkpoint)
    rng = np.random.default_rng(args.seed)

    ds = PackedDataset(args.npz)
    rows = rng.choice(len(ds), min(preset["n_prefixes"], len(ds)), replace=False)
    x, _ = ds.fetch_batch(rows)

    results = []
    for row in x:
        # prefix = leading tokens up to prefix_codons codons
        ids, codons = [], 0
        for t in row:
            t = int(t)
            if t == 0:
                break
            ids.append(t)
            if len(itos[t]) == 3 and "<" not in itos[t]:
                codons += 1
            if codons >= args.prefix_codons:
                break
        out_ids, info = gen.generate_cds_red(
            decoder, ids, stoi, itos,
            target_codons=preset["target_codons"], hard_cap=preset["hard_cap"],
            max_attempts=preset["attempts"],
            termination_bias_enabled=args.termination_bias > 0,
            termination_stop_bias=args.termination_bias,
            rng=rng,
        )
        gen_codons = [itos[t] for t in out_ids[len(ids):]
                      if len(itos[t]) == 3 and "<" not in itos[t]]
        results.append({
            "prefix_len": len(ids),
            "generated_codons": info["generated_codons"],
            "had_terminal_stop": info["had_terminal_stop"],
            "attempts": info.get("attempts", 1),
            "hit_hard_cap": info["hit_hard_cap"],
            "codons": gen_codons,
        })

    aa_seqs = [translate_codons_to_aa(r["codons"]) for r in results]
    report = {
        "run_id": run_dir.name,
        "preset": args.preset,
        "n": len(results),
        "terminal_stop_rate": float(np.mean([r["had_terminal_stop"] for r in results])),
        "hard_cap_rate": float(np.mean([r["hit_hard_cap"] for r in results])),
        "mean_generated_codons": float(np.mean([r["generated_codons"] for r in results])),
        "mean_attempts": float(np.mean([r["attempts"] for r in results])),
        "pairwise_identity": pairwise_identity(aa_seqs, seed=args.seed),
        "mean_gc": float(np.mean(gc_content([r["codons"] for r in results]))),
    }
    out = Path(args.out) if args.out else run_dir / "scores" / "generation_prefix.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({"summary": report, "results": results}, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
