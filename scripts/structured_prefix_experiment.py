#!/usr/bin/env python3
"""Structured-prefix generation experiment
(reference structured_prefix_experiment.py — continuations from known
structured bacterial protein prefixes, critic-scored, CSV/Markdown outputs;
ESMFold submission stays optional because it needs network access)."""

from __future__ import annotations

import argparse
import csv
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402

# DNA prefixes encoding the N-termini of well-structured bacterial folds
STRUCTURED_PREFIXES = {
    "tim_barrel_like": "ATGAAAGCACTGGTTCTGGGC",
    "rossmann_like": "ATGAAAATTGGTATCGACGGT",
    "beta_barrel_like": "ATGAAAAAACTGACCCTGGCA",
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--critic_ckpt", default=None)
    ap.add_argument("--n_per_prefix", type=int, default=4)
    ap.add_argument("--target_codons", type=int, default=32)
    ap.add_argument("--hard_cap", type=int, default=96)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out_dir", default="outputs/structured_prefix")
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.evals.playground import (
        dna_to_context_ids,
        make_decoder,
        translate_codons_to_aa,
    )
    from genomics_lm_tpu.evals.termination_motifs import gc_fraction
    from genomics_lm_tpu.generation import constrained as gen

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    decoder, itos, stoi = make_decoder(run_dir)
    rng = np.random.default_rng(args.seed)

    score_fn = None
    if args.critic_ckpt:
        import jax
        import jax.numpy as jnp

        from genomics_lm_tpu.models.protein import ProteinClassifierConfig
        from genomics_lm_tpu.protein.critic_scoring import make_score_fn
        from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer
        from genomics_lm_tpu.training.checkpoints import load_checkpoint

        tokenizer = ProteinTokenizer()
        payload = load_checkpoint(args.critic_ckpt)
        ccfg = payload.get("cfg", {})
        critic_cfg = ProteinClassifierConfig(
            vocab_size=len(tokenizer),
            n_layer=int(ccfg.get("n_layer", 4)),
            n_head=int(ccfg.get("n_head", 4)),
            n_embd=int(ccfg.get("n_embd", 256)),
            block_size=int(ccfg.get("block_size", 512)),
            dropout=0.0, pooling=str(ccfg.get("pooling", "attention")),
        )
        score_fn = make_score_fn(
            jax.tree.map(jnp.asarray, payload["model"]), critic_cfg, tokenizer
        )

    rows = []
    for name, prefix in STRUCTURED_PREFIXES.items():
        ctx = dna_to_context_ids(prefix, stoi)
        for sample in range(args.n_per_prefix):
            out_ids, info = gen.generate_cds_red(
                decoder, ctx, stoi, itos,
                target_codons=args.target_codons, hard_cap=args.hard_cap,
                rng=rng,
            )
            codons = [itos[t] for t in out_ids[len(ctx):]
                      if len(itos[t]) == 3 and "<" not in itos[t]]
            dna = prefix + "".join(codons)
            protein = translate_codons_to_aa(
                [prefix[i : i + 3] for i in range(0, len(prefix), 3)] + codons
            ).rstrip("_*")
            row = {
                "prefix": name,
                "sample": sample,
                "dna": dna,
                "protein": protein,
                "protein_len": len(protein),
                "gc": round(gc_fraction(dna), 4),
                "had_terminal_stop": bool(info["had_terminal_stop"]),
            }
            if score_fn and protein:
                row["critic_score"] = float(np.asarray(score_fn([protein]))[0])
            rows.append(row)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with (out_dir / "structured_prefix_candidates.csv").open("w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()) if rows else ["prefix"])
        writer.writeheader()
        writer.writerows(rows)

    md = ["# Structured-prefix generation", ""]
    for name in STRUCTURED_PREFIXES:
        subset = [r for r in rows if r["prefix"] == name]
        stop_rate = sum(r["had_terminal_stop"] for r in subset) / max(len(subset), 1)
        md.append(f"## {name}")
        md.append(f"- samples: {len(subset)}")
        md.append(f"- terminal stop rate: {stop_rate:.2f}")
        if subset and "critic_score" in subset[0]:
            best = max(subset, key=lambda r: r.get("critic_score") or -1e9)
            md.append(f"- best critic score: {best['critic_score']:.4f} "
                      f"(sample {best['sample']})")
        md.append("")
    md.append("_ESMFold submission requires network access — see "
              "scripts/submit_esmfold_from_csv.py._")
    (out_dir / "structured_prefix_report.md").write_text("\n".join(md) + "\n")

    print(json.dumps({"candidates": len(rows), "out_dir": str(out_dir)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
