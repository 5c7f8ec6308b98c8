#!/usr/bin/env python3
"""Full generative design loop: ReD → critic scoring → likelihood → report.

Parity: reference ``scripts/generative_design_loop.py`` — batch ReD
generation over prefixes, protein-critic (or EBM) scoring of candidates,
generator log-likelihood, diversity metrics, CSV + markdown report.
ESMFold submission is an opt-in network step in the reference and is
represented by the report's placeholder column here.
"""

from __future__ import annotations

import argparse
import csv
import json
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--critic_ckpt", default=None)
    ap.add_argument("--ebm_ckpt", default=None)
    ap.add_argument("--n_candidates", type=int, default=8)
    ap.add_argument("--prefix", default="ATG")
    ap.add_argument("--target_codons", type=int, default=24)
    ap.add_argument("--hard_cap", type=int, default=72)
    ap.add_argument("--budget", type=int, default=4000)
    ap.add_argument("--target_task", default="stability")
    ap.add_argument("--target_class", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.evals.diversity import kmer_diversity, pairwise_identity
    from genomics_lm_tpu.evals.playground import (
        dna_to_context_ids,
        make_decoder,
        score_sequence,
        translate_codons_to_aa,
    )
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

        payload = load_checkpoint(args.critic_ckpt)
        critic_params = jax.tree.map(jnp.asarray, payload["model"])
        ccfg_map = payload.get("cfg", {})
        critic_cfg = ProteinClassifierConfig(
            vocab_size=28,
            n_layer=int(ccfg_map.get("n_layer", 4)),
            n_head=int(ccfg_map.get("n_head", 4)),
            n_embd=int(ccfg_map.get("n_embd", 256)),
            block_size=int(ccfg_map.get("block_size", 512)),
            dropout=0.0,
            pooling=str(ccfg_map.get("pooling", "mean")),
        )
        ebm_params = None
        if args.ebm_ckpt:
            ebm_payload = load_checkpoint(args.ebm_ckpt)
            ebm_params = jax.tree.map(jnp.asarray, ebm_payload["model"])
        score_fn = make_score_fn(
            critic_params, critic_cfg, ProteinTokenizer(),
            target_task="ebm" if ebm_params is not None else args.target_task,
            target_class_idx=args.target_class,
            ebm_params=ebm_params,
        )

    ctx = dna_to_context_ids(args.prefix, stoi)
    contexts = [list(ctx) for _ in range(args.n_candidates)]
    solved, remaining, spent = gen.batch_red_sampler(
        decoder, contexts, stoi, itos,
        target_codons=args.target_codons, hard_cap=args.hard_cap,
        global_token_budget=args.budget, rng=rng,
    )

    rows = []
    for idx, (ids, info) in sorted(solved.items()):
        codons = [itos[t] for t in ids[len(ctx):]
                  if len(itos[t]) == 3 and "<" not in itos[t]]
        aa = translate_codons_to_aa(codons[:-1] if codons else [])
        likelihood = score_sequence(decoder, ids)
        critic_score = float(score_fn([aa])[0]) if score_fn and aa else None
        rows.append({
            "candidate": idx,
            "dna": "".join(codons),
            "protein": aa,
            "codons": len(codons),
            "round": info.get("round", 1),
            "mean_logprob": likelihood["mean_logprob"],
            "critic_score": critic_score,
            "esmfold_plddt": None,  # opt-in network step in the reference
        })

    aa_seqs = [r["protein"] for r in rows if r["protein"]]
    summary = {
        "solved": len(solved),
        "unsolved": len(remaining),
        "tokens_spent": spent,
        "pairwise_identity": pairwise_identity(aa_seqs, seed=args.seed),
        "kmer_diversity": kmer_diversity(aa_seqs) if aa_seqs else 0.0,
    }

    out_dir = Path(args.out_dir) if args.out_dir else run_dir / "scores" / "design_loop"
    out_dir.mkdir(parents=True, exist_ok=True)
    with (out_dir / "candidates.csv").open("w", newline="") as f:
        if rows:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=2) + "\n")
    md = ["# Generative design loop", "",
          f"- solved: {summary['solved']}/{args.n_candidates}",
          f"- tokens spent: {summary['tokens_spent']}",
          f"- pairwise identity: {summary['pairwise_identity']:.3f}",
          f"- k-mer diversity: {summary['kmer_diversity']:.4f}", "",
          "| candidate | codons | mean logP | critic |", "|---|---|---|---|"]
    for r in rows:
        critic = f"{r['critic_score']:.3f}" if r["critic_score"] is not None else "-"
        md.append(f"| {r['candidate']} | {r['codons']} | {r['mean_logprob']:.3f} | {critic} |")
    (out_dir / "report.md").write_text("\n".join(md) + "\n")
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
