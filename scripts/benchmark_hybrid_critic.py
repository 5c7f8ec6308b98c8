#!/usr/bin/env python3
"""Benchmark hybrid DNA→protein critic-guided generation
(reference benchmark_hybrid_critic.py — sweep guidance strength alpha and
compare critic scores, EBM energy, ORF validity, and wall-clock speed)."""

from __future__ import annotations

import argparse
import json
import sys as _sys
import time
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402

STOP_CODONS = {"TAA", "TAG", "TGA"}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--critic_ckpt", required=True)
    ap.add_argument("--ebm_ckpt", default=None)
    ap.add_argument("--alphas", default="0,0.5,1.0")
    ap.add_argument("--n_samples", type=int, default=4)
    ap.add_argument("--target_codons", type=int, default=16)
    ap.add_argument("--hard_cap", type=int, default=48)
    ap.add_argument("--target_task", default="stability")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="outputs/benchmarks/hybrid_critic.json")
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from genomics_lm_tpu.evals.playground import (
        dna_to_context_ids,
        make_decoder,
        translate_codons_to_aa,
    )
    from genomics_lm_tpu.generation import constrained as gen
    from genomics_lm_tpu.models.protein import ProteinClassifierConfig, ebm_energy
    from genomics_lm_tpu.protein.critic_scoring import make_score_fn
    from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer
    from genomics_lm_tpu.training.checkpoints import load_checkpoint

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    decoder, itos, stoi = make_decoder(run_dir)

    tokenizer = ProteinTokenizer()
    payload = load_checkpoint(args.critic_ckpt)
    ccfg = payload.get("cfg", {})
    critic_cfg = ProteinClassifierConfig(
        vocab_size=len(tokenizer),
        n_layer=int(ccfg.get("n_layer", 4)), n_head=int(ccfg.get("n_head", 4)),
        n_embd=int(ccfg.get("n_embd", 256)),
        block_size=int(ccfg.get("block_size", 512)),
        dropout=0.0, pooling=str(ccfg.get("pooling", "attention")),
    )
    critic_params = jax.tree.map(jnp.asarray, payload["model"])
    ebm_params = None
    if args.ebm_ckpt:
        ebm_params = jax.tree.map(
            jnp.asarray, load_checkpoint(args.ebm_ckpt)["model"]
        )
    score_fn = make_score_fn(critic_params, critic_cfg, tokenizer,
                             target_task=args.target_task,
                             ebm_params=ebm_params)

    ctx = dna_to_context_ids("ATG", stoi)
    results = []
    for alpha in (float(a) for a in args.alphas.split(",")):
        rng = np.random.default_rng(args.seed)
        scores, energies, orf_ok, lengths = [], [], [], []
        t0 = time.time()
        for _ in range(args.n_samples):
            if alpha > 0:
                out_ids, info = gen.generate_cds_critic_guided(
                    decoder, score_fn, ctx, stoi, itos,
                    target_codons=args.target_codons, hard_cap=args.hard_cap,
                    alpha=alpha, rng=rng,
                )
            else:
                out_ids, info = gen.generate_cds_constrained(
                    decoder, ctx, stoi, itos,
                    target_codons=args.target_codons, hard_cap=args.hard_cap,
                    rng=rng,
                )
            codons = [itos[t] for t in out_ids[len(ctx):]
                      if len(itos[t]) == 3 and "<" not in itos[t]]
            protein = translate_codons_to_aa(codons).rstrip("_*")
            lengths.append(len(codons))
            orf_ok.append(bool(codons) and codons[-1] in STOP_CODONS
                          and not any(c in STOP_CODONS for c in codons[:-1]))
            if protein:
                scores.append(float(np.asarray(score_fn([protein]))[0]))
                if ebm_params is not None:
                    from genomics_lm_tpu.models.protein import extract_latent

                    ids = [tokenizer.bos_token_id] + tokenizer.encode_sequence(
                        protein
                    ) + [tokenizer.eos_token_id]
                    z = extract_latent(
                        critic_params, critic_cfg,
                        jnp.asarray([ids], jnp.int32),
                        jnp.ones((1, len(ids)), jnp.int32),
                    )
                    energies.append(float(ebm_energy(ebm_params, z)[0]))
        wall = time.time() - t0
        results.append({
            "alpha": alpha,
            "mean_critic_score": float(np.mean(scores)) if scores else None,
            "mean_ebm_energy": float(np.mean(energies)) if energies else None,
            "orf_valid_rate": float(np.mean(orf_ok)) if orf_ok else None,
            "mean_codons": float(np.mean(lengths)) if lengths else None,
            "wall_sec": round(wall, 3),
            "samples_per_sec": round(args.n_samples / wall, 3) if wall else None,
        })

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
