#!/usr/bin/env python3
"""Structured ablation sweep over decoding configurations
(reference run_ablation_sweep.py — unguided vs EBM/critic-guided crossed
with no-bias vs ReD stop-bias decoding, metrics per cell)."""

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
    ap.add_argument("--critic_ckpt", default=None)
    ap.add_argument("--n_samples", type=int, default=4)
    ap.add_argument("--target_codons", type=int, default=16)
    ap.add_argument("--hard_cap", type=int, default=48)
    ap.add_argument("--stop_bias", type=float, default=2.0)
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.evals.playground import (
        dna_to_context_ids,
        make_decoder,
        translate_codons_to_aa,
    )
    from genomics_lm_tpu.generation import constrained as gen

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    decoder, itos, stoi = make_decoder(run_dir)
    ctx = dna_to_context_ids("ATG", stoi)

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

    configs = []
    for guided in ([False, True] if score_fn else [False]):
        for red_bias in (False, True):
            configs.append({"critic_guided": guided, "red_stop_bias": red_bias})

    results = []
    for config in configs:
        rng = np.random.default_rng(args.seed)
        stops, lengths, codon_rows = [], [], []
        t0 = time.time()
        for _ in range(args.n_samples):
            if config["critic_guided"]:
                out_ids, info = gen.generate_cds_critic_guided(
                    decoder, score_fn, ctx, stoi, itos,
                    target_codons=args.target_codons, hard_cap=args.hard_cap,
                    alpha=args.alpha, rng=rng,
                )
            elif config["red_stop_bias"]:
                out_ids, info = gen.generate_cds_red(
                    decoder, ctx, stoi, itos,
                    target_codons=args.target_codons, hard_cap=args.hard_cap,
                    termination_bias_enabled=True,
                    termination_stop_bias=args.stop_bias,
                    rng=rng,
                )
            else:
                out_ids, info = gen.generate_cds_constrained(
                    decoder, ctx, stoi, itos,
                    target_codons=args.target_codons, hard_cap=args.hard_cap,
                    rng=rng,
                )
            stops.append(bool(info["had_terminal_stop"]))
            lengths.append(int(info["generated_codons"]))
            codon_rows.append([itos[t] for t in out_ids[len(ctx):]
                               if len(itos[t]) == 3 and "<" not in itos[t]])
        wall = time.time() - t0
        aa = [translate_codons_to_aa(c).rstrip("_*") for c in codon_rows]
        results.append({
            **config,
            "terminal_stop_rate": float(np.mean(stops)) if stops else None,
            "mean_codons": float(np.mean(lengths)) if lengths else None,
            "mean_protein_len": float(np.mean([len(a) for a in aa])) if aa else None,
            "wall_sec": round(wall, 3),
        })

    out = Path(args.out) if args.out else run_dir / "scores" / "ablation_sweep.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
