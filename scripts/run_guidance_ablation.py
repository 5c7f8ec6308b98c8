#!/usr/bin/env python3
"""Guidance-component ablation (reference run_guidance_ablation.py).

Compare unguided / termination-biased / offset-prior / critic-guided
generation under the same budget.
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
    ap.add_argument("--critic_ckpt", default=None)
    ap.add_argument("--n_samples", type=int, default=12)
    ap.add_argument("--target_codons", type=int, default=24)
    ap.add_argument("--hard_cap", type=int, default=72)
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

    variants = {
        "unguided": {},
        "termination_bias": {
            "termination_bias_enabled": True,
            "termination_stop_bias": 2.0,
            "termination_bias_window": 8,
        },
    }
    if decoder.cfg.multi_offset_targets:
        variants["offset_priors"] = {
            "multi_offset_prior_enabled": True,
            "multi_offset_prior_weights": {
                o: 0.25 for o in decoder.cfg.multi_offset_targets
            },
        }

    report = {}
    for name, kwargs in variants.items():
        rng = np.random.default_rng(args.seed)
        infos = [
            gen.generate_cds_constrained(
                decoder, ctx, stoi, itos,
                target_codons=args.target_codons, hard_cap=args.hard_cap,
                require_terminal_stop=True, rng=rng, **kwargs,
            )[1]
            for _ in range(args.n_samples)
        ]
        report[name] = {
            "terminal_stop_rate": float(np.mean([i["had_terminal_stop"] for i in infos])),
            "mean_codons": float(np.mean([i["generated_codons"] for i in infos])),
            "mean_tokens": float(np.mean([i["generated_tokens"] for i in infos])),
        }

    if args.critic_ckpt:
        import jax
        import jax.numpy as jnp

        from genomics_lm_tpu.models.protein import ProteinClassifierConfig
        from genomics_lm_tpu.protein.critic_scoring import make_score_fn
        from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer
        from genomics_lm_tpu.training.checkpoints import load_checkpoint

        payload = load_checkpoint(args.critic_ckpt)
        ccfg = payload.get("cfg", {})
        score_fn = make_score_fn(
            jax.tree.map(jnp.asarray, payload["model"]),
            ProteinClassifierConfig(
                vocab_size=28, n_layer=int(ccfg.get("n_layer", 4)),
                n_head=int(ccfg.get("n_head", 4)), n_embd=int(ccfg.get("n_embd", 256)),
                block_size=int(ccfg.get("block_size", 512)), dropout=0.0,
                pooling=str(ccfg.get("pooling", "mean")),
            ),
            ProteinTokenizer(),
        )
        rng = np.random.default_rng(args.seed)
        infos = [
            gen.generate_cds_critic_guided(
                decoder, score_fn, ctx, stoi, itos,
                target_codons=args.target_codons, hard_cap=args.hard_cap,
                require_terminal_stop=True, rng=rng,
            )[1]
            for _ in range(args.n_samples)
        ]
        report["critic_guided"] = {
            "terminal_stop_rate": float(np.mean([i["had_terminal_stop"] for i in infos])),
            "mean_codons": float(np.mean([i["generated_codons"] for i in infos])),
            "mean_tokens": float(np.mean([i["generated_tokens"] for i in infos])),
        }

    out = Path(args.out) if args.out else run_dir / "scores" / "guidance_ablation.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
