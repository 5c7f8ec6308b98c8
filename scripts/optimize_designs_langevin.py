#!/usr/bin/env python3
"""Latent Langevin optimization of designed proteins
(reference optimize_designs_langevin.py)."""

from __future__ import annotations

import argparse
import csv
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--designs_csv", required=True,
                    help="CSV with id,protein columns (e.g. design-loop output)")
    ap.add_argument("--critic_ckpt", required=True)
    ap.add_argument("--ebm_ckpt", required=True)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--noise_std", type=float, default=0.01)
    ap.add_argument("--lambda_reg", type=float, default=0.1)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from genomics_lm_tpu.models.protein import ProteinClassifierConfig
    from genomics_lm_tpu.protein.sampler import latent_langevin_sample
    from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer
    from genomics_lm_tpu.training.checkpoints import load_checkpoint

    tokenizer = ProteinTokenizer()
    critic_payload = load_checkpoint(args.critic_ckpt)
    ccfg = critic_payload.get("cfg", {})
    critic_cfg = ProteinClassifierConfig(
        vocab_size=len(tokenizer),
        n_layer=int(ccfg.get("n_layer", 4)), n_head=int(ccfg.get("n_head", 4)),
        n_embd=int(ccfg.get("n_embd", 256)), block_size=int(ccfg.get("block_size", 512)),
        dropout=0.0, pooling=str(ccfg.get("pooling", "attention")),
    )
    critic_params = jax.tree.map(jnp.asarray, critic_payload["model"])
    ebm_params = jax.tree.map(jnp.asarray, load_checkpoint(args.ebm_ckpt)["model"])

    rows = []
    with open(args.designs_csv) as f:
        for record in csv.DictReader(f):
            protein = record.get("protein") or record.get("sequence")
            if not protein:
                continue
            optimized, energies = latent_langevin_sample(
                ebm_params, critic_params, critic_cfg, tokenizer, protein,
                steps=args.steps, lr=args.lr, noise_std=args.noise_std,
                lambda_reg=args.lambda_reg,
            )
            rows.append({
                "id": record.get("id") or record.get("candidate"),
                "initial": protein,
                "optimized": optimized,
                "initial_energy": energies[0] if energies else None,
                "final_energy": energies[-1] if energies else None,
                "changed_positions": sum(a != b for a, b in zip(protein, optimized)),
            })
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()) if rows else ["id"])
        writer.writeheader()
        writer.writerows(rows)
    print(json.dumps({"optimized": len(rows)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
