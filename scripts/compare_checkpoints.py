#!/usr/bin/env python3
"""Side-by-side checkpoint comparison (reference compare_checkpoints.py)."""

from __future__ import annotations

import argparse
import json

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoints", nargs="+")
    ap.add_argument("--npz", required=True)
    ap.add_argument("--batch_size", type=int, default=32)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from genomics_lm_tpu.evals.perplexity import evaluate_perplexity
    from genomics_lm_tpu.evals.playground import build_codon_model_from_cfg
    from genomics_lm_tpu.training.checkpoints import load_checkpoint

    rows = []
    for path in args.checkpoints:
        payload = load_checkpoint(path)
        cfg = build_codon_model_from_cfg(payload["cfg"]).replace(dropout=0.0)
        params = jax.tree.map(jnp.asarray, payload["model"])
        out = evaluate_perplexity(params, cfg, args.npz, batch_size=args.batch_size)
        rows.append({
            "checkpoint": path,
            "epoch": payload.get("epoch"),
            "spec": f"{cfg.n_layer}L{cfg.n_head}H d{cfg.n_embd}",
            "nll": out["nll"],
            "perplexity": out["perplexity"],
        })
    rows.sort(key=lambda r: r["nll"])
    print(json.dumps(rows, indent=2))
    print(f"[compare] best: {rows[0]['checkpoint']} (ppl {rows[0]['perplexity']:.3f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
