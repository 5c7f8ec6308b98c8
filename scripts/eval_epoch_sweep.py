#!/usr/bin/env python3
"""Perplexity across saved epoch checkpoints (reference eval_epoch_sweep.py)."""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--npz", required=True)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--out", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from genomics_lm_tpu.evals.perplexity import evaluate_perplexity
    from genomics_lm_tpu.evals.playground import build_codon_model_from_cfg
    from genomics_lm_tpu.training.checkpoints import load_checkpoint

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    ckpt_dir = run_dir / "checkpoints"
    epoch_ckpts = sorted(
        ckpt_dir.glob("epoch_*.npz"),
        key=lambda p: int(re.search(r"epoch_(\d+)", p.name).group(1)),
    )
    if not epoch_ckpts:
        epoch_ckpts = [ckpt_dir / "last.npz"]

    results = []
    for path in epoch_ckpts:
        payload = load_checkpoint(path)
        cfg = build_codon_model_from_cfg(payload["cfg"]).replace(dropout=0.0)
        params = jax.tree.map(jnp.asarray, payload["model"])
        out = evaluate_perplexity(params, cfg, args.npz, batch_size=args.batch_size)
        results.append({"checkpoint": path.name, "epoch": payload.get("epoch"),
                        **{k: out[k] for k in ("nll", "perplexity", "tokens")}})
        print(f"[sweep] {path.name}: ppl {out['perplexity']:.3f}")

    out_path = Path(args.out) if args.out else run_dir / "scores" / "epoch_sweep.json"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(results, indent=2) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
