#!/usr/bin/env python3
"""Pretrain the DNA-shape encoder and (optionally) launch shape-guided LM
training (reference train_biophysics_fusion.py)."""

from __future__ import annotations

import argparse
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_checkpoint", default="outputs/shape_encoder.npz")
    ap.add_argument("--num_samples", type=int, default=5000)
    ap.add_argument("--seq_len_codons", type=int, default=50)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lm_config", default=None,
                    help="optionally chain into shape-guided LM training")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from genomics_lm_tpu.models.biophysics import train_encoder
    from genomics_lm_tpu.training.checkpoints import save_checkpoint

    params, losses = train_encoder(
        num_samples=args.num_samples, seq_len_codons=args.seq_len_codons,
        epochs=args.epochs, lr=args.lr, seed=args.seed,
    )
    out = Path(args.out_checkpoint)
    save_checkpoint(
        {"encoder": jax.tree.map(np.asarray, params),
         "losses": [float(l) for l in losses]},
        out,
    )
    print(f"[biophysics] encoder MSE {losses[0]:.4f} → {losses[-1]:.4f}; saved {out}")

    if args.lm_config:
        from genomics_lm_tpu.training.config import load_yaml_config
        from genomics_lm_tpu.training.loop import run_training

        cfg = load_yaml_config(args.lm_config)
        cfg["use_shape_guidance"] = True
        cfg["shape_encoder_checkpoint"] = str(out)
        run_training(cfg, config_path=args.lm_config)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
