#!/usr/bin/env python3
"""Protein latent-EBM trainer CLI (reference train_ebm.py)."""

from __future__ import annotations

import argparse

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Train the protein latent EBM")
    ap.add_argument("--config", required=True, help="critic config YAML")
    ap.add_argument("--critic_ckpt", required=True)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--pooling", default="attention")
    ap.add_argument("--hidden_dim", type=int, default=512)
    ap.add_argument("--run_id", default="protein_ebm")
    ap.add_argument("--run_root", default="runs")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--seed", type=int, default=1337)
    args = ap.parse_args(argv)

    import yaml

    from genomics_lm_tpu.protein.train_ebm import train

    with open(args.config) as f:
        cfg = yaml.safe_load(f) or {}
    train(
        cfg, args.critic_ckpt, epochs=args.epochs, lr=args.lr,
        hidden_dim=args.hidden_dim, pooling=args.pooling, run_id=args.run_id,
        run_root=args.run_root, resume=args.resume, seed=args.seed,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
