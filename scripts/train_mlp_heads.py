#!/usr/bin/env python3
"""MLP heads over frozen critic features (reference train_mlp_heads.py)."""

from __future__ import annotations

import argparse
import json

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="critic config YAML")
    ap.add_argument("--critic_ckpt", required=True)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out_dir", default="runs/protein_mlp_heads")
    args = ap.parse_args(argv)

    import yaml

    from genomics_lm_tpu.protein.train_mlp_heads import train

    with open(args.config) as f:
        cfg = yaml.safe_load(f) or {}
    report = train(
        cfg, args.critic_ckpt, epochs=args.epochs, hidden=args.hidden,
        lr=args.lr, out_dir=args.out_dir,
    )
    print(json.dumps(report, indent=2, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
