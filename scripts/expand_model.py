#!/usr/bin/env python3
"""Expand a checkpoint to a wider/deeper model (reference expand_model.py)."""

from __future__ import annotations

import argparse
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out_checkpoint", required=True)
    ap.add_argument("--n_layer", type=int, required=True)
    ap.add_argument("--n_head", type=int, required=True)
    ap.add_argument("--n_embd", type=int, required=True)
    ap.add_argument("--block_size", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from genomics_lm_tpu.models import CodonGPTConfig
    from genomics_lm_tpu.training.checkpoints import load_checkpoint, save_checkpoint
    from genomics_lm_tpu.training.expansion import expand_checkpoint

    payload = load_checkpoint(args.checkpoint)
    src_cfg = dict(payload.get("cfg", {}))
    dst_map = dict(src_cfg)
    dst_map.update(
        n_layer=args.n_layer, n_head=args.n_head, n_embd=args.n_embd,
        block_size=args.block_size or src_cfg.get("block_size", 512),
    )
    dst_cfg = CodonGPTConfig.from_run_config(dst_map)
    out_payload, report = expand_checkpoint(payload, dst_cfg, seed=args.seed)
    out_path = Path(args.out_checkpoint)
    save_checkpoint(out_payload, out_path)
    print(
        f"[expand] copied={len(report['copied'])} expanded={len(report['expanded'])} "
        f"missing_initialized={len(report['missing_initialized'])} → {out_path}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
