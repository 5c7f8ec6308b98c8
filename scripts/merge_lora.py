#!/usr/bin/env python3
"""Fold LoRA adapters into base weights, producing a plain dense checkpoint.

    python scripts/merge_lora.py runs/<id>/checkpoints/best.npz merged.npz

The output is byte-compatible with every existing checkpoint consumer
(evaluate_test, playground, decode/serving, int8 quantization) — see
``training/lora.py``. Everything except ``model`` (cfg, itos, optimizer
state excluded) is carried over untouched.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="checkpoint with LoRA adapter leaves")
    ap.add_argument("out", help="merged dense checkpoint to write")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.training import checkpoints as ckpt_lib
    from genomics_lm_tpu.training.lora import has_lora, merge_lora

    payload = ckpt_lib.load_checkpoint(args.checkpoint)
    if not has_lora(payload["model"]):
        print(f"error: {args.checkpoint} has no LoRA adapters", file=sys.stderr)
        return 2
    payload = dict(payload)
    payload["model"] = merge_lora(payload["model"])
    payload.pop("optimizer", None)  # adapter-shaped; meaningless post-merge
    if isinstance(payload.get("cfg"), dict):
        # the merged tree is plain dense: any consumer seeding a run config
        # from this cfg (resume/transfer, build_optimizer's lora_only
        # default) must not re-attach adapters or freeze the backbone
        payload["cfg"] = {
            k: v for k, v in payload["cfg"].items() if not k.startswith("lora_")
        }
    ckpt_lib.save_checkpoint(payload, args.out)
    print(f"[merge_lora] wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
