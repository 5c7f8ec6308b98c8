#!/usr/bin/env python3
"""Evaluate a multitask protein-critic checkpoint on a JSONL split
(reference eval_multi_task_critic.py — per-task accuracy/MAE over the
family/function/stability heads)."""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="multitask critic checkpoint")
    ap.add_argument("--jsonl", required=True, help="eval split (pfam_id/ec_id/...)")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--out", default="outputs/critic/multitask_eval.json")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from genomics_lm_tpu.models.protein import (
        ProteinClassifierConfig,
        multitask_forward,
    )
    from genomics_lm_tpu.protein.dataset import MultiTaskProteinDataset
    from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer
    from genomics_lm_tpu.training.checkpoints import load_checkpoint

    tokenizer = ProteinTokenizer()
    payload = load_checkpoint(args.ckpt)
    ccfg = payload.get("cfg", {})
    cfg = ProteinClassifierConfig(
        vocab_size=len(tokenizer),
        n_layer=int(ccfg.get("n_layer", 4)), n_head=int(ccfg.get("n_head", 4)),
        n_embd=int(ccfg.get("n_embd", 256)),
        block_size=int(ccfg.get("block_size", 512)),
        dropout=0.0, pooling=str(ccfg.get("pooling", "attention")),
        bidirectional=bool(ccfg.get("bidirectional", True)),
    )
    params = jax.tree.map(jnp.asarray, payload["model"])
    head_names = sorted(params["heads"].keys())

    ds = MultiTaskProteinDataset(args.jsonl, tokenizer, max_length=cfg.block_size)

    @jax.jit
    def forward(input_ids, attention_mask):
        return multitask_forward(params, cfg, input_ids, attention_mask)

    stats = {name: {"correct": 0, "count": 0, "abs_err": 0.0} for name in head_names}
    for start in range(0, len(ds), args.batch_size):
        idx = list(range(start, min(start + args.batch_size, len(ds))))
        batch = ds.batch(idx)
        out = forward(jnp.asarray(batch["input_ids"]),
                      jnp.asarray(batch["attention_mask"]))
        for name in head_names:
            if name not in batch:
                continue
            logits = np.asarray(out[name])
            labels = np.asarray(batch[name])
            if logits.shape[-1] == 1:  # regression head
                valid = ~np.isnan(labels)
                stats[name]["abs_err"] += float(
                    np.abs(logits[:, 0][valid] - labels[valid]).sum()
                )
                stats[name]["count"] += int(valid.sum())
            else:
                valid = labels >= 0
                pred = logits.argmax(-1)
                stats[name]["correct"] += int((pred[valid] == labels[valid]).sum())
                stats[name]["count"] += int(valid.sum())

    report = {"samples": len(ds), "tasks": {}}
    for name, s in stats.items():
        head_dim = int(np.asarray(params["heads"][name]["w"]).shape[-1])
        if s["count"] == 0:
            report["tasks"][name] = {"labeled": 0}
        elif head_dim == 1:
            report["tasks"][name] = {"labeled": s["count"],
                                     "mae": s["abs_err"] / s["count"]}
        else:
            report["tasks"][name] = {"labeled": s["count"],
                                     "accuracy": s["correct"] / s["count"]}
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
