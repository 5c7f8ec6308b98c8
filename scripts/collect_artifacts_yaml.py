#!/usr/bin/env python3
"""Collect model artifacts for downstream analysis
(reference collect_artifacts_yaml.py — writes runs/<id>/artifacts.npz with
token/positional embeddings, validation statistics, logits, probabilities,
and attention tensors for a few captured batches)."""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--npz", required=True, help="validation split to capture")
    ap.add_argument("--n_batches", type=int, default=2)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from genomics_lm_tpu.data.datasets import PackedDataset
    from genomics_lm_tpu.evals.playground import load_codon_model
    from genomics_lm_tpu.models import codon_gpt
    from genomics_lm_tpu.ops.losses import cross_entropy

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    params, cfg, itos, _ = load_codon_model(run_dir)
    cfg = cfg.replace(dropout=0.0)
    ds = PackedDataset(args.npz)

    logits_all, probs_all, attn_all, losses = [], [], [], []
    for b in range(args.n_batches):
        start = b * args.batch_size
        if start >= len(ds):
            break
        x, y = ds.fetch_batch(list(range(start, min(start + args.batch_size, len(ds)))))
        x_j, y_j = jnp.asarray(x), jnp.asarray(y)
        logits, _ = codon_gpt.forward(params, cfg, x_j)
        maps = codon_gpt.attention_maps(params, cfg, x_j)
        loss = cross_entropy(logits, y_j, ignore_index=0)
        logits_np = np.asarray(logits, np.float32)
        logits_all.append(logits_np)
        probs_all.append(
            np.asarray(jnp.asarray(
                jnp.exp(jnp.asarray(logits_np)
                        - jnp.max(jnp.asarray(logits_np), -1, keepdims=True))
            ))
        )
        attn_all.append(np.stack([np.asarray(m, np.float32) for m in maps], axis=1))
        losses.append(float(loss))
    probs_all = [p / p.sum(-1, keepdims=True) for p in probs_all]

    payload = {
        "tok_emb": np.asarray(params["tok_emb"], np.float32),
        "logits": np.concatenate(logits_all) if logits_all else np.zeros((0,)),
        "probs": np.concatenate(probs_all) if probs_all else np.zeros((0,)),
        "attention": np.concatenate(attn_all) if attn_all else np.zeros((0,)),
        "val_loss_per_batch": np.asarray(losses, np.float32),
        "itos": np.asarray(itos),
    }
    if "pos_emb" in params:
        payload["pos_emb"] = np.asarray(params["pos_emb"], np.float32)
    out = run_dir / "artifacts.npz"
    np.savez_compressed(out, **payload)
    print(json.dumps({
        "out": str(out),
        "shapes": {k: list(v.shape) for k, v in payload.items()},
        "mean_val_loss": float(np.mean(losses)) if losses else None,
    }, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
