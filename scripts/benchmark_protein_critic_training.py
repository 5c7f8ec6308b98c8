#!/usr/bin/env python3
"""Protein-critic training-throughput benchmark
(reference benchmark_protein_critic_training.py — length-stratified sample,
forward/backward step timings at several batch sizes)."""

from __future__ import annotations

import argparse
import json
import sys as _sys
import time
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def stratified_indices(dataset, count: int) -> list[int]:
    """Deterministic length-stratified sample including both endpoints."""
    count = min(int(count), len(dataset))
    ordered = sorted(range(len(dataset)), key=dataset.sequence_length)
    if count <= 1:
        return ordered[:1]
    step = (len(ordered) - 1) / (count - 1)
    return [ordered[round(i * step)] for i in range(count)]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl", required=True, help="multitask JSONL split")
    ap.add_argument("--batch_sizes", default="4,8,16")
    ap.add_argument("--n_layer", type=int, default=4)
    ap.add_argument("--n_head", type=int, default=4)
    ap.add_argument("--n_embd", type=int, default=256)
    ap.add_argument("--block_size", type=int, default=512)
    ap.add_argument("--sample", type=int, default=64)
    ap.add_argument("--measure_steps", type=int, default=5)
    ap.add_argument("--out", default="outputs/benchmarks/critic_training.json")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from genomics_lm_tpu.models.protein import (
        ProteinClassifierConfig,
        init_multitask,
        multitask_forward,
    )
    from genomics_lm_tpu.protein.dataset import MultiTaskProteinDataset
    from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer
    from genomics_lm_tpu.utils.sync import hard_sync

    tokenizer = ProteinTokenizer()
    cfg = ProteinClassifierConfig(
        vocab_size=len(tokenizer), n_layer=args.n_layer, n_head=args.n_head,
        n_embd=args.n_embd, block_size=args.block_size, dropout=0.1,
        pooling="attention",
    )
    ds = MultiTaskProteinDataset(args.jsonl, tokenizer, max_length=cfg.block_size)
    sample = stratified_indices(ds, args.sample)
    task_dims = {"family": 4, "function": 8, "stability": 2}
    params = init_multitask(jax.random.key(0), cfg, task_dims)
    optimizer = optax.adamw(1e-4)
    opt_state = optimizer.init(params)

    def loss_fn(p, input_ids, attention_mask, labels):
        out = multitask_forward(p, cfg, input_ids, attention_mask)
        loss = 0.0
        for task in task_dims:
            logits = out[task]
            lab = labels[task]
            valid = lab >= 0
            logp = jax.nn.log_softmax(logits, -1)
            picked = jnp.take_along_axis(
                logp, jnp.maximum(lab, 0)[:, None], axis=-1
            )[:, 0]
            loss += -(picked * valid).sum() / jnp.maximum(valid.sum(), 1)
        return loss

    @jax.jit
    def step(p, opt_state, input_ids, attention_mask, labels):
        loss, grads = jax.value_and_grad(loss_fn)(p, input_ids, attention_mask,
                                                  labels)
        updates, opt_state = optimizer.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    results = []
    for bs in (int(b) for b in args.batch_sizes.split(",")):
        rows = sample[:bs] if len(sample) >= bs else (sample * bs)[:bs]
        batch = ds.batch(rows, pad_to=cfg.block_size)
        input_ids = jnp.asarray(batch["input_ids"])
        attention_mask = jnp.asarray(batch["attention_mask"])
        labels = {t: jnp.asarray(np.random.default_rng(0).integers(
            0, task_dims[t], bs).astype(np.int32)) for t in task_dims}
        # warmup/compile
        p2, s2, loss = step(params, opt_state, input_ids, attention_mask, labels)
        hard_sync({"loss": loss})
        t0 = time.time()
        for _ in range(args.measure_steps):
            p2, s2, loss = step(p2, s2, input_ids, attention_mask, labels)
        hard_sync({"loss": loss})
        dt = (time.time() - t0) / args.measure_steps
        results.append({
            "batch_size": bs,
            "sec_per_step": round(dt, 4),
            "sequences_per_sec": round(bs / dt, 2),
            "tokens_per_sec": round(bs * cfg.block_size / dt, 1),
        })

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
