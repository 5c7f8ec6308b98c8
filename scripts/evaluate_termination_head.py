#!/usr/bin/env python3
"""Evaluate the termination auxiliary head (reference evaluate_termination_head).

Per-bucket accuracy / confusion of distance-to-stop predictions on a packed
split.
"""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--npz", required=True)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--max_batches", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from genomics_lm_tpu.data.datasets import PackedDataset
    from genomics_lm_tpu.evals.playground import load_codon_model
    from genomics_lm_tpu.models import codon_gpt
    from genomics_lm_tpu.ops.losses import termination_distance_bucket_labels
    from genomics_lm_tpu.tokenizers.codon import STOP_IDS

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    params, cfg, _, _ = load_codon_model(run_dir)
    cfg = cfg.replace(dropout=0.0)
    if not cfg.termination_aux:
        # absence of the optional head is a skip, not an eval failure
        # (evaluate_run's medium/full modes include this track for every run)
        print(json.dumps({"skipped": "checkpoint has no termination head "
                                     "(termination_aux=false)"}))
        return 0
    n_classes = cfg.termination_n_classes

    @jax.jit
    def predict(x, y):
        _, _, aux = codon_gpt.forward(params, cfg, x, return_aux=True)
        preds = jnp.argmax(aux["termination_logits"], axis=-1)
        labels = termination_distance_bucket_labels(y, STOP_IDS)
        return preds, labels

    ds = PackedDataset(args.npz)
    confusion = np.zeros((n_classes, n_classes), np.int64)
    for start in range(0, min(len(ds), args.max_batches * args.batch_size), args.batch_size):
        x, y = ds.fetch_batch(list(range(start, min(start + args.batch_size, len(ds)))))
        preds, labels = predict(jnp.asarray(x), jnp.asarray(y))
        preds, labels = np.asarray(preds), np.asarray(labels)
        valid = labels != -100
        for t, p in zip(labels[valid], preds[valid]):
            confusion[int(t), int(p)] += 1
    total = confusion.sum()
    per_class = {
        str(c): {
            "support": int(confusion[c].sum()),
            "accuracy": float(confusion[c, c] / max(confusion[c].sum(), 1)),
        }
        for c in range(n_classes)
    }
    report = {
        "tokens": int(total),
        "accuracy": float(np.trace(confusion) / max(total, 1)),
        "per_class": per_class,
        "confusion": confusion.tolist(),
    }
    out = Path(args.out) if args.out else run_dir / "scores" / "termination_head.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps({k: report[k] for k in ("tokens", "accuracy")}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
