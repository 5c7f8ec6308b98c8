#!/usr/bin/env python3
"""Context-usage diagnostics (reference diagnose_context_learning.py).

Per-position-in-context NLL buckets + attention-window ablation: does the
model actually use long-range context, or is it a local n-gram in disguise?
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--npz", required=True)
    ap.add_argument("--windows", default="1,2,4,8")
    ap.add_argument("--position_buckets", default="0,8,32,128")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--max_batches", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from genomics_lm_tpu.data.datasets import PackedDataset
    from genomics_lm_tpu.evals.perplexity import context_ablation
    from genomics_lm_tpu.evals.playground import load_codon_model
    from genomics_lm_tpu.models import codon_gpt

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    params, cfg, _, _ = load_codon_model(run_dir)
    cfg = cfg.replace(dropout=0.0)

    # per-position NLL buckets
    @jax.jit
    def token_nll(x, y):
        logits, _ = codon_gpt.forward(params, cfg, x)
        logits = logits.astype(jnp.float32)
        logz = jax.scipy.special.logsumexp(logits, axis=-1)
        true = jnp.take_along_axis(logits, y[..., None], axis=-1)[..., 0]
        return logz - true, y != 0

    ds = PackedDataset(args.npz)
    edges = [int(e) for e in args.position_buckets.split(",")]
    sums = np.zeros(len(edges))
    counts = np.zeros(len(edges))
    for start in range(0, min(len(ds), args.max_batches * args.batch_size), args.batch_size):
        x, y = ds.fetch_batch(list(range(start, min(start + args.batch_size, len(ds)))))
        nll, valid = token_nll(jnp.asarray(x), jnp.asarray(y))
        nll, valid = np.asarray(nll), np.asarray(valid)
        positions = np.broadcast_to(np.arange(x.shape[1]), x.shape)
        bucket = np.digitize(positions, edges) - 1
        for b in range(len(edges)):
            mask = (bucket == b) & valid
            sums[b] += nll[mask].sum()
            counts[b] += mask.sum()
    position_nll = {
        f">={edges[b]}": (float(sums[b] / counts[b]) if counts[b] else None)
        for b in range(len(edges))
    }

    windows = [int(w) for w in args.windows.split(",")] + [None]
    ablation = context_ablation(
        params, cfg, args.npz, windows=tuple(windows), batch_size=args.batch_size
    )
    full_nll = ablation["full"]["nll"]
    report = {
        "position_nll": position_nll,
        "window_ablation": {
            k: {"nll": v["nll"], "delta_vs_full": v["nll"] - full_nll}
            for k, v in ablation.items()
        },
        "context_gain_w1_minus_full": ablation["1"]["nll"] - full_nll,
    }
    out = Path(args.out) if args.out else run_dir / "scores" / "context_diagnostics.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
