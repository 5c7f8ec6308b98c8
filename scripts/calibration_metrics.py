#!/usr/bin/env python3
"""Next-token calibration metrics (reference calibration_metrics.py).

Expected calibration error (ECE), Brier score, and a reliability table over
top-1 next-token predictions on a packed split.
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
    ap.add_argument("--n_bins", type=int, default=10)
    ap.add_argument("--max_batches", type=int, default=16)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--out", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from genomics_lm_tpu.data.datasets import PackedDataset
    from genomics_lm_tpu.evals.playground import load_codon_model
    from genomics_lm_tpu.models import codon_gpt

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    params, cfg, _, _ = load_codon_model(run_dir)
    cfg = cfg.replace(dropout=0.0)

    @jax.jit
    def top1(x, y):
        logits, _ = codon_gpt.forward(params, cfg, x)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        conf = jnp.max(probs, axis=-1)
        pred = jnp.argmax(probs, axis=-1)
        return conf, pred == y, y != 0

    ds = PackedDataset(args.npz)
    confs, hits = [], []
    for start in range(0, min(len(ds), args.max_batches * args.batch_size), args.batch_size):
        x, y = ds.fetch_batch(list(range(start, min(start + args.batch_size, len(ds)))))
        c, h, v = top1(jnp.asarray(x), jnp.asarray(y))
        mask = np.asarray(v).reshape(-1)
        confs.append(np.asarray(c).reshape(-1)[mask])
        hits.append(np.asarray(h).reshape(-1)[mask])
    conf = np.concatenate(confs)
    hit = np.concatenate(hits).astype(np.float64)

    edges = np.linspace(0, 1, args.n_bins + 1)
    table = []
    ece = 0.0
    for lo, hi in zip(edges[:-1], edges[1:]):
        mask = (conf >= lo) & (conf < hi if hi < 1 else conf <= hi)
        if not mask.any():
            continue
        acc = float(hit[mask].mean())
        avg_conf = float(conf[mask].mean())
        frac = float(mask.mean())
        ece += frac * abs(acc - avg_conf)
        table.append({"bin": f"{lo:.1f}-{hi:.1f}", "fraction": frac,
                      "confidence": avg_conf, "accuracy": acc})
    brier = float(((conf - hit) ** 2).mean())
    report = {"tokens": int(conf.size), "ece": ece, "brier_top1": brier,
              "top1_accuracy": float(hit.mean()), "reliability": table}
    out = Path(args.out) if args.out else run_dir / "scores" / "calibration.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps({k: report[k] for k in ("tokens", "ece", "brier_top1",
                                             "top1_accuracy")}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
