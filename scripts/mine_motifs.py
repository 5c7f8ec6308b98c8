#!/usr/bin/env python3
"""Motif mining CLI: window embeddings → clusters → consensus.

Parity: reference ``src/codonlm/mine_motifs.py`` (k=9 windows, KMeans(100))
+ known-motif matching.
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
    ap.add_argument("--npz", required=True, help="packed NPZ split to mine")
    ap.add_argument("--window", type=int, default=9)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--n_clusters", type=int, default=100)
    ap.add_argument("--max_windows", type=int, default=256,
                    help="sequences sampled from the split")
    ap.add_argument("--out", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.data.datasets import PackedDataset
    from genomics_lm_tpu.evals.motifs import (
        MotifClusterer,
        cluster_consensus,
        cluster_pwm_report,
        extract_window_embeddings,
        match_known_motifs,
    )
    from genomics_lm_tpu.evals.playground import load_codon_model

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    params, cfg, itos_list, _ = load_codon_model(run_dir, args.checkpoint)
    itos = dict(enumerate(itos_list))

    ds = PackedDataset(args.npz)
    rows = min(len(ds), args.max_windows)
    x, _ = ds.fetch_batch(list(range(rows)))
    emb, meta = extract_window_embeddings(
        params, cfg.replace(dropout=0.0), x,
        window_size=args.window, stride=args.stride,
        exclude_ids=[0],  # skip PAD-containing windows
    )
    n_clusters = min(args.n_clusters, max(2, len(meta) // 2))
    clusterer = MotifClusterer(n_clusters=n_clusters)
    labels = clusterer.fit_predict(emb)
    consensus = cluster_consensus(x, meta, labels, itos)
    pwm_stats = cluster_pwm_report(x, meta, labels, itos)
    report = {
        "n_windows": len(meta),
        "n_clusters": n_clusters,
        "clusters": {
            str(label): {
                "consensus": text,
                "size": int((labels == label).sum()),
                "known_motifs": match_known_motifs(text),
                **{
                    key: value
                    for key, value in pwm_stats.get(label, {}).items()
                    if key != "per_position_entropy_bits"
                },
                "per_position_entropy_bits": pwm_stats.get(label, {}).get(
                    "per_position_entropy_bits", []
                ),
            }
            for label, text in consensus.items()
        },
    }
    out = Path(args.out) if args.out else run_dir / "scores" / "motifs.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(f"[motifs] {len(meta)} windows → {n_clusters} clusters → {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
