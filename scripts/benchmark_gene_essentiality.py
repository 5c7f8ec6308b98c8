#!/usr/bin/env python3
"""Gene-essentiality probe benchmark (reference benchmark_gene_essentiality.py).

Per-gene embeddings → logistic-regression essential/non-essential probe with
cross-validated F1 (the reference's λ-phage / P. aeruginosa protocol shape).
Input CSV columns: ``id``, ``sequence`` (CDS DNA), ``essential`` (0/1).
"""

from __future__ import annotations

import argparse
import csv
import json
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--genes_csv", required=True)
    ap.add_argument("--pooling", default="mean_nonpad")
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import f1_score
    from sklearn.model_selection import StratifiedKFold
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler

    from genomics_lm_tpu.evals.embeddings import extract_embeddings, ids_from_dna
    from genomics_lm_tpu.evals.playground import load_codon_model

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    params, cfg, _, _ = load_codon_model(run_dir)
    cfg = cfg.replace(dropout=0.0)

    seqs, labels = [], []
    with open(args.genes_csv) as f:
        for row in csv.DictReader(f):
            seqs.append(row["sequence"])
            labels.append(int(row["essential"]))
    y = np.asarray(labels)
    rows = np.stack([ids_from_dna(s, cfg.block_size) for s in seqs])
    X = extract_embeddings(params, cfg, rows, mode=args.pooling)

    skf = StratifiedKFold(n_splits=min(args.folds, int(np.bincount(y).min())),
                          shuffle=True, random_state=args.seed)
    f1s = []
    for train_idx, test_idx in skf.split(X, y):
        clf = Pipeline([
            ("scaler", StandardScaler()),
            ("clf", LogisticRegression(max_iter=2000, class_weight="balanced")),
        ])
        clf.fit(X[train_idx], y[train_idx])
        f1s.append(f1_score(y[test_idx], clf.predict(X[test_idx])))
    report = {
        "n_genes": len(seqs),
        "positive_fraction": float(y.mean()),
        "folds": len(f1s),
        "f1_mean": float(np.mean(f1s)),
        "f1_std": float(np.std(f1s)),
    }
    out = Path(args.out) if args.out else run_dir / "scores" / "essentiality_benchmark.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
