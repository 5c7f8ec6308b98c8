#!/usr/bin/env python3
"""Gene-essentiality baselines vs the CodonLM representation probe
(reference benchmark_essentiality_baselines.py — logistic regression on raw
codon frequencies, gradient boosting on the same features, and logistic
regression on pre-trained LM embeddings, cross-validated)."""

from __future__ import annotations

import argparse
import csv
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def codon_frequency_features(seqs):
    import numpy as np

    codons = [a + b + c for a in "ACGT" for b in "ACGT" for c in "ACGT"]
    index = {c: i for i, c in enumerate(codons)}
    X = np.zeros((len(seqs), 64), np.float32)
    for row, dna in enumerate(seqs):
        dna = dna.upper().replace("U", "T")
        n = 0
        for i in range(0, (len(dna) // 3) * 3, 3):
            j = index.get(dna[i : i + 3])
            if j is not None:
                X[row, j] += 1
                n += 1
        if n:
            X[row] /= n
    return X


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id", nargs="?", default=None,
                    help="optional run for the LM-embedding probe column")
    ap.add_argument("--genes_csv", required=True, help="gene,sequence,essential")
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pooling", default="mean_nonpad")
    ap.add_argument("--out", default="outputs/probes/essentiality_baselines.json")
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np
    from sklearn.ensemble import HistGradientBoostingClassifier
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import f1_score
    from sklearn.model_selection import StratifiedKFold

    seqs, labels = [], []
    with open(args.genes_csv) as f:
        for row in csv.DictReader(f):
            seq = row.get("sequence") or row.get("dna")
            label = row.get("essential") or row.get("label")
            if seq and label is not None:
                seqs.append(seq)
                labels.append(int(label))
    y = np.asarray(labels)

    feature_sets = {"codon_freq": codon_frequency_features(seqs)}
    if args.run_id:
        from genomics_lm_tpu.evals.embeddings import extract_embeddings, ids_from_dna
        from genomics_lm_tpu.evals.playground import load_codon_model

        run_dir = resolve_run_dir(args.run_id, args.run_root)
        params, cfg, _, _ = load_codon_model(run_dir)
        cfg = cfg.replace(dropout=0.0)
        rows = np.stack([ids_from_dna(s, cfg.block_size) for s in seqs])
        feature_sets["lm_embedding"] = np.asarray(
            extract_embeddings(params, cfg, rows, mode=args.pooling)
        )

    models = {
        "logreg": lambda: LogisticRegression(max_iter=2000),
        "gbdt": lambda: HistGradientBoostingClassifier(max_iter=150),
    }
    columns = {
        "codon_freq_logreg": ("codon_freq", "logreg"),
        "codon_freq_gbdt": ("codon_freq", "gbdt"),
    }
    if "lm_embedding" in feature_sets:
        columns["lm_embedding_logreg"] = ("lm_embedding", "logreg")

    splitter = StratifiedKFold(n_splits=args.folds, shuffle=True,
                               random_state=args.seed)
    report = {}
    for name, (feats, model_name) in columns.items():
        X = feature_sets[feats]
        f1s, accs = [], []
        for train_index, test_index in splitter.split(X, y):
            model = models[model_name]()
            model.fit(X[train_index], y[train_index])
            pred = model.predict(X[test_index])
            f1s.append(f1_score(y[test_index], pred))
            accs.append(float((pred == y[test_index]).mean()))
        report[name] = {"mean_f1": float(np.mean(f1s)),
                        "std_f1": float(np.std(f1s)),
                        "mean_accuracy": float(np.mean(accs))}

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
