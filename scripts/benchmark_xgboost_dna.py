#!/usr/bin/env python3
"""K-mer XGBoost DNA baseline (reference benchmark_xgboost_dna.py).

Falls back to a gradient-boosting sklearn model when xgboost is absent.
"""

from __future__ import annotations

import argparse
import csv
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_csv", required=True, help="id,sequence,label")
    ap.add_argument("--test_csv", required=True)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--out", default="outputs/probes/xgboost_dna.json")
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.evals.metrics import compute_metrics
    from genomics_lm_tpu.evals.probes import _tfidf

    def read(path):
        seqs, labels = [], []
        with open(path) as f:
            for row in csv.DictReader(f):
                seqs.append(row["sequence"])
                labels.append(int(row["label"]))
        return seqs, np.asarray(labels)

    train_seqs, y_tr = read(args.train_csv)
    test_seqs, y_te = read(args.test_csv)
    vec = _tfidf(args.k, True)
    X_tr = vec.fit_transform(train_seqs)
    X_te = vec.transform(test_seqs)

    try:
        from xgboost import XGBClassifier

        clf = XGBClassifier(n_estimators=200, max_depth=6, learning_rate=0.1,
                            subsample=0.8, colsample_bytree=0.8)
        engine = "xgboost"
    except ImportError:
        from sklearn.ensemble import HistGradientBoostingClassifier

        clf = HistGradientBoostingClassifier(max_iter=200)
        X_tr = X_tr.toarray()
        X_te = X_te.toarray()
        engine = "sklearn_hist_gbdt (xgboost not installed)"

    clf.fit(X_tr, y_tr)
    y_pred = clf.predict(X_te)
    try:
        y_proba = clf.predict_proba(X_te)
    except Exception:
        y_proba = None
    metrics = compute_metrics(y_te, y_pred, y_proba, bootstrap=True)
    report = {"engine": engine, "k": args.k, "test_metrics": metrics}
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(metrics, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
