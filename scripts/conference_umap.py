#!/usr/bin/env python3
"""Publication embedding figure (reference conference_umap.py).

2-D projection (UMAP when installed, else PCA) of run embeddings colored by
label, saved into ``conference/figures/``.
"""

from __future__ import annotations

import argparse
import csv
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--sequences_csv", required=True,
                    help="CSV with sequence[,label] columns")
    ap.add_argument("--out_dir", default="conference/figures")
    ap.add_argument("--pooling", default="mean_nonpad")
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.evals.embeddings import extract_embeddings, ids_from_dna
    from genomics_lm_tpu.evals.playground import load_codon_model

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    params, cfg, _, _ = load_codon_model(run_dir)
    cfg = cfg.replace(dropout=0.0)

    seqs, labels = [], []
    with open(args.sequences_csv) as f:
        for row in csv.DictReader(f):
            seqs.append(row["sequence"])
            labels.append(row.get("label", ""))
    rows = np.stack([ids_from_dna(s, cfg.block_size) for s in seqs])
    X = extract_embeddings(params, cfg, rows, mode=args.pooling)

    try:
        import umap  # type: ignore

        coords = umap.UMAP(n_components=2, random_state=0).fit_transform(X)
        method = "umap"
    except ImportError:
        from sklearn.decomposition import PCA

        coords = PCA(n_components=2, random_state=0).fit_transform(
            np.asarray(X, np.float64)
        )
        method = "pca"

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots(figsize=(7, 6))
    labels_arr = np.asarray(labels)
    for lab in np.unique(labels_arr):
        mask = labels_arr == lab
        ax.scatter(coords[mask, 0], coords[mask, 1], s=12, alpha=0.75,
                   label=str(lab) if lab else None)
    if any(labels):
        ax.legend(fontsize=8)
    ax.set_title(f"{run_dir.name} embeddings ({method}, {args.pooling})")
    ax.set_xlabel(f"{method}-1")
    ax.set_ylabel(f"{method}-2")
    plt.tight_layout()
    out_path = out_dir / f"{run_dir.name}_embeddings_{method}.png"
    plt.savefig(out_path, dpi=200)
    plt.close(fig)
    print(f"[conference] figure → {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
