"""Visualization helpers: embedding PCA, loss curves, run comparison.

Parity: reference ``src/eval/visualizer.py`` — PCA scatter of embeddings,
training-curve plots from ``curves.csv`` rows, and multi-run comparison
plots. All figures render headlessly (Agg) and save to disk.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_embedding_pca(
    X: np.ndarray, labels=None, out_path: str | Path = "pca.png", title: str = "Embedding PCA"
) -> np.ndarray:
    from sklearn.decomposition import PCA

    plt = _plt()
    coords = PCA(n_components=2).fit_transform(np.asarray(X, np.float64))
    fig, ax = plt.subplots(figsize=(6, 5))
    if labels is not None:
        labels = np.asarray(labels)
        for lab in np.unique(labels):
            mask = labels == lab
            ax.scatter(coords[mask, 0], coords[mask, 1], s=8, label=str(lab), alpha=0.7)
        if len(np.unique(labels)) <= 12:
            ax.legend(fontsize=7)
    else:
        ax.scatter(coords[:, 0], coords[:, 1], s=8, alpha=0.7)
    ax.set_xlabel("PC1")
    ax.set_ylabel("PC2")
    ax.set_title(title)
    plt.tight_layout()
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(out_path)
    plt.close(fig)
    return coords


def plot_loss_curves(curve_rows: list[dict], out_path: str | Path) -> None:
    plt = _plt()
    epochs = [int(r["epoch"]) for r in curve_rows]
    fig, ax = plt.subplots(figsize=(7, 4))
    for key, style in (("train_loss", "-"), ("val_loss", "--")):
        values = [float(r[key]) for r in curve_rows if key in r]
        if values:
            ax.plot(epochs[: len(values)], values, style, label=key)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    ax.set_title("Training curves")
    plt.tight_layout()
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(out_path)
    plt.close(fig)


def plot_run_comparison(runs: list[dict], metric: str, out_path: str | Path) -> None:
    """Bar chart of one meta metric across runs (ref comparison plots)."""
    plt = _plt()
    names, values = [], []
    for run in runs:
        meta = run.get("meta") or {}
        if meta.get(metric) is not None:
            names.append(run["run_id"])
            values.append(float(meta[metric]))
    fig, ax = plt.subplots(figsize=(max(4, len(names)), 4))
    ax.bar(range(len(names)), values)
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation=45, ha="right", fontsize=7)
    ax.set_ylabel(metric)
    ax.set_title(f"Run comparison: {metric}")
    plt.tight_layout()
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(out_path)
    plt.close(fig)


def plot_attention_heatmap(
    attn: np.ndarray, out_path: str | Path, tokens: list[str] | None = None,
    title: str = "Attention",
) -> None:
    """(T, T) attention heatmap (dashboard playground parity)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(np.asarray(attn), cmap="viridis")
    fig.colorbar(im, ax=ax)
    if tokens is not None and len(tokens) <= 40:
        ax.set_xticks(range(len(tokens)))
        ax.set_xticklabels(tokens, rotation=90, fontsize=6)
        ax.set_yticks(range(len(tokens)))
        ax.set_yticklabels(tokens, fontsize=6)
    ax.set_title(title)
    plt.tight_layout()
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(out_path)
    plt.close(fig)


__all__ = [
    "plot_attention_heatmap",
    "plot_embedding_pca",
    "plot_loss_curves",
    "plot_run_comparison",
]
