"""Classification metrics with stratified-bootstrap confidence intervals.

Parity: reference ``src/classifiers/probes.py`` — accuracy / balanced
accuracy / macro-F1 / OVR-AUROC / macro-AUPRC, optional 1000-resample
stratified bootstrap 95% CIs, confusion and calibration plots, NPZ pack IO.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def load_yaml(path):
    import yaml

    return yaml.safe_load(Path(path).read_text()) or {}


def ensure_dir(p) -> Path:
    path = Path(p)
    path.mkdir(parents=True, exist_ok=True)
    return path


def save_json(path, data: dict) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(json.dumps(data, indent=2, sort_keys=True))


def _one_hot(y: np.ndarray, n_classes: int) -> np.ndarray:
    out = np.zeros((y.shape[0], n_classes), dtype=np.float32)
    out[np.arange(y.shape[0]), y] = 1.0
    return out


def _stratified_bootstrap_indices(y_true: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Resample within each observed class, preserving its count."""
    sampled = [
        rng.choice(idx, size=len(idx), replace=True)
        for label in np.unique(y_true)
        for idx in [np.flatnonzero(y_true == label)]
    ]
    indices = np.concatenate(sampled)
    rng.shuffle(indices)
    return indices


def compute_metrics(
    y_true: np.ndarray,
    y_pred: np.ndarray,
    y_proba: Optional[np.ndarray] = None,
    bootstrap: bool = False,
    n_resamples: int = 1000,
    seed: int = 42,
) -> Dict[str, float]:
    import sklearn.metrics as skm

    def _calc(true, pred, proba):
        res = {
            "accuracy": float(skm.accuracy_score(true, pred)),
            "balanced_accuracy": float(skm.balanced_accuracy_score(true, pred)),
        }
        try:
            res["macro_f1"] = float(skm.f1_score(true, pred, average="macro"))
        except Exception:
            pass
        if proba is not None:
            try:
                if proba.ndim == 1:
                    res["auroc"] = float(skm.roc_auc_score(true, proba))
                    res["macro_auprc"] = float(skm.average_precision_score(true, proba))
                else:
                    true_oh = _one_hot(true, proba.shape[1])
                    res["auroc"] = float(
                        skm.roc_auc_score(true_oh, proba, multi_class="ovr")
                    )
                    res["macro_auprc"] = float(
                        skm.average_precision_score(true_oh, proba, average="macro")
                    )
            except Exception:
                pass
        return res

    metrics = _calc(y_true, y_pred, y_proba)
    if bootstrap and len(y_true) > 0:
        rng = np.random.default_rng(seed)
        runs = []
        for _ in range(n_resamples):
            idx = _stratified_bootstrap_indices(y_true, rng)
            try:
                runs.append(
                    _calc(
                        y_true[idx], y_pred[idx],
                        y_proba[idx] if y_proba is not None else None,
                    )
                )
            except Exception:
                pass
        for key in list(metrics):
            vals = sorted(r[key] for r in runs if key in r)
            if vals:
                metrics[f"{key}_ci_lower"] = float(vals[int(len(vals) * 0.025)])
                metrics[f"{key}_ci_upper"] = float(vals[int(len(vals) * 0.975)])
    return metrics


def plot_confusion(y_true, y_pred, out_path, normalize: bool = True) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import sklearn.metrics as skm

    labels = np.unique(np.concatenate([y_true, y_pred]))
    cm = skm.confusion_matrix(
        y_true, y_pred, labels=labels, normalize=("true" if normalize else None)
    )
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(cm, cmap="Blues")
    ax.figure.colorbar(im, ax=ax)
    ax.set_xlabel("Predicted")
    ax.set_ylabel("True")
    ax.set_xticks(range(len(labels)))
    ax.set_xticklabels(labels, rotation=45, ha="right")
    ax.set_yticks(range(len(labels)))
    ax.set_yticklabels(labels)
    ax.set_title("Confusion Matrix" + (" (normalized)" if normalize else ""))
    plt.tight_layout()
    ensure_dir(Path(out_path).parent)
    plt.savefig(out_path)
    plt.close(fig)


def plot_calibration(y_true, y_proba, out_path, n_bins: int = 10) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.calibration import calibration_curve

    if y_proba.ndim > 1 and y_proba.shape[1] > 1:
        scores = y_proba.max(axis=1)
        y_bin = (y_true == y_proba.argmax(axis=1)).astype(int)
    else:
        scores = y_proba.reshape(-1)
        y_bin = y_true
    if np.any(scores < 0.0) or np.any(scores > 1.0):
        scores = 1.0 / (1.0 + np.exp(-scores))
    prob_true, prob_pred = calibration_curve(y_bin, scores, n_bins=n_bins)
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot(prob_pred, prob_true, marker="o", label="model")
    ax.plot([0, 1], [0, 1], linestyle="--", color="gray", label="perfect")
    ax.set_xlabel("Predicted probability")
    ax.set_ylabel("True frequency")
    ax.set_title("Calibration curve")
    ax.legend()
    plt.tight_layout()
    ensure_dir(Path(out_path).parent)
    plt.savefig(out_path)
    plt.close(fig)


def save_npz(path, **arrays) -> None:
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(p, **arrays)


def load_npz(path) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=True) as blob:
        return {k: blob[k] for k in blob.files}


@dataclass
class EmbeddingPack:
    """Sequence embeddings plus optional labels/ids."""

    X: np.ndarray
    y: Optional[np.ndarray] = None
    ids: Optional[List[str]] = None


__all__ = [
    "EmbeddingPack",
    "compute_metrics",
    "ensure_dir",
    "load_npz",
    "load_yaml",
    "plot_calibration",
    "plot_confusion",
    "save_json",
    "save_npz",
]
