"""Classifier metric suite: point estimates + stratified-bootstrap 95% CIs.

Behavioral spec (reference ``src/classifiers/probes.py``): accuracy,
balanced accuracy, macro-F1, one-vs-rest AUROC, macro AUPRC; optional
class-stratified bootstrap (resample within each class, preserving counts)
with percentile confidence bounds; confusion/calibration plots; small
JSON/YAML/NPZ IO helpers shared by the probe scripts.

Structured as a metric registry scored over resamples rather than a nested
closure: each entry is (name, needs_proba, scorer), scored via
``_score_all``; the bootstrap distribution is collected per metric name.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import numpy as np

CI_LO_Q = 0.025
CI_HI_Q = 0.975


# --- small IO helpers shared by probe/classifier scripts --------------------


def ensure_dir(p) -> Path:
    out = Path(p)
    out.mkdir(parents=True, exist_ok=True)
    return out


def load_yaml(path) -> dict:
    import yaml

    return yaml.safe_load(Path(path).read_text()) or {}


def save_json(path, data: dict) -> None:
    target = Path(path)
    ensure_dir(target.parent)
    target.write_text(json.dumps(data, indent=2, sort_keys=True))


def save_npz(path, **arrays) -> None:
    target = Path(path)
    ensure_dir(target.parent)
    np.savez_compressed(target, **arrays)


def load_npz(path) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=True) as blob:
        return {name: blob[name] for name in blob.files}


@dataclass
class EmbeddingPack:
    """Sequence embeddings plus optional labels/ids."""

    X: np.ndarray
    y: Optional[np.ndarray] = None
    ids: Optional[List[str]] = None


# --- scoring ----------------------------------------------------------------


def _labels_to_indicator(y: np.ndarray, n_classes: int) -> np.ndarray:
    eye = np.eye(n_classes, dtype=np.float32)
    return eye[np.asarray(y, dtype=np.int64)]


def _score_all(true, pred, proba) -> Dict[str, float]:
    """One pass of every metric that applies to this prediction shape.

    Metrics that cannot be computed on a given resample (e.g. a class
    missing from a bootstrap draw breaking AUROC) are silently omitted —
    the CI then aggregates over the resamples where the metric existed.
    """
    import sklearn.metrics as skm

    scores: Dict[str, float] = {
        "accuracy": float(skm.accuracy_score(true, pred)),
        "balanced_accuracy": float(skm.balanced_accuracy_score(true, pred)),
    }
    try:
        scores["macro_f1"] = float(skm.f1_score(true, pred, average="macro"))
    except Exception:
        pass
    if proba is None:
        return scores
    try:
        if proba.ndim == 1:
            scores["auroc"] = float(skm.roc_auc_score(true, proba))
            scores["macro_auprc"] = float(skm.average_precision_score(true, proba))
        else:
            indicator = _labels_to_indicator(true, proba.shape[1])
            scores["auroc"] = float(
                skm.roc_auc_score(indicator, proba, multi_class="ovr")
            )
            scores["macro_auprc"] = float(
                skm.average_precision_score(indicator, proba, average="macro")
            )
    except Exception:
        pass
    return scores


def _resamples(
    y_true: np.ndarray, n_resamples: int, seed: int
) -> Iterator[np.ndarray]:
    """Class-stratified bootstrap index draws (each class keeps its count)."""
    rng = np.random.default_rng(seed)
    class_pools = [np.flatnonzero(y_true == c) for c in np.unique(y_true)]
    for _ in range(n_resamples):
        draw = np.concatenate(
            [rng.choice(pool, size=pool.size, replace=True) for pool in class_pools]
        )
        rng.shuffle(draw)
        yield draw


def compute_metrics(
    y_true: np.ndarray,
    y_pred: np.ndarray,
    y_proba: Optional[np.ndarray] = None,
    bootstrap: bool = False,
    n_resamples: int = 1000,
    seed: int = 42,
) -> Dict[str, float]:
    """Point metrics, plus ``<name>_ci_lower``/``_ci_upper`` percentile
    bounds from a stratified bootstrap when ``bootstrap`` is set."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    report = _score_all(y_true, y_pred, y_proba)

    if not bootstrap or y_true.size == 0:
        return report

    distribution: Dict[str, list] = {name: [] for name in report}
    for idx in _resamples(y_true, n_resamples, seed):
        try:
            sample_scores = _score_all(
                y_true[idx], y_pred[idx],
                None if y_proba is None else y_proba[idx],
            )
        except Exception:
            continue
        for name, value in sample_scores.items():
            if name in distribution:
                distribution[name].append(value)

    for name, values in distribution.items():
        if not values:
            continue
        values.sort()
        report[f"{name}_ci_lower"] = float(values[int(len(values) * CI_LO_Q)])
        report[f"{name}_ci_upper"] = float(values[int(len(values) * CI_HI_Q)])
    return report


# --- plots ------------------------------------------------------------------


def _new_axes(size):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt, plt.subplots(figsize=size)


def _finish(plt, fig, out_path) -> None:
    plt.tight_layout()
    ensure_dir(Path(out_path).parent)
    plt.savefig(out_path)
    plt.close(fig)


def plot_confusion(y_true, y_pred, out_path, normalize: bool = True) -> None:
    """Heatmap of the (optionally row-normalized) confusion matrix."""
    import sklearn.metrics as skm

    classes = np.unique(np.concatenate([y_true, y_pred]))
    matrix = skm.confusion_matrix(
        y_true, y_pred, labels=classes, normalize="true" if normalize else None
    )
    plt, (fig, ax) = _new_axes((6, 5))
    image = ax.imshow(matrix, cmap="Blues")
    fig.colorbar(image, ax=ax)
    ax.set(
        xlabel="Predicted",
        ylabel="True",
        xticks=range(len(classes)),
        yticks=range(len(classes)),
        title="Confusion Matrix" + (" (normalized)" if normalize else ""),
    )
    ax.set_xticklabels(classes, rotation=45, ha="right")
    ax.set_yticklabels(classes)
    _finish(plt, fig, out_path)


def plot_calibration(y_true, y_proba, out_path, n_bins: int = 10) -> None:
    """Reliability diagram; multiclass reduces to top-1 confidence vs hit.

    Scores outside [0, 1] are squashed through a sigmoid first (logit
    inputs), matching the reference's behavior.
    """
    from sklearn.calibration import calibration_curve

    proba = np.asarray(y_proba)
    if proba.ndim > 1 and proba.shape[1] > 1:
        confidence = proba.max(axis=1)
        hits = (np.asarray(y_true) == proba.argmax(axis=1)).astype(int)
    else:
        confidence = proba.reshape(-1)
        hits = np.asarray(y_true)
    if confidence.min() < 0.0 or confidence.max() > 1.0:
        confidence = 1.0 / (1.0 + np.exp(-confidence))

    frac_positive, mean_predicted = calibration_curve(hits, confidence, n_bins=n_bins)
    plt, (fig, ax) = _new_axes((5, 5))
    ax.plot(mean_predicted, frac_positive, marker="o", label="model")
    ax.plot([0, 1], [0, 1], linestyle="--", color="gray", label="perfect")
    ax.set(xlabel="Predicted probability", ylabel="True frequency",
           title="Calibration curve")
    ax.legend()
    _finish(plt, fig, out_path)


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
