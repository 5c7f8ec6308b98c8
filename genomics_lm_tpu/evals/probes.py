"""Downstream probes: linear, k-mer TF-IDF baselines, and a JAX MLP head.

Parity: reference ``src/classifiers/{linear_probe,kmer_baselines,mlp_head}.py``
— StandardScaler+LogReg / LinearSVC pipelines, picklable k-mer analyzer for
TF-IDF (LogReg/SVM/XGBoost), and a small MLP classifier. The MLP trains in
JAX (the reference uses torch-on-MPS); metrics flow through
``evals.metrics.compute_metrics`` in both cases.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from genomics_lm_tpu.evals.metrics import compute_metrics


@dataclass
class ProbeResult:
    model: object
    metrics: Dict[str, float]
    y_pred: np.ndarray
    y_proba: Optional[np.ndarray]


def fit_logreg(X, y, C: float = 1.0, max_iter: int = 2000) -> ProbeResult:
    from sklearn.linear_model import LogisticRegression
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler

    clf = Pipeline([
        ("scaler", StandardScaler(with_mean=True)),
        ("clf", LogisticRegression(C=C, max_iter=max_iter)),
    ])
    clf.fit(X, y)
    y_pred = clf.predict(X)
    try:
        y_proba = clf.predict_proba(X)
    except Exception:
        y_proba = None
    return ProbeResult(clf, compute_metrics(y, y_pred, y_proba), y_pred, y_proba)


def fit_linear_svm(X, y, C: float = 1.0) -> ProbeResult:
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import LinearSVC

    clf = Pipeline([
        ("scaler", StandardScaler(with_mean=True)),
        ("clf", LinearSVC(C=C)),
    ])
    clf.fit(X, y)
    y_pred = clf.predict(X)
    try:
        dec = clf.decision_function(X)
        y_proba = dec if isinstance(dec, np.ndarray) else None
    except Exception:
        y_proba = None
    return ProbeResult(clf, compute_metrics(y, y_pred, y_proba), y_pred, y_proba)


class _KmerAnalyzer:
    """Picklable k-mer tokenizer for TfidfVectorizer (ref kmer_baselines.py)."""

    def __init__(self, k: int) -> None:
        self.k = k

    def __call__(self, s: str) -> List[str]:
        s = s.strip().upper().replace("U", "T")
        if len(s) < self.k:
            return []
        return [s[i : i + self.k] for i in range(len(s) - self.k + 1)]


@dataclass
class KmerResult:
    vectorizer: object
    model: object
    metrics: Dict[str, float]
    y_pred: np.ndarray
    y_proba: Optional[np.ndarray]


def _tfidf(k: int, tfidf: bool):
    from sklearn.feature_extraction.text import TfidfVectorizer

    return TfidfVectorizer(
        analyzer=_KmerAnalyzer(k), lowercase=False, use_idf=tfidf, norm="l2"
    )


def fit_kmer_logreg(seqs, y, k: int = 3, tfidf: bool = True, C: float = 1.0,
                    max_iter: int = 2000) -> KmerResult:
    from sklearn.linear_model import LogisticRegression

    vec = _tfidf(k, tfidf)
    X = vec.fit_transform(seqs)
    clf = LogisticRegression(C=C, max_iter=max_iter)
    clf.fit(X, y)
    y_pred = clf.predict(X)
    try:
        y_proba = clf.predict_proba(X)
    except Exception:
        y_proba = None
    return KmerResult(vec, clf, compute_metrics(y, y_pred, y_proba), y_pred, y_proba)


def fit_kmer_svm(seqs, y, k: int = 3, tfidf: bool = True, C: float = 1.0) -> KmerResult:
    from sklearn.svm import LinearSVC

    vec = _tfidf(k, tfidf)
    X = vec.fit_transform(seqs)
    clf = LinearSVC(C=C)
    clf.fit(X, y)
    y_pred = clf.predict(X)
    try:
        y_proba = clf.decision_function(X)
    except Exception:
        y_proba = None
    return KmerResult(vec, clf, compute_metrics(y, y_pred, y_proba), y_pred, y_proba)


def fit_kmer_xgb(seqs, y, k: int = 3, tfidf: bool = True, **xgb_kwargs) -> KmerResult:
    try:
        from xgboost import XGBClassifier
    except Exception as exc:
        raise RuntimeError("xgboost not installed; pip install xgboost") from exc
    vec = _tfidf(k, tfidf)
    X = vec.fit_transform(seqs)
    clf = XGBClassifier(
        n_estimators=xgb_kwargs.get("n_estimators", 200),
        max_depth=xgb_kwargs.get("max_depth", 6),
        learning_rate=xgb_kwargs.get("learning_rate", 0.1),
        subsample=0.8,
        colsample_bytree=0.8,
        tree_method=xgb_kwargs.get("tree_method", "auto"),
    )
    clf.fit(X, y)
    y_pred = clf.predict(X)
    try:
        y_proba = clf.predict_proba(X)
    except Exception:
        y_proba = None
    return KmerResult(vec, clf, compute_metrics(y, y_pred, y_proba), y_pred, y_proba)


@dataclass
class MLPResult:
    params: dict
    metrics: Dict[str, float]
    y_pred: np.ndarray
    y_proba: np.ndarray
    predict_fn: object


def fit_mlp(
    X: np.ndarray,
    y: np.ndarray,
    epochs: int = 20,
    lr: float = 1e-3,
    batch_size: int = 64,
    hidden: int = 128,
    depth: int = 1,
    dropout: float = 0.1,
    seed: int = 0,
) -> MLPResult:
    """Small ReLU MLP classifier head, trained with AdamW in JAX."""
    import jax
    import jax.numpy as jnp
    import optax

    from genomics_lm_tpu.ops.losses import cross_entropy

    X = np.asarray(X, np.float32)
    y = np.asarray(y, np.int64)
    n_classes = int(y.max()) + 1
    d_in = X.shape[1]

    key = jax.random.PRNGKey(seed)
    dims = [d_in] + [hidden] * depth + [n_classes]
    params = []
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        bound = 1.0 / np.sqrt(a)
        params.append({
            "w": jax.random.uniform(sub, (a, b), jnp.float32, -bound, bound),
            "b": jnp.zeros((b,), jnp.float32),
        })

    def forward(params, x, *, train=False, rng=None):
        for i, layer in enumerate(params[:-1]):
            x = jax.nn.relu(x @ layer["w"] + layer["b"])
            if train and rng is not None and dropout > 0:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1 - dropout, x.shape)
                x = jnp.where(keep, x / (1 - dropout), 0.0)
        return x @ params[-1]["w"] + params[-1]["b"]

    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb, rng):
        def loss_fn(p):
            return cross_entropy(forward(p, xb, train=True, rng=rng), yb, ignore_index=None)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng_np = np.random.default_rng(seed)
    for _ in range(epochs):
        order = rng_np.permutation(len(X))
        for start in range(0, len(order), batch_size):
            rows = order[start : start + batch_size]
            key, sub = jax.random.split(key)
            params, opt_state, _ = step(
                params, opt_state, jnp.asarray(X[rows]), jnp.asarray(y[rows]), sub
            )

    logits = np.asarray(forward(params, jnp.asarray(X)))
    y_pred = logits.argmax(axis=1)
    y_proba = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))

    def predict_fn(X_new):
        lg = np.asarray(forward(params, jnp.asarray(np.asarray(X_new, np.float32))))
        import jax.nn as jnn

        return lg.argmax(axis=1), np.asarray(jnn.softmax(jnp.asarray(lg), axis=-1))

    return MLPResult(params, compute_metrics(y, y_pred, y_proba), y_pred, y_proba, predict_fn)


__all__ = [
    "KmerResult",
    "MLPResult",
    "ProbeResult",
    "fit_kmer_logreg",
    "fit_kmer_svm",
    "fit_kmer_xgb",
    "fit_linear_svm",
    "fit_logreg",
    "fit_mlp",
]
