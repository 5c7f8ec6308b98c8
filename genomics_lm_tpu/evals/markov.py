"""Markov perplexity baselines with <SEP> history reset.

Parity: reference ``scripts/eval_ppl_baselines.py`` — additive-smoothed
uniform / unigram / bigram / trigram baselines over (X, Y) packs, PAD
targets skipped, active vocabulary = vocab minus PAD, trigram history reset
across <SEP> boundaries, trigram backoff to the bigram context when unseen.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

PAD_ID = 0
MODEL_NAMES = ("Uniform", "Unigram", "Bigram", "Trigram")


def _iter_examples(xs: np.ndarray, ys: np.ndarray):
    for x, y in zip(xs, ys):
        yield np.asarray(x), np.asarray(y)


def _previous2(x: np.ndarray, position: int, reset_token_ids: frozenset) -> int:
    previous = int(x[position])
    if position == 0 or previous in reset_token_ids:
        return PAD_ID
    return int(x[position - 1])


def fit_baselines(
    xs: np.ndarray,
    ys: np.ndarray,
    vocab_size: int,
    alpha: float = 0.01,
    *,
    reset_token_ids: frozenset = frozenset(),
):
    """Count-based (unigram, bigram, trigram) models over non-PAD targets."""
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    unigram = np.zeros(vocab_size, dtype=np.int64)
    bigram: dict = defaultdict(lambda: np.zeros(vocab_size, dtype=np.int64))
    trigram: dict = defaultdict(lambda: np.zeros(vocab_size, dtype=np.int64))
    for x, y in _iter_examples(xs, ys):
        for position, (previous, target) in enumerate(zip(x, y)):
            previous, target = int(previous), int(target)
            if target == PAD_ID:
                continue
            unigram[target] += 1
            bigram[previous][target] += 1
            previous2 = _previous2(x, position, reset_token_ids)
            trigram[(previous2, previous)][target] += 1
    if int(unigram.sum()) == 0:
        raise ValueError("training dataset has no evaluable non-PAD targets")
    return unigram, dict(bigram), dict(trigram)


def _probability(counts, target: int, alpha: float, active_size: int) -> float:
    total = float(np.asarray(counts)[1:].sum()) if counts is not None else 0.0
    count = float(counts[target]) if counts is not None else 0.0
    return (count + alpha) / (total + alpha * active_size)


def evaluate_baselines(
    xs: np.ndarray,
    ys: np.ndarray,
    counts,
    vocab_size: int,
    alpha: float = 0.01,
    *,
    reset_token_ids: frozenset = frozenset(),
):
    """Per-model NLL/PPL/bits + improvement over the best simple model."""
    unigram, bigram, trigram = counts
    active_size = vocab_size - 1
    nll = {name: 0.0 for name in MODEL_NAMES}
    tokens = 0
    for x, y in _iter_examples(xs, ys):
        for position, (previous, target) in enumerate(zip(x, y)):
            previous, target = int(previous), int(target)
            if target == PAD_ID:
                continue
            tokens += 1
            previous2 = _previous2(x, position, reset_token_ids)
            nll["Uniform"] += math.log(active_size)
            nll["Unigram"] -= math.log(_probability(unigram, target, alpha, active_size))
            nll["Bigram"] -= math.log(
                _probability(bigram.get(previous), target, alpha, active_size)
            )
            tri_counts = trigram.get((previous2, previous))
            if tri_counts is None:
                tri_counts = bigram.get(previous)
            nll["Trigram"] -= math.log(
                _probability(tri_counts, target, alpha, active_size)
            )
    if tokens == 0:
        raise ValueError("test dataset has no evaluable non-PAD targets")
    results = {}
    for name in MODEL_NAMES:
        loss = nll[name] / tokens
        results[name] = {
            "cross_entropy_nats": loss,
            "perplexity": math.exp(loss),
            "bits_per_codon": loss / math.log(2),
        }
    best_name = min(
        (n for n in MODEL_NAMES if n != "Uniform"),
        key=lambda n: results[n]["cross_entropy_nats"],
    )
    best = results[best_name]["cross_entropy_nats"]
    for metrics in results.values():
        metrics["cross_entropy_improvement_over_best_simple"] = (
            best - metrics["cross_entropy_nats"]
        )
    return results, tokens, best_name


__all__ = ["MODEL_NAMES", "evaluate_baselines", "fit_baselines"]
