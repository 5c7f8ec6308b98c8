"""Model perplexity evaluation over packed splits (manifest-aware).

Parity: reference ``src/codonlm/eval_perplexity.py`` and the fuller
``scripts/evaluate_test.py`` — token-weighted corpus NLL/PPL over the
non-PAD targets of a packed NPZ split, jitted batch evaluation, optional
Markov-baseline comparison and context-window ablations
(``docs/CORRECTED_PRIMARY_INTRINSIC_EVALUATION.md:84-97``).
"""

from __future__ import annotations

import functools
import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from genomics_lm_tpu.data.datasets import EpochPlan, PackedDataset
from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt


@functools.partial(jax.jit, static_argnums=(1, 3))
def _batch_nll_sums(params, cfg: CodonGPTConfig, batch, attention_window):
    """(sum of per-token NLL over non-PAD targets, token count)."""
    x, y = batch
    logits, _ = codon_gpt.forward(params, cfg, x, attention_window=attention_window)
    logits = logits.astype(jnp.float32)
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(logits, y[..., None], axis=-1)[..., 0]
    nll = logz - true_logit
    valid = y != 0
    return jnp.sum(jnp.where(valid, nll, 0.0)), jnp.sum(valid)


def evaluate_perplexity(
    params,
    cfg: CodonGPTConfig,
    dataset: PackedDataset | str | Path,
    *,
    batch_size: int = 64,
    attention_window: int | None = None,
) -> dict:
    """Exact corpus NLL/PPL on a packed split."""
    if not isinstance(dataset, PackedDataset):
        dataset = PackedDataset(dataset)
    plan = EpochPlan(dataset, batch_size=batch_size, seed=0, epoch=0, shuffle=False)
    nll_sum = 0.0
    tokens = 0
    for x, y in plan.microbatches():
        if x.shape[0] == 0:
            continue
        s, n = _batch_nll_sums(
            params, cfg, (jnp.asarray(x), jnp.asarray(y)), attention_window
        )
        nll_sum += float(s)
        tokens += int(n)
    nll = nll_sum / max(tokens, 1)
    return {
        "nll": nll,
        "perplexity": math.exp(min(nll, 50.0)),
        "bits_per_codon": nll / math.log(2),
        "tokens": tokens,
        "attention_window": attention_window,
    }


@functools.partial(jax.jit, static_argnums=(1, 3))
def _per_row_nll_sums(params, cfg: CodonGPTConfig, batch, attention_window):
    """Per-row (sum of per-token NLL over non-PAD targets, token count)."""
    x, y = batch
    logits, _ = codon_gpt.forward(params, cfg, x, attention_window=attention_window)
    logits = logits.astype(jnp.float32)
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(logits, y[..., None], axis=-1)[..., 0]
    nll = logz - true_logit
    valid = y != 0
    return (
        jnp.sum(jnp.where(valid, nll, 0.0), axis=1),
        jnp.sum(valid, axis=1),
    )


def per_row_model_nll(
    params,
    cfg: CodonGPTConfig,
    dataset: PackedDataset | str | Path,
    *,
    batch_size: int = 64,
    attention_window: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-packed-row (NLL sum, token count) in dataset row order.

    The resampling unit for the paired bootstrap (``evals.significance``):
    pairs positionally with ``markov.per_row_baseline_nll`` because both
    walk the split in dataset row order.
    """
    if not isinstance(dataset, PackedDataset):
        dataset = PackedDataset(dataset)
    pad_to = None if not dataset.is_dynamic else int(dataset.seq_lengths.max())
    sums = np.zeros(len(dataset), dtype=np.float64)
    toks = np.zeros(len(dataset), dtype=np.int64)
    for lo in range(0, len(dataset), batch_size):
        idx = list(range(lo, min(lo + batch_size, len(dataset))))
        x, y = dataset.fetch_batch(idx, pad_to=pad_to)
        s, n = _per_row_nll_sums(
            params, cfg, (jnp.asarray(x), jnp.asarray(y)), attention_window
        )
        sums[lo : lo + len(idx)] = np.asarray(s, dtype=np.float64)
        toks[lo : lo + len(idx)] = np.asarray(n, dtype=np.int64)
    return sums, toks


def context_ablation(
    params, cfg: CodonGPTConfig, dataset, windows=(1, 2, 4, None), **kwargs
) -> dict:
    """Test NLL by attention window (parity: context ablation suite)."""
    return {
        str(w if w is not None else "full"): evaluate_perplexity(
            params, cfg, dataset, attention_window=w, **kwargs
        )
        for w in windows
    }


__all__ = ["context_ablation", "evaluate_perplexity", "per_row_model_nll"]
