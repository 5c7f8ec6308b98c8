"""Multi-task critic losses and class-weight policies.

Parity: reference ``src/protein_lm/train_multi_task.py`` — classification CE
with ignore-index −1 and sqrt-inverse-frequency class weights (max-clamped,
computed on the train split only, ``:77-122``), multi-label BCE with
auto ``pos_weight``, and NaN-masked smooth-L1 stability regression
(``task_losses`` ``:169-191``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genomics_lm_tpu.ops.losses import cross_entropy


def sqrt_inverse_frequency_weights(
    labels: np.ndarray, n_classes: int, *, clamp_max: float = 10.0
) -> np.ndarray:
    """w_c = sqrt(N / count_c), normalized to mean 1, clamped."""
    labels = np.asarray(labels)
    labels = labels[labels >= 0]
    counts = np.bincount(labels, minlength=n_classes).astype(np.float64)
    weights = np.sqrt(labels.size / np.maximum(counts, 1.0))
    weights = weights / max(weights.mean(), 1e-12)
    return np.minimum(weights, clamp_max).astype(np.float32)


def classification_loss(logits, labels, class_weights=None):
    """CE over valid (label >= 0) samples; 0 when none are valid."""
    valid = labels >= 0
    safe = jnp.where(valid, labels, 0)
    loss = cross_entropy(
        logits, safe, ignore_index=None,
        weight=class_weights, valid_mask=valid,
    )
    return jnp.where(jnp.any(valid), loss, 0.0), valid.sum()


def multilabel_bce_loss(logits, targets, pos_weight=None):
    """Mean BCE-with-logits; optional per-class positive weighting."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    pos = targets * log_p
    if pos_weight is not None:
        pos = pos * pos_weight
    return -jnp.mean(pos + (1.0 - targets) * log_not_p)


def auto_pos_weight(targets: np.ndarray, *, clamp_max: float = 20.0) -> np.ndarray:
    """neg/pos ratio per class (torch BCEWithLogitsLoss pos_weight policy)."""
    targets = np.asarray(targets)
    pos = targets.sum(axis=0)
    neg = targets.shape[0] - pos
    return np.minimum(neg / np.maximum(pos, 1.0), clamp_max).astype(np.float32)


def smooth_l1_nan_masked(pred, target, beta: float = 1.0):
    """Smooth-L1 over non-NaN targets; 0 when all targets are NaN."""
    valid = ~jnp.isnan(target)
    t = jnp.where(valid, target, 0.0)
    diff = jnp.abs(pred - t)
    loss = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
    denom = jnp.maximum(valid.sum(), 1)
    return jnp.where(
        jnp.any(valid), jnp.sum(jnp.where(valid, loss, 0.0)) / denom, 0.0
    ), valid.sum()


__all__ = [
    "auto_pos_weight",
    "classification_loss",
    "multilabel_bce_loss",
    "smooth_l1_nan_masked",
    "sqrt_inverse_frequency_weights",
]


# Catalytic motifs whose residues the critic's attention should cover
# (reference train_multi_task.py:580-605; "DXD" is the literal string).
CATALYTIC_MOTIFS = ("GDSGG", "HIGH", "KMSKS", "DXD")


def motif_position_mask(
    sequences, width: int, *, motifs=CATALYTIC_MOTIFS, token_offset: int = 1
) -> np.ndarray:
    """(B, width) float mask of token positions inside known motifs.

    Host-side: motif search is string matching over the raw sequences; the
    mask feeds the jitted saliency term as data. ``token_offset`` accounts
    for the BOS token prepended during tokenization (residue i → token i+1).
    Only each motif's first occurrence counts, matching the reference.
    """
    mask = np.zeros((len(sequences), width), np.float32)
    for row, seq in enumerate(sequences):
        for motif in motifs:
            hit = seq.find(motif)
            if hit < 0:
                continue
            lo = hit + token_offset
            hi = min(lo + len(motif), width)
            if lo < width:
                mask[row, lo:hi] = 1.0
    return mask


def saliency_regularizer(attn_weights, motif_mask):
    """−log of the attention mass on motif positions, averaged over the
    sequences that contain any motif (0.0 when none do).

    Gradients flow only through ``attn_weights`` at motif rows — the mask
    is constant data — so non-motif sequences are untouched.
    """
    attn_weights = attn_weights.astype(jnp.float32)
    motif_mask = motif_mask.astype(jnp.float32)
    has_motif = motif_mask.sum(axis=1) > 0
    mass = (attn_weights * motif_mask).sum(axis=1)
    per_seq = -jnp.log(mass + 1e-8)
    count = has_motif.sum()
    total = jnp.where(has_motif, per_seq, 0.0).sum()
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)
