"""Loss functions with exact PyTorch cross-entropy semantics, in float32.

The parity-critical op is ``cross_entropy``: the reference computes
``F.cross_entropy(logits.float(), targets, ignore_index=0,
label_smoothing=eps, weight=w)`` (``src/codonlm/model_tiny_gpt.py:343-349``),
whose reduction is a *weighted* mean — each sample scaled by the weight of
its true class, divided by the sum of those weights over non-ignored samples.
With label smoothing the target distribution is
``(1 - eps) * one_hot + eps / C`` but the sample weight is still indexed by
the hard label. All reductions here run in float32 regardless of activation
dtype, matching the reference's ``.float()`` upcast.

Also provides the multi-offset and termination auxiliary objectives
(parity: ``src/codonlm/training/objectives.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PAD_ID = 0
DEFAULT_BOUNDARY_IDS = (2, 3)  # <EOS_CDS>, <SEP>


def cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    *,
    ignore_index: int | None = PAD_ID,
    label_smoothing: float = 0.0,
    weight: jnp.ndarray | None = None,
    valid_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Torch-semantics mean cross-entropy over flattened positions.

    logits: (..., C); targets: (...) int. ``valid_mask`` (same shape as
    targets) composes with ``ignore_index`` — both exclude positions from
    numerator and denominator.
    """
    numer, denom = cross_entropy_parts(
        logits, targets, ignore_index=ignore_index,
        label_smoothing=label_smoothing, weight=weight, valid_mask=valid_mask,
    )
    return numer / jnp.maximum(denom, 1e-12)


def cross_entropy_parts(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    *,
    ignore_index: int | None = PAD_ID,
    label_smoothing: float = 0.0,
    weight: jnp.ndarray | None = None,
    valid_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(numerator, denominator) of the weighted-mean cross-entropy.

    The decomposed form of :func:`cross_entropy`: summing the parts over
    microbatches/shards and dividing once reproduces the whole-batch mean
    exactly (mean-of-means does not, when pad counts differ per shard).
    Used by the pipeline-parallel schedule (`parallel/pipeline.py`), whose
    per-tick losses must accumulate without changing the reduction.
    """
    C = logits.shape[-1]
    logits = logits.astype(jnp.float32).reshape(-1, C)
    targets = targets.reshape(-1)

    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
    nll = logz - true_logit
    eps = float(label_smoothing)

    if weight is not None:
        w_cls = jnp.asarray(weight, dtype=jnp.float32)
        w = w_cls[targets]
    else:
        w_cls = None
        w = jnp.ones_like(nll)

    # torch semantics: per-sample loss_i = -Σ_j q_j · w_j · log p_j with the
    # target distribution q = (1-eps)·one_hot + eps/C. The per-class weight
    # multiplies *inside* the smoothing sum, while the mean reduction always
    # divides by Σ_i w_{y_i} over non-ignored samples.
    if eps > 0.0:
        if w_cls is None:
            smooth = logz - jnp.mean(logits, axis=-1)
            loss = (1.0 - eps) * nll + eps * smooth
        else:
            C_f = float(C)
            smooth = (logz * jnp.sum(w_cls) - logits @ w_cls) / C_f
            loss = (1.0 - eps) * w * nll + eps * smooth
            w = jnp.ones_like(nll)  # weights already folded into loss
    else:
        loss = nll

    valid = jnp.ones_like(targets, dtype=jnp.bool_)
    if ignore_index is not None:
        valid &= targets != ignore_index
    if valid_mask is not None:
        valid &= valid_mask.reshape(-1)

    # denominator is always Σ w_{y_i} over valid samples
    if w_cls is not None:
        denom = jnp.sum(jnp.where(valid, w_cls[targets], 0.0))
    else:
        denom = jnp.sum(valid.astype(jnp.float32))
    numer = jnp.sum(jnp.where(valid, loss * w, 0.0))
    return numer, denom


def offset_target_mask(
    yb: jnp.ndarray, offset: int, boundary_ids=DEFAULT_BOUNDARY_IDS
) -> jnp.ndarray:
    """Valid positions for predicting seq[t + offset] from logits at t.

    A target is invalid if it is PAD or if reaching it from t would cross an
    earlier EOS/SEP boundary (the target being a boundary is allowed).
    Parity: reference ``objectives.py:6-23``. Returns (B, T - offset + 1) bool.
    """
    if offset < 1:
        raise ValueError("offset must be >= 1")
    B, T = yb.shape
    if offset > T:
        return jnp.zeros((B, 0), dtype=jnp.bool_)
    target = yb[:, offset - 1 :]
    valid = target != PAD_ID
    boundary = jnp.zeros_like(yb, dtype=jnp.bool_)
    for bid in boundary_ids:
        boundary |= yb == int(bid)
    width = target.shape[1]
    for shift in range(offset - 1):
        valid &= ~boundary[:, shift : shift + width]
    return valid


def multi_offset_lm_loss(
    logits,
    yb: jnp.ndarray,
    offset_weights: dict[int, float],
    *,
    label_smoothing: float = 0.0,
    loss_weights: jnp.ndarray | None = None,
    boundary_ids=DEFAULT_BOUNDARY_IDS,
):
    """Weighted sum of per-offset CE losses over boundary-respecting targets.

    ``logits`` is either a single (B, T, C) array (shared head) or a dict
    ``{offset: (B, T, C)}`` from per-offset heads. Offsets <= 1 or beyond the
    sequence are skipped. Parity: reference ``objectives.py:26-60``; the
    jit-friendly difference is that empty masks contribute 0 via masking
    rather than a Python ``continue``.
    """
    total = jnp.float32(0.0)
    losses: dict[int, jnp.ndarray] = {}
    T = yb.shape[1]
    for offset, weight in sorted(offset_weights.items()):
        if weight == 0.0 or offset <= 1 or offset > T:
            continue
        target = yb[:, offset - 1 :]
        if isinstance(logits, dict):
            if offset not in logits:
                continue
            pred = logits[offset][:, : target.shape[1], :]
        else:
            pred = logits[:, : target.shape[1], :]
        valid = offset_target_mask(yb, offset, boundary_ids=boundary_ids)
        has_any = jnp.any(valid)
        offset_loss = cross_entropy(
            pred,
            target,
            ignore_index=PAD_ID,
            label_smoothing=label_smoothing,
            weight=loss_weights,
            valid_mask=valid,
        )
        offset_loss = jnp.where(has_any, offset_loss, 0.0)
        losses[offset] = offset_loss
        total = total + float(weight) * offset_loss
    return total, losses


def termination_distance_bucket_labels(
    yb: jnp.ndarray,
    stop_ids: tuple[int, ...],
    bucket_edges: tuple[int, ...] = (0, 3, 10, 30),
    ignore_index: int = -100,
) -> jnp.ndarray:
    """Bucket each position's distance to the next stop token.

    Vectorized flip-cummin formulation (parity: reference
    ``objectives.py:63-91``): positions after the last stop get the final
    bucket; PAD positions get ``ignore_index``.
    """
    if not stop_ids:
        raise ValueError("stop_ids must not be empty")
    if tuple(bucket_edges) != tuple(sorted(bucket_edges)):
        raise ValueError("bucket_edges must be sorted")
    B, T = yb.shape
    positions = jnp.broadcast_to(jnp.arange(T), (B, T))
    stop_mask = jnp.isin(yb, jnp.asarray(stop_ids, dtype=yb.dtype))
    stop_positions = jnp.where(stop_mask, positions, T)
    # next stop at or after each position: reversed running minimum
    next_stop = jnp.flip(
        jax.lax.cummin(jnp.flip(stop_positions, axis=1), axis=1), axis=1
    )
    distances = next_stop - positions
    edges = jnp.asarray(bucket_edges, dtype=distances.dtype)
    labels = jnp.sum(distances[:, :, None] > edges[None, None, :], axis=-1)
    labels = jnp.where(next_stop == T, len(bucket_edges), labels)
    return jnp.where(yb == PAD_ID, ignore_index, labels)


def termination_aux_loss(
    termination_logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
    ignore_index: int = -100,
) -> jnp.ndarray:
    """f32 CE over bucket labels, ignoring ``ignore_index`` positions."""
    # Clamp ignored labels into range before gather; they are masked out.
    safe = jnp.where(labels == ignore_index, 0, labels)
    return cross_entropy(
        termination_logits,
        safe,
        ignore_index=None,
        weight=class_weights,
        valid_mask=labels != ignore_index,
    )


__all__ = [
    "DEFAULT_BOUNDARY_IDS",
    "PAD_ID",
    "cross_entropy",
    "cross_entropy_parts",
    "multi_offset_lm_loss",
    "offset_target_mask",
    "termination_aux_loss",
    "termination_distance_bucket_labels",
]
