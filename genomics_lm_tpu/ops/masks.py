"""Attention mask builders: causal, <SEP>-segment, and local-window.

Semantics parity with reference ``TinyGPT.build_attention_mask``
(``src/codonlm/model_tiny_gpt.py:273-295``): position i may attend to j iff

    j <= i                                   (causal)
    and i - j < attention_window             (optional local window)
    and segment(i) == segment(j)             (optional <SEP> segmentation,
                                              segment = cumsum(idx == sep_id))

Masks are boolean (True = attend). For the packed-training hot path prefer
passing ``segment_ids`` to the attention op directly — the Pallas kernel
applies the same predicate inline without materializing (B, T, T).
"""

from __future__ import annotations

import jax.numpy as jnp


def segment_ids_from_tokens(idx: jnp.ndarray, sep_id: int) -> jnp.ndarray:
    """Segment labels via running count of <SEP> tokens. (B, T) int32.

    The <SEP> token itself closes a segment boundary exactly as the
    reference's ``cumsum(idx == sep_id)`` does: the SEP position belongs to
    the *following* segment.
    """
    return jnp.cumsum((idx == sep_id).astype(jnp.int32), axis=-1)


def build_attention_mask(
    idx: jnp.ndarray,
    *,
    sep_id: int | None,
    attention_window: int | None = None,
) -> jnp.ndarray | None:
    """Boolean (B, 1, T, T) mask, or None when only plain causality applies."""
    if attention_window is not None and int(attention_window) < 1:
        raise ValueError("attention_window must be at least 1")
    if sep_id is None and attention_window is None:
        return None
    T = idx.shape[-1]
    positions = jnp.arange(T)
    distance = positions[:, None] - positions[None, :]
    causal = distance >= 0
    if attention_window is not None:
        causal = causal & (distance < int(attention_window))
    mask = causal[None, None, :, :]
    if sep_id is not None:
        seg = segment_ids_from_tokens(idx, int(sep_id))
        mask = mask & (seg[:, :, None] == seg[:, None, :])[:, None, :, :]
    return mask


def causal_mask(T: int) -> jnp.ndarray:
    """Plain (1, 1, T, T) lower-triangular boolean mask."""
    positions = jnp.arange(T)
    return (positions[:, None] >= positions[None, :])[None, None, :, :]
