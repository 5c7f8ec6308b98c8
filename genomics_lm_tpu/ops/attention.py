"""Attention ops: XLA einsum reference path + kernel dispatcher.

The XLA path is the semantic reference (used for parity gates and
interpretability, where per-head attention probabilities are needed); the
Pallas flash kernel (``flash_attention.py``) is the production hot path and
must match it to numerical tolerance.

GQA is computed with grouped einsums — query heads are reshaped to
(kv_head, group) so keys/values are never materialized per-query-head,
unlike the reference's ``repeat_interleave``
(``src/codonlm/model_tiny_gpt.py:94-96``); the math is identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def sdpa_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: jnp.ndarray | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    return_probs: bool = False,
):
    """Scaled dot-product attention via einsum.

    q: (B, Hq, T, D); k, v: (B, Hkv, S, D) with Hq a multiple of Hkv.
    ``mask`` is boolean, broadcastable to (B, Hq, T, S), True = attend. When
    mask is None a causal mask is applied (matching the reference default).
    Softmax in float32 for stability regardless of input dtype.
    """
    B, Hq, T, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    if Hq % Hkv != 0:
        raise ValueError("n_head must be divisible by n_kv_head for GQA")
    G = Hq // Hkv
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, dtype=jnp.float32))

    qg = q.reshape(B, Hkv, G, T, D)
    scores = jnp.einsum("bhgtd,bhsd->bhgts", qg, k, preferred_element_type=jnp.float32)
    scores = scores * scale

    if mask is None:
        pos_t = jnp.arange(T)[:, None] + (S - T)  # align ends for cached decode
        pos_s = jnp.arange(S)[None, :]
        mask = (pos_t >= pos_s)[None, None, :, :]
    mask = jnp.broadcast_to(mask, (B, Hq, T, S)).reshape(B, Hkv, G, T, S)
    scores = jnp.where(mask, scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    probs_out = probs.reshape(B, Hq, T, S) if return_probs else None

    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum(
        "bhgts,bhsd->bhgtd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    out = out.reshape(B, Hq, T, D)
    if return_probs:
        return out, probs_out
    return out


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: jnp.ndarray | None = None,
    segment_ids: jnp.ndarray | None = None,
    attention_window: int | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    impl: str = "xla",
    block_q: int = 128,
    block_k: int = 128,
) -> jnp.ndarray:
    """Dispatch between the XLA reference path and the Pallas flash kernel.

    ``segment_ids``/``attention_window`` are the structured mask inputs the
    flash kernel consumes without materializing (B, T, T); the XLA path
    lowers them to a dense mask here.
    """
    if impl == "flash":
        if mask is not None:
            raise ValueError(
                "impl='flash' consumes structured masks (segment_ids / "
                "attention_window), not a dense mask — pass impl='xla' "
                "or express the mask structurally")
        if q.shape[2] % block_q or k.shape[2] % block_k:
            # sequence lengths off the block grid (e.g. generation-battery
            # scoring of a 304-token sample under 512-wide blocks) reject
            # in Mosaic; these shapes are always small one-off evals, so
            # the XLA path (bit-compatible per the kernel's parity tests)
            # is the right degradation — training shapes stay on-grid
            impl = "xla"
        else:
            from genomics_lm_tpu.ops.flash_attention import flash_attention

            return flash_attention(
                q, k, v,
                segment_ids=segment_ids,
                attention_window=attention_window,
                dropout_rate=dropout_rate,
                dropout_rng=dropout_rng,
                block_q=block_q,
                block_k=block_k,
            )
    if impl != "xla":
        raise ValueError(f"Unknown attention impl: {impl!r}")

    if segment_ids is not None or attention_window is not None:
        T, S = q.shape[2], k.shape[2]
        # bottom-right aligned: with T < S the queries are the suffix of
        # the key sequence (matches flash_attention and sdpa_xla)
        q_pos = jnp.arange(T) + (S - T)
        k_pos = jnp.arange(S)
        distance = q_pos[:, None] - k_pos[None, :]
        causal = distance >= 0
        if attention_window is not None:
            causal = causal & (distance < int(attention_window))
        dense = causal[None, None, :, :]
        if segment_ids is not None:
            seg_eq = segment_ids[:, S - T:, None] == segment_ids[:, None, :]
            dense = dense & seg_eq[:, None, :, :]
        mask = dense if mask is None else (mask & dense)
    return sdpa_xla(
        q, k, v, mask=mask, dropout_rate=dropout_rate, dropout_rng=dropout_rng
    )


__all__ = ["attention", "sdpa_xla", "NEG_INF"]
