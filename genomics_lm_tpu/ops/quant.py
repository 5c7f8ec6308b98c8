"""Int8 quantization for serving: weight-only linears and the KV cache.

Decode at serving batch sizes is HBM-bandwidth-bound (docs/BENCHMARKS.md):
every step reads all model weights and the whole KV cache. Storing both as
int8 halves those bytes. Two schemes, both symmetric:

- **Weight-only int8** (``quantize_params``): per-output-channel scales on
  every block linear (QKV, attn proj, MLP). The matmul runs in the
  activation dtype — XLA fuses the int8→bf16 convert into the dot's operand
  load, so the win is purely the halved weight traffic. Embeddings, layer
  norms, and the LM head stay full precision (the tied head feeds the
  softmax directly).
- **Int8 KV cache** (``quantize_kv``, used by ``generation.decode``):
  per-vector scales over the head dim. The scales factor OUT of both
  attention contractions — ``q·(k_q·s_k) = s_k·(q·k_q)`` per cached
  position, and ``Σ p·(v_q·s_v) = Σ (p·s_v)·v_q`` — so attention reads the
  raw int8 cache and applies scales to the (B,H,G,S) score/prob tensors,
  never materializing a dequantized cache.

No reference analog: the reference decodes cache-free in full precision
(``generate.py:13-27``); this is TPU-serving headroom on top of parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INT8_MAX = 127.0
_EPS = 1e-8


def quantize_weight(w: jnp.ndarray) -> dict:
    """Symmetric per-output-channel int8 quantization of a linear weight.

    ``w``: (..., fan_in, fan_out) — scales are per trailing (output)
    channel, reduced over fan_in. Returns ``{"w_q": int8, "scale": f32}``
    with ``w ≈ w_q * scale``.
    """
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # (..., 1, out)
    scale = jnp.maximum(amax, _EPS) / INT8_MAX
    w_q = jnp.clip(jnp.round(w / scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return {"w_q": w_q, "scale": jnp.squeeze(scale, axis=-2).astype(jnp.float32)}


def dequantize_weight(q: dict) -> jnp.ndarray:
    return q["w_q"].astype(jnp.float32) * q["scale"][..., None, :]


def _quantize_linear_tree(p: dict) -> dict:
    out = quantize_weight(p["w"])
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_params(params: dict) -> dict:
    """Quantize every transformer-block linear to int8 (weights only).

    Operates on the stacked (L, fan_in, fan_out) block weights; embeddings,
    layer norms, and heads are kept full precision. The returned tree is
    consumed transparently by ``models.codon_gpt`` (``_linear`` dispatches
    on the ``w_q`` key) and by the cached decode path.

    Fails closed on unmerged LoRA checkpoints: ``_quantize_linear_tree``
    rebuilds each linear from ``w``/``b`` only, which would silently drop
    trained ``lora_a``/``lora_b`` factors and serve the pretrained base
    model (the mirror of the attach-side int8 guard in ``training/lora.py``).
    """
    from genomics_lm_tpu.training.lora import has_lora

    if has_lora(params):
        raise ValueError(
            "cannot int8-quantize an unmerged LoRA checkpoint — the adapter "
            "factors would be silently dropped; fold them into the dense "
            "weights first (scripts/merge_lora.py or training.lora.merge_lora)"
        )
    params = dict(params)
    blocks = {k: dict(v) for k, v in params["blocks"].items()}

    blocks["attn"] = {
        name: _quantize_linear_tree(p) for name, p in blocks["attn"].items()
    }
    if "router" not in blocks:
        # MoE expert weights run through the dispatch einsums, not _linear —
        # they (and the router) stay full precision; attention still
        # quantizes, so MoE models compose with --int8_weights serving.
        blocks["mlp"] = {
            name: _quantize_linear_tree(p) for name, p in blocks["mlp"].items()
        }
    params["blocks"] = blocks
    return params


def quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-vector symmetric int8 quantization over the trailing head dim.

    ``x``: (..., head_dim). Returns ``(x_q int8, scale f32 (...,))`` with
    ``x ≈ x_q * scale[..., None]``.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, _EPS) / INT8_MAX
    x_q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -INT8_MAX, INT8_MAX
    ).astype(jnp.int8)
    return x_q, scale


__all__ = [
    "INT8_MAX",
    "dequantize_weight",
    "quantize_kv",
    "quantize_params",
    "quantize_weight",
]
