"""Pallas TPU fused decode attention: one-token queries vs the KV cache.

Decode at serving batch sizes is bound by reading the KV cache from HBM
every step (docs/BENCHMARKS.md "Decode"). The XLA einsum path performs the
score/softmax/value chain as separate fusions over the cache; with an int8
cache (``ops/quant.py``) the int8→bf16 operand convert is not guaranteed to
fuse into the dots, which can re-materialize full-size cache temporaries and
forfeit most of the bandwidth win. This kernel performs the whole chain —
dequant-on-load, q·K scores, scale fold-in, masked softmax, probability·V —
in VMEM in one pass, so HBM traffic per step is exactly one read of the
(int8 or bf16) cache block.

Shapes follow the cached decode layout (``generation/decode.py``): the
caches stay stacked as (L, B, Hkv, S, D) and the kernel block-indexes the
layer statically, so no per-layer slice copy is made. The mask is a single
additive (B, S) f32 row shared by every layer (validity ∧ same-segment ∨
self-slot — decode semantics from ``_decode_step_impl``). Softmax is a
plain single-pass VMEM softmax: the whole S axis is resident, so no online
rescaling is needed (unlike ``flash_attention.py``).

Per-vector int8 scales factor out of both contractions exactly as in the
XLA path: ``q·(k_q s_k) = s_k (q·k_q)`` applied to the (G, S) scores and
``Σ p (v_q s_v) = Σ (p s_v) v_q`` applied to the probabilities, so the int8
cache is never dequantized into a full-precision temporary — here not even
in VMEM: the int8 blocks are converted tile-by-tile as dot operands.

No reference analog (the reference decodes cache-free in full precision,
``generate.py:13-27``); this is TPU-serving headroom on top of parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _pick_block_b(B: int, preferred: int = 8) -> int:
    """Largest divisor of B not exceeding ``preferred`` (VMEM budget)."""
    for b in range(min(preferred, B), 0, -1):
        if B % b == 0:
            return b
    return 1


def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    mask_add: jnp.ndarray,
    layer: int,
    k_scale: jnp.ndarray | None = None,
    v_scale: jnp.ndarray | None = None,
    *,
    block_b: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused single-token attention against layer ``layer`` of the cache.

    q:        (B, Hq, D) query for the one new token, any float dtype.
    k_cache:  (L, B, Hkv, S, D) int8 (quantized) or float cache.
    v_cache:  (L, B, Hkv, S, D) same dtype as ``k_cache``.
    mask_add: (B, S) float32 additive mask (0 = attend, NEG_INF = blocked),
              shared across layers; must leave ≥1 finite slot per row.
    layer:    static layer index (block-indexed, no slice copy).
    k_scale/v_scale: (L, B, Hkv, S) float32 per-vector scales when the cache
              is int8, else None.

    Returns (B, Hq, D) float32.
    """
    B, Hq, D = q.shape
    L, _, Hkv, S, _ = k_cache.shape
    if Hq % Hkv != 0:
        raise ValueError("n_head must be divisible by n_kv_head for GQA")
    G = Hq // Hkv
    quant = k_scale is not None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bb = _pick_block_b(B) if block_b is None else int(block_b)
    inv_sqrt_d = 1.0 / float(D) ** 0.5
    layer = int(layer)

    def kernel(*refs):
        if quant:
            q_ref, k_ref, v_ref, ks_ref, vs_ref, mask_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, mask_ref, o_ref = refs
        qf = q_ref[...].astype(jnp.float32).reshape(bb, Hkv, G, D)
        mask = mask_ref[...]  # (bb, S) f32 additive
        for h in range(Hkv):
            kh = k_ref[0, :, h].astype(jnp.float32)  # (bb, S, D)
            vh = v_ref[0, :, h].astype(jnp.float32)
            qh = qf[:, h]  # (bb, G, D)
            s = jax.lax.dot_general(
                qh, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * inv_sqrt_d  # (bb, G, S)
            if quant:
                s = s * ks_ref[0, :, h][:, None, :]
            s = s + mask[:, None, :]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            if quant:
                p = p * vs_ref[0, :, h][:, None, :]
            o = jax.lax.dot_general(
                p, vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (bb, G, D)
            o_ref[:, h * G:(h + 1) * G, :] = o

    cache_spec = pl.BlockSpec(
        (1, bb, Hkv, S, D), lambda i: (layer, i, 0, 0, 0))
    in_specs = [
        pl.BlockSpec((bb, Hq, D), lambda i: (i, 0, 0)),
        cache_spec,
        cache_spec,
    ]
    args = [q, k_cache, v_cache]
    if quant:
        scale_spec = pl.BlockSpec((1, bb, Hkv, S), lambda i: (layer, i, 0, 0))
        in_specs += [scale_spec, scale_spec]
        args += [k_scale, v_scale]
    in_specs.append(pl.BlockSpec((bb, S), lambda i: (i, 0)))
    args.append(mask_add.astype(jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, Hq, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), jnp.float32),
        interpret=bool(interpret),
    )(*args)


def decode_attention_xla(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    mask_add: jnp.ndarray,
    layer: int,
    k_scale: jnp.ndarray | None = None,
    v_scale: jnp.ndarray | None = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Semantic reference for the kernel (einsum path, same signature).

    Used by parity tests and as the non-TPU fallback; mirrors the inline
    einsum chain previously embedded in ``_decode_step_impl``.
    """
    B, Hq, D = q.shape
    Hkv, S = k_cache.shape[2], k_cache.shape[3]
    G = Hq // Hkv
    qg = q.astype(compute_dtype).reshape(B, Hkv, G, D)
    k_all = k_cache[layer].astype(compute_dtype)
    v_all = v_cache[layer].astype(compute_dtype)
    scores = jnp.einsum(
        "bhgd,bhsd->bhgs", qg, k_all, preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(D))
    if k_scale is not None:
        scores = scores * k_scale[layer][:, :, None, :]
    scores = scores + mask_add.astype(jnp.float32)[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale[layer][:, :, None, :]
    out = jnp.einsum(
        "bhgs,bhsd->bhgd", probs.astype(compute_dtype), v_all,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, Hq, D).astype(jnp.float32)


__all__ = ["NEG_INF", "decode_attention", "decode_attention_xla"]
