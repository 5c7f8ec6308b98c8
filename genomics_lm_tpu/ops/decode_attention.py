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

from genomics_lm_tpu.ops.attention import NEG_INF


KERNEL_MAX_BATCH = 128
"""Above this batch the XLA einsum path matches or beats the kernel.

Measured on v5e (10L8H d384, S=256): the kernel wins ≈2× end-to-end at
b≤64 (XLA's per-op overhead across 10 layers of small einsum/softmax
kernels dominates there), while at b256 the step is DMA-bound on the
lane-padded cache (head_dim 48 pads to 128 lanes in every path) and the
einsum chain is equal-or-faster. ``generation.decode`` dispatches on this
threshold."""


def _pick_block_b(B: int, quant: bool) -> int:
    """Largest Mosaic-legal batch block ≤ the measured-best preferred size.

    Bigger batch blocks amortize per-program launch/DMA overhead but cost
    VMEM (the 16 MB scoped limit) and pipelining overlap; the sweet spot
    was measured per cache dtype on v5e (10L8H d384, S=256, b64):
    int8 bb=32 (0.985 → 0.962 ms/step vs bb=8), bf16 bb=8 (1.30 vs 1.42).
    Blocks whose sublane dim is the batch (the mask and scale specs) must
    be 8-divisible or equal to the full batch, so the block is either a
    multiple-of-8 divisor of B or B itself."""
    preferred = 32 if quant else 8
    for b in range(min(preferred, B), 7, -8):
        if B % b == 0 and b % 8 == 0:
            return b
    return B


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
    compute_dtype=None,
) -> jnp.ndarray:
    """Fused single-token attention against layer ``layer`` of the cache.

    q:        (B, Hq, D) query for the one new token, any float dtype.
    k_cache:  (L, B, Hkv, S, D) int8 (quantized) or float cache. Slot-major
              layout: a slot-minor (…, D, S) variant was measured 2.8×
              slower end-to-end — the per-step cache append becomes a
              single-lane strided write across every (8, 128) tile.
    v_cache:  (L, B, Hkv, S, D) same dtype as ``k_cache``.
    mask_add: (B, S) float32 additive mask (0 = attend, NEG_INF = blocked),
              shared across layers; must leave ≥1 finite slot per row.
    layer:    static layer index (block-indexed, no slice copy).
    k_scale/v_scale: (L, Hkv, B, S) float32 per-vector scales when the cache
              is int8, else None. Note the head-major layout — the cache
              stores scales this way so the kernel's per-(block, head) scale
              block has Mosaic-legal trailing (batch, S) dims.

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
    if compute_dtype is None:
        # bf16 operand convert on TPU (half the VPU work and VMEM of f32;
        # int8 cache values are exactly representable), f32 accumulation
        # either way via preferred_element_type — same discipline as the
        # XLA einsum path's cfg.dtype operands
        compute_dtype = jnp.float32 if interpret else jnp.bfloat16
    bb = _pick_block_b(B, quant) if block_b is None else int(block_b)
    inv_sqrt_d = 1.0 / float(D) ** 0.5
    layer = int(layer)

    # The KV head is a grid axis, not an in-kernel loop: one program per
    # (batch-block, head) keeps the VMEM footprint to a single head's cache
    # block (~2.5 MB at bb=8, d48, S=256 — Mosaic's stack allocator does not
    # reuse slots across an unrolled head loop and blows the 16 MB scoped
    # VMEM limit at serving sizes).
    def kernel(*refs):
        if quant:
            q_ref, k_ref, v_ref, ks_ref, vs_ref, mask_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, mask_ref, o_ref = refs
        qh = q_ref[:, 0].astype(compute_dtype)  # (bb, G, D)
        kh = k_ref[0, :, 0].astype(compute_dtype)  # (bb, S, D)
        vh = v_ref[0, :, 0].astype(compute_dtype)
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * inv_sqrt_d  # (bb, G, S)
        if quant:
            s = s * ks_ref[0, 0][:, None, :]
        s = s + mask_ref[...][:, None, :]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if quant:
            p = p * vs_ref[0, 0][:, None, :]
        o_ref[:, 0] = jax.lax.dot_general(
            p.astype(compute_dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (bb, G, D)

    cache_spec = pl.BlockSpec(
        (1, bb, 1, S, D), lambda i, h: (layer, i, h, 0, 0))
    in_specs = [
        pl.BlockSpec((bb, 1, G, D), lambda i, h: (i, h, 0, 0)),
        cache_spec,
        cache_spec,
    ]
    args = [q.reshape(B, Hkv, G, D), k_cache, v_cache]
    if quant:
        # scales are cached as (L, Hkv, B, S): trailing (B, S) dims give a
        # Mosaic-legal (bb, S) block per (batch-block, head) program
        scale_spec = pl.BlockSpec(
            (1, 1, bb, S), lambda i, h: (layer, h, i, 0))
        in_specs += [scale_spec, scale_spec]
        args += [k_scale, v_scale]
    in_specs.append(pl.BlockSpec((bb, S), lambda i, h: (i, 0)))
    args.append(mask_add.astype(jnp.float32))

    out = pl.pallas_call(
        kernel,
        grid=(B // bb, Hkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, 1, G, D), lambda i, h: (i, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), jnp.float32),
        interpret=bool(interpret),
    )(*args)
    return out.reshape(B, Hq, D)


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
    k_all = k_cache[layer].astype(compute_dtype)  # (B, Hkv, S, D)
    v_all = v_cache[layer].astype(compute_dtype)
    scores = jnp.einsum(
        "bhgd,bhsd->bhgs", qg, k_all, preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(D))
    if k_scale is not None:
        scores = scores * k_scale[layer].transpose(1, 0, 2)[:, :, None, :]
    scores = scores + mask_add.astype(jnp.float32)[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale[layer].transpose(1, 0, 2)[:, :, None, :]
    out = jnp.einsum(
        "bhgs,bhsd->bhgd", probs.astype(compute_dtype), v_all,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, Hq, D).astype(jnp.float32)


__all__ = ["NEG_INF", "decode_attention", "decode_attention_xla"]
