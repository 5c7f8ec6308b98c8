"""Pallas TPU fused decode attention over the packed-lane KV cache.

Decode at serving batch sizes is bound by reading the KV cache from HBM
every step (docs/BENCHMARKS.md "Decode"). Two design decisions follow:

**Packed-lane cache layout.** Caches are stored as (L, B, S, P) with
``P = Hkv * head_dim`` packed into the lane (minor) dimension — at d384
that is P = 384 = 3×128 exact lanes. The head-split layout
(L, B, Hkv, S, D) used through round 2 padded D=48 to 128 lanes in every
HBM tile, taxing each cache read (and write) 2.67× in DMA bytes; decode
is DMA-bound, so that tax was the step time. Measured on v5e (10-layer
attention chain, d384, S=256): int8 b64 1.99 → 0.95 ms, int8 b256
5.99 → 1.72 ms, bf16 b256 10.34 → 2.36 ms.

**Block-diagonal query routing.** A packed (S, P) cache row holds every
head's K for one position, so per-head scores cannot come from a plain
q·K contraction. Instead the (B, Hq, D) query enters as a routing matrix
``qmat (B, P, Hq)`` that is block-diagonal: column h is zero except for
rows [(h//G)·D, (h//G+1)·D). One MXU matmul per batch block then yields
all heads' scores at once — ``s (Hq, S) = qmatᵀ · khᵀ`` — with no
cross-head contamination (the zero blocks annihilate other heads'
lanes). The wasted MAC work (G·Hkv× the minimal FLOPs) is free: decode
attention runs at <1% MXU utilization and the MXU would otherwise idle
on DMA. The PV product ``p (Hq, S) · vh (S, P)`` similarly produces a
(Hq, P) block whose only meaningful band is head h's (h//G)-th D-slice;
``extract_heads`` gathers that band outside the kernel (a (B, Hq, P)
f32 array — trivial next to the cache traffic).

Per-vector int8 scales (layout (L, B, Hkv, S)) factor out of both
contractions exactly: ``q·(k_q s_k) = s_k (q·k_q)`` applied on the
(Hq, S) scores and ``Σ p (v_q s_v) = Σ (p s_v) v_q`` applied on the
probabilities — the int8 cache is never dequantized into a full-size
temporary, not even in VMEM.

The mask is a single additive (B, S) f32 row shared by every layer
(validity ∧ same-segment ∨ self-slot — decode semantics from
``generation/decode._decode_step_impl``). Softmax is a plain single-pass
VMEM softmax over the lane axis: the whole S axis is resident, so no
online rescaling is needed (unlike ``flash_attention.py``).

No reference analog (the reference decodes cache-free in full precision,
``generate.py:13-27``); this is TPU-serving headroom on top of parity.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomics_lm_tpu.ops.attention import NEG_INF


KERNEL_MAX_BATCH = 1024
"""Batch cap for the fused kernel; above it the XLA einsum path runs.

With the packed-lane cache the kernel matched or beat the einsum chain at
every measured batch (b64/b256, bf16/int8) — this cap is a safety valve
for untested extreme batches, not a measured crossover (the head-split
kernel's b128 crossover no longer applies)."""


def _pick_block_b(B: int) -> int:
    """Largest Mosaic-legal batch block ≤ the measured-best preferred size.

    bb=8 measured best for the packed kernel at b64 and b256, int8 and
    bf16 (bigger blocks cost VMEM and pipelining overlap without reducing
    per-byte DMA). Blocks whose sublane dim is the batch (the mask spec)
    must be 8-divisible or equal to the full batch, so the block is either
    a multiple-of-8 divisor of B or B itself."""
    preferred = int(os.environ.get("GLMTPU_DECODE_BLOCK_B", "0")) or 8
    for b in range(min(preferred, B), 7, -8):
        if B % b == 0 and b % 8 == 0:
            return b
    return B


def pack_query(q: jnp.ndarray, kv_heads: int) -> jnp.ndarray:
    """(B, Hq, D) query → block-diagonal routing matrix (B, P, Hq).

    Column h of the result carries q[b, h] in rows
    [(h//G)·D, (h//G+1)·D) and zeros elsewhere; contracting the packed
    (S, P) cache with it yields every head's scores in one matmul."""
    B, Hq, D = q.shape
    G = Hq // kv_heads
    h = jnp.arange(Hq)[:, None, None]
    d = jnp.arange(D)[None, :, None]
    p = jnp.arange(kv_heads * D)[None, None, :]
    route = ((h // G) * D + d == p).astype(q.dtype)  # (Hq, D, P)
    return jnp.einsum("bhd,hdp->bph", q, route)


def extract_heads(out: jnp.ndarray, kv_heads: int) -> jnp.ndarray:
    """(B, Hq, P) raw PV block → (B, Hq, D): keep head h's own band."""
    B, Hq, Pp = out.shape
    D = Pp // kv_heads
    G = Hq // kv_heads
    out4 = out.reshape(B, Hq, kv_heads, D)
    h = jnp.arange(Hq)
    return out4[:, h, h // G, :]


def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    mask_add: jnp.ndarray,
    layer: int,
    k_scale: jnp.ndarray | None = None,
    v_scale: jnp.ndarray | None = None,
    *,
    kv_heads: int | None = None,
    block_b: int | None = None,
    interpret: bool | None = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Fused single-token attention against layer ``layer`` of the cache.

    q:        (B, Hq, D) query for the one new token, any float dtype.
    k_cache:  (L, B, S, P) int8 (quantized) or float packed cache,
              P = kv_heads * D. Position-major: the per-step append is one
              contiguous (B, P) lane-row write.
    v_cache:  (L, B, S, P) same dtype as ``k_cache``.
    mask_add: (B, S) float32 additive mask (0 = attend, NEG_INF = blocked),
              shared across layers; must leave ≥1 finite slot per row.
    layer:    static layer index (block-indexed, no slice copy).
    k_scale/v_scale: (L, B, Hkv, S) float32 per-vector scales when the
              cache is int8, else None — blocks carry Mosaic-legal
              (Hkv sublane, S lane) trailing dims.
    kv_heads: number of packed KV heads; inferred from the scale shape
              when quantized, else assumed = Hq (pass explicitly for a
              float GQA cache).

    Returns (B, Hq, D) float32.
    """
    B, Hq, D = q.shape
    S = k_cache.shape[2]
    quant = k_scale is not None
    if kv_heads is None:
        kv_heads = k_scale.shape[2] if quant else Hq
    Hkv = kv_heads
    if Hq % Hkv != 0:
        raise ValueError("n_head must be divisible by n_kv_head for GQA")
    G = Hq // Hkv
    P = Hkv * D
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if compute_dtype is None:
        # bf16 operand convert on TPU (half the VPU work and VMEM of f32;
        # int8 cache values are exactly representable), f32 accumulation
        # either way via preferred_element_type
        compute_dtype = jnp.float32 if interpret else jnp.bfloat16
    bb = _pick_block_b(B) if block_b is None else int(block_b)
    inv_sqrt_d = 1.0 / float(D) ** 0.5
    layer = int(layer)

    qmat = pack_query(q.astype(compute_dtype), Hkv)  # (B, P, Hq)

    def kernel(*refs):
        if quant:
            q_ref, k_ref, v_ref, ks_ref, vs_ref, mask_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, mask_ref, o_ref = refs
        qh = q_ref[...].astype(compute_dtype)      # (bb, P, Hq)
        kh = k_ref[0].astype(compute_dtype)        # (bb, S, P)
        vh = v_ref[0].astype(compute_dtype)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * inv_sqrt_d                             # (bb, Hq, S)
        if quant:
            ks = ks_ref[0]                         # (bb, Hkv, S)
            if G > 1:
                ks = jnp.repeat(ks, G, axis=1)
            s = s * ks
        s = s + mask_ref[...][:, None, :]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if quant:
            vs = vs_ref[0]
            if G > 1:
                vs = jnp.repeat(vs, G, axis=1)
            p = p * vs
        o_ref[...] = jax.lax.dot_general(
            p.astype(compute_dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                          # (bb, Hq, P)

    cache_spec = pl.BlockSpec((1, bb, S, P), lambda i: (layer, i, 0, 0))
    in_specs = [
        pl.BlockSpec((bb, P, Hq), lambda i: (i, 0, 0)),
        cache_spec,
        cache_spec,
    ]
    args = [qmat, k_cache, v_cache]
    if quant:
        scale_spec = pl.BlockSpec((1, bb, Hkv, S), lambda i: (layer, i, 0, 0))
        in_specs += [scale_spec, scale_spec]
        args += [k_scale, v_scale]
    in_specs.append(pl.BlockSpec((bb, S), lambda i: (i, 0)))
    args.append(mask_add.astype(jnp.float32))

    out = pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, Hq, P), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, P), jnp.float32),
        interpret=bool(interpret),
    )(*args)
    return extract_heads(out, Hkv)


_STREAM_VMEM_BUDGET = 8 * 1024 * 1024
"""Bytes allowed for the streamed kernel's 2-slot K+V VMEM ring.

The Mosaic scoped-VMEM limit is 16 MB and the ring shares it with the
(bb, Hq, P) f32 accumulator + output, the routed query, the mask row and
compiler temporaries — a 12 MB ring measured 19.0 MB total and OOM'd at
compile; 8 MB leaves the headroom the rest needs (bb=16 bf16 / 32 int8
at sb=128, P=384)."""


def _largest_divisor(n: int, cap: int, mult: int) -> int:
    """Largest divisor of ``n`` that is ≤ cap and a multiple of ``mult``.

    Falls back to ``n`` itself when no such divisor exists (tiny or odd
    axes — the whole axis then runs as one block)."""
    for d in range(min(cap, n), 0, -1):
        if n % d == 0 and d % mult == 0:
            return d
    return n


def _pick_stream_blocks(
    B: int, S: int, P: int, esize: int,
    block_b: int | None, block_s: int | None,
) -> tuple[int, int]:
    """(bb, sb) for the streamed kernel under the VMEM ring budget.

    The whole point of the streamed variant is FEW programs (per-program
    launch overhead was the measured residual at large batch — see the
    module docstring), so sb stays at one 128-lane chunk and bb takes
    every byte the ring budget allows. sb MUST be a multiple of 128 on
    hardware: the kernel's mask/scale loads slice their LANE dimension at
    ``sj*sb``, and Mosaic only admits dynamic lane offsets it can prove
    are 128-multiples (cache capacities are 128-bucketed, so S % 128 == 0
    in practice; smaller S runs as one chunk). 2 slots × (K+V) × bb × sb
    × P × esize must fit the ring budget."""
    bb_pref = block_b or int(os.environ.get("GLMTPU_DECODE_STREAM_BB", "0"))
    sb_pref = block_s or int(os.environ.get("GLMTPU_DECODE_STREAM_BS", "0"))
    sb = sb_pref or (128 if S % 128 == 0 else S)
    if not bb_pref:
        bb_pref = max(8, _STREAM_VMEM_BUDGET // (4 * sb * P * esize))
    bb = _largest_divisor(B, min(bb_pref, B), 8)
    return bb, sb


def decode_attention_streamed(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    mask_add: jnp.ndarray,
    layer: int,
    k_scale: jnp.ndarray | None = None,
    v_scale: jnp.ndarray | None = None,
    *,
    kv_heads: int | None = None,
    block_b: int | None = None,
    block_s: int | None = None,
    interpret: bool | None = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Decode attention with a manually streamed cache (online softmax).

    Same contract as :func:`decode_attention`. The blocked kernel above
    binds batch-block size to VMEM residency of the full (bb, S, P) cache
    slab, which forces bb=8 and pays per-program launch overhead ~32×
    per layer at b256 (docs/BENCHMARKS.md "Packed-lane cache": 2.31
    ms/step against a ~0.63 ms DMA floor). Here the caches stay in HBM
    (``pl.ANY``); each program covers a LARGE batch block and streams
    (bb, sb, P) S-chunks through a 2-slot VMEM ring with double-buffered
    async DMA, accumulating softmax online (flash-style m/l/acc carry,
    same recurrence as ``flash_attention._fwd_kernel``). Program count
    per layer drops from B/8 to B/bb (e.g. 4 at b256), while VMEM stays
    bounded by the ring budget, not by S.
    """
    B, Hq, D = q.shape
    S = k_cache.shape[2]
    quant = k_scale is not None
    if kv_heads is None:
        kv_heads = k_scale.shape[2] if quant else Hq
    Hkv = kv_heads
    if Hq % Hkv != 0:
        raise ValueError("n_head must be divisible by n_kv_head for GQA")
    G = Hq // Hkv
    P = Hkv * D
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if compute_dtype is None:
        compute_dtype = jnp.float32 if interpret else jnp.bfloat16
    esize = jnp.dtype(k_cache.dtype).itemsize
    bb, sb = _pick_stream_blocks(B, S, P, esize, block_b, block_s)
    ns = S // sb
    inv_sqrt_d = 1.0 / float(D) ** 0.5
    layer = int(layer)

    qmat = pack_query(q.astype(compute_dtype), Hkv)  # (B, P, Hq)

    def kernel(*refs):
        if quant:
            (q_ref, k_ref, v_ref, ks_ref, vs_ref, mask_ref, o_ref,
             k_buf, v_buf, sem) = refs
        else:
            q_ref, k_ref, v_ref, mask_ref, o_ref, k_buf, v_buf, sem = refs
        i = pl.program_id(0)
        b0 = i * bb
        qh = q_ref[...].astype(compute_dtype)          # (bb, P, Hq)

        def chunk_dmas(slot, sj):
            src = lambda ref: ref.at[layer, pl.ds(b0, bb), pl.ds(sj * sb, sb), :]
            return (
                pltpu.make_async_copy(src(k_ref), k_buf.at[slot], sem.at[slot, 0]),
                pltpu.make_async_copy(src(v_ref), v_buf.at[slot], sem.at[slot, 1]),
            )

        for dma in chunk_dmas(0, 0):
            dma.start()

        def body(sj, carry):
            acc, m, l = carry
            slot = jax.lax.rem(sj, 2)

            @pl.when(sj + 1 < ns)
            def _():
                for dma in chunk_dmas(jax.lax.rem(sj + 1, 2), sj + 1):
                    dma.start()

            for dma in chunk_dmas(slot, sj):
                dma.wait()
            kh = k_buf[slot].astype(compute_dtype)      # (bb, sb, P)
            vh = v_buf[slot].astype(compute_dtype)

            s = jax.lax.dot_general(
                qh, kh, (((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * inv_sqrt_d                              # (bb, Hq, sb)
            if quant:
                ks = ks_ref[0, :, :, pl.ds(sj * sb, sb)]  # (bb, Hkv, sb)
                if G > 1:
                    ks = jnp.repeat(ks, G, axis=1)
                s = s * ks
            mrow = mask_ref[:, pl.ds(sj * sb, sb)]      # (bb, sb)
            s = s + mrow[:, None, :]
            live = (mrow > 0.5 * NEG_INF)[:, None, :]

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            p = jnp.where(live, p, 0.0)                 # all-masked chunk ⇒ 0
            alpha = jnp.exp(m - m_new)
            l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            if quant:
                vs = vs_ref[0, :, :, pl.ds(sj * sb, sb)]
                if G > 1:
                    vs = jnp.repeat(vs, G, axis=1)
                p = p * vs
            pv = jax.lax.dot_general(
                p.astype(compute_dtype), vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                           # (bb, Hq, P)
            return acc * alpha + pv, m_new, l_new

        acc0 = jnp.zeros((bb, Hq, P), jnp.float32)
        m0 = jnp.full((bb, Hq, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bb, Hq, 1), jnp.float32)
        acc, _, l = jax.lax.fori_loop(0, ns, body, (acc0, m0, l0))
        o_ref[...] = acc / jnp.maximum(l, 1e-30)

    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [
        pl.BlockSpec((bb, P, Hq), lambda i: (i, 0, 0)),
        hbm_spec,
        hbm_spec,
    ]
    args = [qmat, k_cache, v_cache]
    if quant:
        scale_spec = pl.BlockSpec((1, bb, Hkv, S), lambda i: (layer, i, 0, 0))
        in_specs += [scale_spec, scale_spec]
        args += [k_scale, v_scale]
    in_specs.append(pl.BlockSpec((bb, S), lambda i: (i, 0)))
    args.append(mask_add.astype(jnp.float32))

    out = pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, Hq, P), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, P), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, bb, sb, P), k_cache.dtype),
            pltpu.VMEM((2, bb, sb, P), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=bool(interpret),
    )(*args)
    return extract_heads(out, Hkv)


def decode_attention_xla(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    mask_add: jnp.ndarray,
    layer: int,
    k_scale: jnp.ndarray | None = None,
    v_scale: jnp.ndarray | None = None,
    compute_dtype=jnp.float32,
    *,
    kv_heads: int | None = None,
) -> jnp.ndarray:
    """Semantic reference for the kernel (einsum path, same signature).

    Used by parity tests and as the non-TPU / oversize-batch fallback.
    The packed (B, S, P) layer is viewed as (B, S, Hkv, D) — a free
    reshape, no relayout — and contracted per head group.
    """
    B, Hq, D = q.shape
    S = k_cache.shape[2]
    quant = k_scale is not None
    if kv_heads is None:
        kv_heads = k_scale.shape[2] if quant else Hq
    Hkv = kv_heads
    G = Hq // Hkv
    qg = q.astype(compute_dtype).reshape(B, Hkv, G, D)
    k_all = k_cache[layer].astype(compute_dtype).reshape(B, S, Hkv, D)
    v_all = v_cache[layer].astype(compute_dtype).reshape(B, S, Hkv, D)
    scores = jnp.einsum(
        "bhgd,bshd->bhgs", qg, k_all, preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(D))
    if quant:
        scores = scores * k_scale[layer][:, :, None, :]
    scores = scores + mask_add.astype(jnp.float32)[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    if quant:
        probs = probs * v_scale[layer][:, :, None, :]
    out = jnp.einsum(
        "bhgs,bshd->bhgd", probs.astype(compute_dtype), v_all,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, Hq, D).astype(jnp.float32)


def pack_query_chunk(q: jnp.ndarray, kv_heads: int) -> jnp.ndarray:
    """(B, Hq, T, D) chunk query → block-diagonal routing (B, P, T·Hq).

    The multi-query generalization of ``pack_query``: column t·Hq + h
    (t-major) carries q[b, h, t] in rows [(h//G)·D, (h//G+1)·D). One MXU
    matmul against the packed (S, P) cache then yields every (token,
    head) pair's scores at once."""
    B, Hq, T, D = q.shape
    G = Hq // kv_heads
    h = jnp.arange(Hq)[:, None, None]
    d = jnp.arange(D)[None, :, None]
    p = jnp.arange(kv_heads * D)[None, None, :]
    route = ((h // G) * D + d == p).astype(q.dtype)  # (Hq, D, P)
    qmat = jnp.einsum("bhtd,hdp->bpth", q, route)    # (B, P, T, Hq)
    return qmat.reshape(B, kv_heads * D, T * Hq)


def decode_attention_chunk(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    mask_add: jnp.ndarray,
    layer: int,
    k_scale: jnp.ndarray | None = None,
    v_scale: jnp.ndarray | None = None,
    *,
    kv_heads: int | None = None,
    block_b: int | None = None,
    interpret: bool | None = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Fused multi-query decode attention (the speculative verify chunk).

    Same kernel structure as ``decode_attention`` with T·Hq routed query
    columns instead of Hq: the cache is still read from HBM exactly once,
    so verifying a K-token draft chunk costs nearly the same DMA as one
    decode step — the whole point of speculative decoding on a
    memory-bound decode. ``q`` is (B, Hq, T, D); ``mask_add`` is
    (B, T, S) per-query additive rows. Returns (B, Hq, T, D) float32.
    """
    B, Hq, T, D = q.shape
    S = k_cache.shape[2]
    quant = k_scale is not None
    if kv_heads is None:
        kv_heads = k_scale.shape[2] if quant else Hq
    Hkv = kv_heads
    if Hq % Hkv != 0:
        raise ValueError("n_head must be divisible by n_kv_head for GQA")
    G = Hq // Hkv
    P = Hkv * D
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if compute_dtype is None:
        compute_dtype = jnp.float32 if interpret else jnp.bfloat16
    bb = _pick_block_b(B) if block_b is None else int(block_b)
    inv_sqrt_d = 1.0 / float(D) ** 0.5
    layer = int(layer)

    qmat = pack_query_chunk(q.astype(compute_dtype), Hkv)  # (B, P, T·Hq)

    def kernel(*refs):
        if quant:
            q_ref, k_ref, v_ref, ks_ref, vs_ref, mask_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, mask_ref, o_ref = refs
        qh = q_ref[...].astype(compute_dtype)      # (bb, P, T·Hq)
        kh = k_ref[0].astype(compute_dtype)        # (bb, S, P)
        vh = v_ref[0].astype(compute_dtype)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * inv_sqrt_d                             # (bb, T·Hq, S)
        if quant:
            ks = ks_ref[0]                         # (bb, Hkv, S)
            if G > 1:
                ks = jnp.repeat(ks, G, axis=1)     # (bb, Hq, S) h-major
            ks = jnp.tile(ks, (1, T, 1))           # (bb, T·Hq, S) t-major
            s = s * ks
        m = jnp.repeat(mask_ref[...], Hq, axis=1)  # (bb, T·Hq, S) t-major
        s = s + m
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if quant:
            vs = vs_ref[0]
            if G > 1:
                vs = jnp.repeat(vs, G, axis=1)
            vs = jnp.tile(vs, (1, T, 1))
            p = p * vs
        o_ref[...] = jax.lax.dot_general(
            p.astype(compute_dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                          # (bb, T·Hq, P)

    cache_spec = pl.BlockSpec((1, bb, S, P), lambda i: (layer, i, 0, 0))
    in_specs = [
        pl.BlockSpec((bb, P, T * Hq), lambda i: (i, 0, 0)),
        cache_spec,
        cache_spec,
    ]
    args = [qmat, k_cache, v_cache]
    if quant:
        scale_spec = pl.BlockSpec((1, bb, Hkv, S), lambda i: (layer, i, 0, 0))
        in_specs += [scale_spec, scale_spec]
        args += [k_scale, v_scale]
    in_specs.append(pl.BlockSpec((bb, T, S), lambda i: (i, 0, 0)))
    args.append(mask_add.astype(jnp.float32))

    out = pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, T * Hq, P), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T * Hq, P), jnp.float32),
        interpret=bool(interpret),
    )(*args)
    # (B, T·Hq, P) t-major rows → per-head own band → (B, Hq, T, D)
    out4 = out.reshape(B, T, Hq, Hkv, D)
    h = jnp.arange(Hq)
    picked = out4[:, :, h, h // G, :]              # (B, T, Hq, D)
    return picked.transpose(0, 2, 1, 3)


def decode_attention_chunk_xla(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    mask_add: jnp.ndarray,
    layer: int,
    k_scale: jnp.ndarray | None = None,
    v_scale: jnp.ndarray | None = None,
    compute_dtype=jnp.float32,
    *,
    kv_heads: int | None = None,
) -> jnp.ndarray:
    """Multi-query decode attention: T chunk queries against the cache.

    The speculative-verify generalization of ``decode_attention_xla``:
    q is (B, Hq, T, D) — the T draft tokens of one verification chunk —
    and ``mask_add`` is (B, T, S) (per-query validity: cached positions
    plus the intra-chunk causal prefix, built by the caller). The chunk's
    own K/V rows must already be written into the cache. T is small
    (the draft length + 1), so the einsum chain is cheap next to the
    cache read it shares with the single-token path.

    Returns (B, Hq, T, D) float32.
    """
    B, Hq, T, D = q.shape
    S = k_cache.shape[2]
    quant = k_scale is not None
    if kv_heads is None:
        kv_heads = k_scale.shape[2] if quant else Hq
    Hkv = kv_heads
    G = Hq // Hkv
    qg = q.astype(compute_dtype).reshape(B, Hkv, G, T, D)
    k_all = k_cache[layer].astype(compute_dtype).reshape(B, S, Hkv, D)
    v_all = v_cache[layer].astype(compute_dtype).reshape(B, S, Hkv, D)
    scores = jnp.einsum(
        "bhgtd,bshd->bhgts", qg, k_all, preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(D))
    if quant:
        scores = scores * k_scale[layer][:, :, None, None, :]
    scores = scores + mask_add.astype(jnp.float32)[:, None, None, :, :]
    probs = jax.nn.softmax(scores, axis=-1)
    if quant:
        probs = probs * v_scale[layer][:, :, None, None, :]
    out = jnp.einsum(
        "bhgts,bshd->bhgtd", probs.astype(compute_dtype), v_all,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, Hq, T, D).astype(jnp.float32)


__all__ = [
    "KERNEL_MAX_BATCH",
    "NEG_INF",
    "decode_attention",
    "decode_attention_chunk",
    "decode_attention_streamed",
    "decode_attention_chunk_xla",
    "decode_attention_xla",
    "extract_heads",
    "pack_query",
    "pack_query_chunk",
]
