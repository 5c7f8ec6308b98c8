"""Pallas TPU flash attention: causal + segment + local-window + dropout.

The performance-critical native kernel of the framework (SURVEY.md §2:
replaces the reference's fused-SDPA/Metal path, ``model_tiny_gpt.py:103-115``).
Never materializes the (B, H, T, S) score matrix: softmax runs online over
key blocks with a running max/sum in VMEM, O(T) HBM traffic per row instead
of O(T·S).

Structured masking is applied inline from cheap inputs instead of a dense
boolean mask:

- causal:      q_pos >= k_pos
- window:      q_pos - k_pos < attention_window  (optional, static)
- segments:    segment_ids[q_pos] == segment_ids[k_pos]  (optional;
               <SEP>-delimited packing, reference mask semantics
               ``model_tiny_gpt.py:289-295``)

Key-block iteration bounds are tightened to the causal band (and window band
when set), so fully-masked blocks are never visited. Attention-probability
dropout uses the TPU hardware PRNG, seeded per (batch, head, q-block,
k-block) so the forward and backward kernels regenerate identical masks
without storing them.

TPU layout notes: Mosaic requires the last two block dims to be
sublane/lane-aligned (8, 128) or match the array, so 1-D row metadata is
carried in aligned carrier shapes — query segment ids as (B, T, 8)
(replicated into an 8-wide trailing dim), key segment ids as (B, 8, S), and
the saved LSE / dO·O delta as (B, H, T, 8).

GQA: the kernel itself runs with equal q/kv heads; grouped inputs are
broadcast to q-heads in the wrapper (a few MB at these model scales) while
the GQA projection savings stay upstream. Gradients are reduced back over
the group by the wrapper's transpose rule.

The backward pass is the standard two-kernel flash split: dq over q-blocks
(inner loop on keys) and dk/dv over k-blocks (inner loop on queries), with
``delta = rowsum(dO ∘ O)`` precomputed in XLA.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_REP = 8  # carrier width for row metadata (sublane alignment)


class _FlashConfig(NamedTuple):
    """Static kernel configuration (hashable for custom_vjp nondiff arg)."""

    causal: bool
    window: int | None
    use_segments: bool
    dropout_rate: float
    block_q: int
    block_k: int
    interpret: bool
    q_offset: int = 0  # S - T: bottom-right-aligns suffix queries (0 = full)


def _pick_block(T: int, preferred: int) -> int:
    for b in (preferred, 256, 128, 64, 32, 16, 8):
        if b <= preferred and T % b == 0:
            return b
    return T


def _band_bounds(cfg: _FlashConfig, qi, num_kb: int, block_q: int, block_k: int):
    """Key-block range [lo, hi) overlapping the causal/window band of q-block qi."""
    if cfg.causal:
        hi = jax.lax.div((qi + 1) * block_q - 1 + cfg.q_offset, block_k) + 1
        hi = jnp.minimum(hi, num_kb)
    else:
        hi = num_kb
    if cfg.window is not None:
        lo = jnp.maximum(
            jax.lax.div(qi * block_q + cfg.q_offset - cfg.window + 1, block_k), 0)
    else:
        lo = 0
    return lo, hi


def _block_mask(cfg: _FlashConfig, qi, kj, block_q: int, block_k: int):
    """(block_q, block_k) boolean mask for the causal/window predicates."""
    q_pos = (cfg.q_offset + qi * block_q
             + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0))
    k_pos = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = jnp.ones((block_q, block_k), dtype=jnp.bool_)
    if cfg.causal:
        mask &= q_pos >= k_pos
    if cfg.window is not None:
        mask &= (q_pos - k_pos) < cfg.window
    return mask


def _dropout_keep(cfg: _FlashConfig, seed, b, h, n_head, qi, kj, num_kb, block_q, block_k):
    """Deterministic per-block keep mask from the TPU PRNG (fwd == bwd)."""
    block_id = ((b * n_head + h) * jnp.int32(2**15) + qi) * num_kb + kj
    pltpu.prng_seed(seed + block_id)
    bits = pltpu.prng_random_bits((block_q, block_k))
    threshold = jnp.uint32(int(cfg.dropout_rate * float(2**32)))
    return pltpu.bitcast(bits, jnp.uint32) >= threshold


def _seg_mask(cfg, qseg_ref, kseg_ref, kj, block_k, *, q_slice=None):
    """(bq, bk) same-segment mask from the aligned carrier refs."""
    if q_slice is None:
        q_ids = qseg_ref[0][:, 0:1]  # (bq, 1)
    else:
        q_ids = qseg_ref[0, q_slice, 0:1]
    k_ids = kseg_ref[0, 0:1, pl.ds(kj * block_k, block_k)]  # (1, bk)
    return q_ids == k_ids


# --- Forward -----------------------------------------------------------------


def _fwd_kernel(cfg: _FlashConfig, seed_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
                out_ref, lse_ref):
    b, h, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    n_head = pl.num_programs(1)
    block_q, head_dim = q_ref.shape[2], q_ref.shape[3]
    block_k = cfg.block_k
    S = k_ref.shape[2]
    num_kb = S // block_k
    scale = 1.0 / (head_dim ** 0.5)

    q = q_ref[0, 0].astype(jnp.float32) * scale  # (bq, D)

    def body(kj, carry):
        acc, m, l = carry
        k_blk = k_ref[0, 0, pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        mask = _block_mask(cfg, qi, kj, block_q, block_k)
        if cfg.use_segments:
            mask &= _seg_mask(cfg, qseg_ref, kseg_ref, kj, block_k)
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)

        if cfg.dropout_rate > 0.0:
            keep = _dropout_keep(cfg, seed_ref[0], b, h, n_head, qi, kj,
                                 num_kb, block_q, block_k)
            p = jnp.where(keep, p / (1.0 - cfg.dropout_rate), 0.0)

        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    lo, hi = _band_bounds(cfg, qi, num_kb, block_q, block_k)
    acc0 = jnp.zeros((block_q, head_dim), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(lo, hi, body, (acc0, m0, l0))

    l_safe = jnp.maximum(l, 1e-30)
    out_ref[0, 0] = (acc / l_safe).astype(out_ref.dtype)
    lse_ref[0, 0] = jnp.broadcast_to(m + jnp.log(l_safe), (block_q, _REP))


def _seg_carriers(segment_ids, B, T, S):
    """(B,S) ids → aligned carriers: qseg (B,T,_REP), kseg (B,_REP,S)."""
    if segment_ids is None:
        qseg = jnp.zeros((B, 1, _REP), jnp.int32)
        kseg = jnp.zeros((B, _REP, 1), jnp.int32)
        return qseg, kseg
    seg = segment_ids.astype(jnp.int32)
    qseg = jnp.broadcast_to(seg[:, -T:, None], (B, T, _REP))
    kseg = jnp.broadcast_to(seg[:, None, :], (B, _REP, S))
    return qseg, kseg


def _fwd(cfg: _FlashConfig, q, k, v, segment_ids, seed):
    B, H, T, D = q.shape
    S = k.shape[2]
    block_q = _pick_block(T, cfg.block_q)
    block_k = _pick_block(S, cfg.block_k)
    cfg = cfg._replace(block_q=block_q, block_k=block_k)
    nq = T // block_q

    qseg, kseg = _seg_carriers(segment_ids, B, T, S)
    has_seg = segment_ids is not None
    qseg_spec = pl.BlockSpec(
        (1, block_q, _REP) if has_seg else (1, 1, _REP),
        (lambda b, h, i, *_: (b, i, 0)) if has_seg else (lambda b, h, i, *_: (b, 0, 0)),
    )
    kseg_spec = pl.BlockSpec(
        (1, _REP, S) if has_seg else (1, _REP, 1),
        lambda b, h, i, *_: (b, 0, 0),
    )

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, nq),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, S, D), lambda b, h, i, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, S, D), lambda b, h, i, *_: (b, h, 0, 0)),
                qseg_spec,
                kseg_spec,
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, _REP), lambda b, h, i, *_: (b, h, i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, _REP), jnp.float32),
        ],
        interpret=cfg.interpret,
    )(seed, q, k, v, qseg, kseg)
    return out, lse


# --- Backward ----------------------------------------------------------------


def _bwd_dq_kernel(cfg: _FlashConfig, seed_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
                   do_ref, lse_ref, delta_ref, dq_ref):
    b, h, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    n_head = pl.num_programs(1)
    block_q, head_dim = q_ref.shape[2], q_ref.shape[3]
    block_k = cfg.block_k
    S = k_ref.shape[2]
    num_kb = S // block_k
    scale = 1.0 / (head_dim ** 0.5)

    q = q_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, 0:1]
    delta = delta_ref[0, 0][:, 0:1]

    def body(kj, dq_acc):
        k_blk = k_ref[0, 0, pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        s = scale * jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        mask = _block_mask(cfg, qi, kj, block_q, block_k)
        if cfg.use_segments:
            mask &= _seg_mask(cfg, qseg_ref, kseg_ref, kj, block_k)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dpd = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if cfg.dropout_rate > 0.0:
            keep = _dropout_keep(cfg, seed_ref[0], b, h, n_head, qi, kj,
                                 num_kb, block_q, block_k)
            pd = jnp.where(keep, p / (1.0 - cfg.dropout_rate), 0.0)
        else:
            pd = p
        ds = pd * dpd - p * delta
        return dq_acc + scale * jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    lo, hi = _band_bounds(cfg, qi, num_kb, block_q, block_k)
    dq = jax.lax.fori_loop(lo, hi, body, jnp.zeros((block_q, head_dim), jnp.float32))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(cfg: _FlashConfig, seed_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
                    do_ref, lse_ref, delta_ref, dk_ref, dv_ref):
    b, h, kj = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    n_head = pl.num_programs(1)
    block_k, head_dim = k_ref.shape[2], k_ref.shape[3]
    block_q = cfg.block_q
    T = q_ref.shape[2]
    num_qb = T // block_q
    num_kb = pl.num_programs(2)
    scale = 1.0 / (head_dim ** 0.5)

    k_blk = k_ref[0, 0].astype(jnp.float32)
    v_blk = v_ref[0, 0].astype(jnp.float32)

    def body(qi, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, 0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, 0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qi * block_q, block_q), 0:1]
        delta = delta_ref[0, 0, pl.ds(qi * block_q, block_q), 0:1]
        s = scale * jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        mask = _block_mask(cfg, qi, kj, block_q, block_k)
        if cfg.use_segments:
            mask &= _seg_mask(
                cfg, qseg_ref, kseg_ref, kj, block_k,
                q_slice=pl.ds(qi * block_q, block_q),
            )
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dpd = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if cfg.dropout_rate > 0.0:
            keep = _dropout_keep(cfg, seed_ref[0], b, h, n_head, qi, kj,
                                 num_kb, block_q, block_k)
            pd = jnp.where(keep, p / (1.0 - cfg.dropout_rate), 0.0)
        else:
            pd = p
        ds = pd * dpd - p * delta
        dv_acc = dv_acc + jax.lax.dot_general(
            pd, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk_acc = dk_acc + scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_acc, dv_acc

    if cfg.causal:
        lo = jnp.maximum(jax.lax.div(kj * block_k - cfg.q_offset, block_q), 0)
    else:
        lo = 0
    if cfg.window is not None:
        hi = jax.lax.div(
            (kj + 1) * block_k - 1 + cfg.window - 1 - cfg.q_offset, block_q) + 1
        hi = jnp.minimum(hi, num_qb)
    else:
        hi = num_qb
    zeros = jnp.zeros((block_k, head_dim), jnp.float32)
    dk, dv = jax.lax.fori_loop(lo, hi, body, (zeros, zeros))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bwd(cfg: _FlashConfig, res, g):
    q, k, v, segment_ids, seed, out, lse = res
    do = g[0]
    B, H, T, D = q.shape
    S = k.shape[2]
    block_q = _pick_block(T, cfg.block_q)
    block_k = _pick_block(S, cfg.block_k)
    cfg = cfg._replace(block_q=block_q, block_k=block_k)
    nq, nk = T // block_q, S // block_k

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None], (B, H, T, _REP))

    qseg, kseg = _seg_carriers(segment_ids, B, T, S)
    has_seg = segment_ids is not None
    kseg_spec = pl.BlockSpec(
        (1, _REP, S) if has_seg else (1, _REP, 1),
        lambda b, h, j, *_: (b, 0, 0),
    )

    common_in = [q, k, v, qseg, kseg, do, lse, delta]

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, cfg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, nq),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, S, D), lambda b, h, i, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, S, D), lambda b, h, i, *_: (b, h, 0, 0)),
                pl.BlockSpec(
                    (1, block_q, _REP) if has_seg else (1, 1, _REP),
                    (lambda b, h, i, *_: (b, i, 0)) if has_seg
                    else (lambda b, h, i, *_: (b, 0, 0)),
                ),
                kseg_spec,
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, _REP), lambda b, h, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, _REP), lambda b, h, i, *_: (b, h, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, *_: (b, h, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        interpret=cfg.interpret,
    )(seed, *common_in)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, cfg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, nk),
            in_specs=[
                pl.BlockSpec((1, 1, T, D), lambda b, h, j, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, *_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, *_: (b, h, j, 0)),
                pl.BlockSpec(
                    (1, T, _REP) if has_seg else (1, 1, _REP),
                    lambda b, h, j, *_: (b, 0, 0),
                ),
                pl.BlockSpec(
                    (1, _REP, block_k) if has_seg else (1, _REP, 1),
                    (lambda b, h, j, *_: (b, 0, j)) if has_seg
                    else (lambda b, h, j, *_: (b, 0, 0)),
                ),
                pl.BlockSpec((1, 1, T, D), lambda b, h, j, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, T, _REP), lambda b, h, j, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, T, _REP), lambda b, h, j, *_: (b, h, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, *_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, *_: (b, h, j, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        ],
        interpret=cfg.interpret,
    )(seed, *common_in)

    return dq, dk, dv, None, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash(cfg: _FlashConfig, q, k, v, segment_ids, seed):
    out, _ = _fwd(cfg, q, k, v, segment_ids, seed)
    return (out,)


def _flash_fwd_rule(cfg, q, k, v, segment_ids, seed):
    out, lse = _fwd(cfg, q, k, v, segment_ids, seed)
    return (out,), (q, k, v, segment_ids, seed, out, lse)


_flash.defvjp(_flash_fwd_rule, _bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    segment_ids: jnp.ndarray | None = None,
    attention_window: int | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    causal: bool = True,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Flash attention with the framework's structured masks.

    q: (B, Hq, T, D); k, v: (B, Hkv, S, D); segment_ids: (B, S) int (query
    segments are the trailing T entries). With T < S the queries are the
    SUFFIX of the key sequence (cached-decode semantics): the causal band
    is bottom-right aligned via a static position offset S - T, matching
    ``ops.attention.sdpa_xla``'s alignment. Numerics match ``sdpa_xla``
    to float tolerance.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Hq, T, D = q.shape
    if k.shape[2] < T:
        raise ValueError(
            f"key length {k.shape[2]} shorter than query length {T}")
    Hkv = k.shape[1]
    if Hq != Hkv:
        if Hq % Hkv != 0:
            raise ValueError("n_head must be divisible by n_kv_head")
        rep = Hq // Hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    use_dropout = dropout_rate > 0.0 and dropout_rng is not None
    if use_dropout:
        seed = jax.random.randint(dropout_rng, (1,), 0, 2**31 - 1, dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)

    cfg = _FlashConfig(
        causal=causal,
        window=int(attention_window) if attention_window is not None else None,
        use_segments=segment_ids is not None,
        dropout_rate=float(dropout_rate) if use_dropout else 0.0,
        block_q=block_q,
        block_k=block_k,
        interpret=bool(interpret),
        q_offset=k.shape[2] - T,
    )
    (out,) = _flash(cfg, q, k, v, segment_ids, seed)
    return out


__all__ = ["flash_attention"]
