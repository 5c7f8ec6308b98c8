"""Continuous-batching serving engine over the ragged KV cache.

The decode path in ``generation.decode`` steps a batch whose sequences all
share one scalar ``length`` — right for offline batch generation, wrong
for serving, where requests arrive at different times with different
prompt lengths. This module generalizes the cached step to **per-slot
lengths**: every batch slot advances at its own position, writes its K/V
via a per-slot scatter, and masks attention with its own (length, segment)
row. A finished slot is retired on the host and re-admitted with a new
request without touching the other slots — the chip always steps the full
static batch.

Engine flow (host side, ``ServingEngine``):

    submit(...) → pending queue
    step():  admit pending into free slots (right-padded bucket prefill,
             one compile per bucket size)
             → ``serve_steps``: one compiled scan of K ragged decode
               steps for the whole batch (sampling on device)
             → retire slots that hit a stop id / their token budget

Sampling is per-slot: each request carries its own temperature (≤0 =
greedy); an optional global vocabulary mask restricts sampling (e.g. the
CDS codon set). Correctness contract: with greedy sampling a request's
output is identical to ``generation.decode.generate_tokens`` run alone on
its prompt (scheduling can never change the numbers) — see
``tests/test_serving.py``.

With ``speculative_k`` > 0 (and a ``draft_table``) each sync chunk runs
draft→verify→accept ROUNDS instead of single decode steps, emitting
1..K+1 tokens per slot per round at an unchanged output distribution —
see ``serving/speculative.py``; ``stats()`` reports the live acceptance
rate.

Reference: the interactive single-request path this subsumes is
``scripts/query_model.py`` / ``generate.py:13-27`` (no KV cache, no
batching). The int8 KV cache and the fused decode-attention kernel
(``ops/decode_attention.py``) apply unchanged — the kernel consumes the
per-slot additive mask and is oblivious to raggedness.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from genomics_lm_tpu.models import CodonGPTConfig
from genomics_lm_tpu.models.codon_gpt import (
    _layer_norm,
    _linear,
    _lm_logits,
    _qkv,
    block_epilogue,
    rope_cos_sin,
    rotate_half,
)
from genomics_lm_tpu.ops.attention import NEG_INF
from genomics_lm_tpu.ops.decode_attention import (
    KERNEL_MAX_BATCH,
    decode_attention,
    decode_attention_xla,
)
from genomics_lm_tpu.generation.decode import prefill

PROMPT_BUCKET = 16  # admission prompts right-pad to multiples of this


def serving_state_sharding(state: dict, mesh) -> dict:
    """NamedSharding tree for the serving state under tensor parallelism.

    The packed cache's lane axis (Hkv·D) and the scale arrays' head axis
    shard over the model axis — each shard owns its heads' K/V lanes,
    which is exactly the Megatron attention-head split, so the decode
    einsums partition with NO cross-device communication until the
    row-parallel attention output projection (GSPMD inserts that psum).
    Everything else (slot bookkeeping, logits) replicates."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from genomics_lm_tpu.parallel.mesh import MODEL_AXIS

    specs = {
        "k": P(None, None, None, MODEL_AXIS),
        "v": P(None, None, None, MODEL_AXIS),
        "k_scale": P(None, None, MODEL_AXIS, None),
        "v_scale": P(None, None, MODEL_AXIS, None),
    }
    return {
        name: NamedSharding(mesh, specs.get(name, P()))
        for name in state
    }


def init_serving_state(
    cfg: CodonGPTConfig,
    slots: int,
    cache_size: int | None = None,
    kv_quant: bool = False,
) -> dict:
    """Empty ragged serving state for ``slots`` concurrent sequences."""
    S = cfg.block_size if cache_size is None else int(cache_size)
    # packed-lane layout (see ops/decode_attention.py): all heads' K/V for
    # one position in one lane row — zero lane padding
    shape = (cfg.n_layer, slots, S, cfg.kv_heads * cfg.head_dim)
    state = {
        "k": jnp.zeros(shape, jnp.int8 if kv_quant else cfg.dtype),
        "v": jnp.zeros(shape, jnp.int8 if kv_quant else cfg.dtype),
        "seg": jnp.zeros((slots, S), jnp.int32),
        "lengths": jnp.zeros((slots,), jnp.int32),
        "seg_count": jnp.zeros((slots,), jnp.int32),
        "last_logits": jnp.full((slots, cfg.vocab_size), NEG_INF, jnp.float32),
        # True: last_logits are raw model logits (transform at sample time);
        # False: a speculative round stored an already-transformed
        # residual/bonus distribution as log-probs (serving/speculative.py)
        "logits_raw": jnp.ones((slots,), jnp.bool_),
        "active": jnp.zeros((slots,), jnp.bool_),
    }
    if kv_quant:
        # (L, B, Hkv, S) scales, matching generation.decode / the kernel
        state["k_scale"] = jnp.zeros((cfg.n_layer, slots, cfg.kv_heads, S), jnp.float32)
        state["v_scale"] = jnp.zeros((cfg.n_layer, slots, cfg.kv_heads, S), jnp.float32)
    return state


@functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(2,))
def admit_many(params, cfg: CodonGPTConfig, state: dict, slot_idx: jnp.ndarray,
               prompts: jnp.ndarray, prompt_lens: jnp.ndarray,
               valid: jnp.ndarray) -> dict:
    """Prefill a batch of right-padded prompts and install them into slots.

    ``prompts``: (N, P) int32, row i real in [0, prompt_lens[i]); rows with
    ``valid[i]`` False are ignored (their slot_idx may be anything).
    ``slot_idx``: (N,) target batch rows, distinct among valid lanes.

    One dispatch — and, because the engine calls this at a FIXED (N, P)
    shape, exactly one compile ever — regardless of how many requests are
    admitted. Per-request admission was the dominant serving cost on
    dispatch-latency-bound runtimes (measured 256 admits ≈ 10 s of a 14 s
    drain over the TPU tunnel), and per-shape recompiles of anything
    admission-shaped dwarf the work itself there, so shape stability is
    the whole game. The install is a one-hot routing matmul
    (``onehot (B,N) @ mini (…,N,…)``) followed by a masked merge with the
    previous cache prefix — dense, fully parallel, no scatter and no
    per-lane loop, and every output aliases the donated state buffer.
    One-hot rows select a single element, so int8 cache values and f32
    scales round-trip exactly through the bf16/f32 matmul.

    Causality keeps the right-pads from influencing real positions; pad
    K/V beyond a row's length sit above the slot's length, so the ragged
    mask never attends them and decode writes overwrite them one by one."""
    kv_quant = "k_scale" in state
    N, P = prompts.shape
    B = state["lengths"].shape[0]
    logits, mini, _ = prefill(params, cfg, prompts, P, kv_quant,
                              jnp.maximum(prompt_lens - 1, 0), want_aux=False)

    onehot_b = (slot_idx[None, :] == jnp.arange(B)[:, None]) & valid[None, :]
    written = jnp.any(onehot_b, axis=1)  # (B,)
    onehot = onehot_b.astype(jnp.float32)
    # lane feeding each slot (0 where unwritten — masked by `written`)
    lane = jnp.argmax(onehot_b, axis=1)  # (B,)

    def route(mini_arr, old, lane_axis, pos_axis, mask_shape):
        """Route admission lanes to slots and merge over ``old``'s P-prefix.

        HIGHEST precision keeps the routing matmul an exact copy: at TPU
        default precision f32 operands demote to bf16, which would round
        routed scales (and bf16/int8 cache values are exact either way,
        but f32 caches on CPU paths would round too)."""
        upd = jnp.einsum(
            "bn,...n->...b", onehot,
            jnp.moveaxis(mini_arr, lane_axis, -1).astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST)
        upd = jnp.moveaxis(upd, -1, lane_axis).astype(old.dtype)
        prefix = jax.lax.slice_in_dim(old, 0, P, axis=pos_axis)
        merged = jnp.where(written.reshape(mask_shape), upd, prefix)
        return jax.lax.dynamic_update_slice(
            old, merged, (0,) * old.ndim)

    out = dict(state)
    # packed caches (L, B, S, P): slot axis 1, positions axis 2
    out["k"] = route(mini["k"], state["k"], 1, 2, (1, B, 1, 1))
    out["v"] = route(mini["v"], state["v"], 1, 2, (1, B, 1, 1))
    if kv_quant:
        # scales (L, B, Hkv, S): slot axis 1, positions axis 3
        out["k_scale"] = route(
            mini["k_scale"], state["k_scale"], 1, 3, (1, B, 1, 1))
        out["v_scale"] = route(
            mini["v_scale"], state["v_scale"], 1, 3, (1, B, 1, 1))
    # integer metadata and logits route by exact gather, not matmul —
    # int32 values above 256 are not bf16-representable, and the sampled
    # token must come from bit-exact logits
    seg_upd = jnp.take(mini["seg"], lane, axis=0)  # (B, P)
    seg_prefix = jax.lax.slice_in_dim(state["seg"], 0, P, axis=1)
    out["seg"] = jax.lax.dynamic_update_slice(
        state["seg"],
        jnp.where(written[:, None], seg_upd, seg_prefix), (0, 0))
    out["lengths"] = jnp.where(written, prompt_lens[lane], state["lengths"])
    out["seg_count"] = jnp.where(
        written, mini["seg_count"][lane], state["seg_count"])
    out["last_logits"] = jnp.where(
        written[:, None], logits.astype(jnp.float32)[lane],
        state["last_logits"])
    out["logits_raw"] = state["logits_raw"] | written
    out["active"] = state["active"] | written
    return out


@functools.partial(jax.jit, donate_argnums=(0,))
def deactivate(state: dict, slot_mask: jnp.ndarray) -> dict:
    """Clear ``active`` for every slot where ``slot_mask`` is True."""
    out = dict(state)
    out["active"] = state["active"] & ~slot_mask
    return out


def _tp_decode_attention(mesh, cfg: CodonGPTConfig, q, k, v, mask_add,
                         layer: int, ks, vs):
    """Tensor-parallel fused decode attention via shard_map.

    GSPMD cannot partition a pallas_call, so under a model-axis mesh the
    kernel runs per shard on its local slice: q split by query heads,
    the packed cache split on the lane axis (= the same head split), and
    scales split on their head axis. Attention is head-local, so no
    collective is needed here — the psum comes after the row-parallel
    output projection, inserted by GSPMD as usual."""
    from jax.sharding import PartitionSpec as P

    from genomics_lm_tpu.parallel.mesh import MODEL_AXIS

    try:
        from jax import shard_map as _sm

        def shard_map(f, *, mesh, in_specs, out_specs, check_rep):
            return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                       check_vma=check_rep)
    except ImportError:  # older jax spelling
        from jax.experimental.shard_map import shard_map

    tp = mesh.shape[MODEL_AXIS]
    hkv_local = cfg.kv_heads // tp

    if ks is not None:
        def local(q_l, k_l, v_l, m_l, ks_l, vs_l):
            return decode_attention(q_l, k_l, v_l, m_l, layer, ks_l, vs_l,
                                    kv_heads=hkv_local)

        in_specs = (P(None, MODEL_AXIS, None), P(None, None, None, MODEL_AXIS),
                    P(None, None, None, MODEL_AXIS), P(None, None),
                    P(None, None, MODEL_AXIS, None),
                    P(None, None, MODEL_AXIS, None))
        args = (q, k, v, mask_add, ks, vs)
    else:
        def local(q_l, k_l, v_l, m_l):
            return decode_attention(q_l, k_l, v_l, m_l, layer,
                                    kv_heads=hkv_local)

        in_specs = (P(None, MODEL_AXIS, None), P(None, None, None, MODEL_AXIS),
                    P(None, None, None, MODEL_AXIS), P(None, None))
        args = (q, k, v, mask_add)
    return shard_map(local, mesh=mesh, in_specs=in_specs,
                     out_specs=P(None, MODEL_AXIS, None),
                     check_rep=False)(*args)


def _ragged_decode(params, cfg: CodonGPTConfig, state: dict, token: jnp.ndarray,
                   mesh=None):
    """One decode step with per-slot positions; returns (logits, new state).

    The layer body mirrors ``generation.decode._decode_step_impl`` (same
    kernel dispatch, same int8 handling); only the position bookkeeping
    differs: scalar ``length`` becomes the (B,) ``lengths`` vector, the
    single dynamic-update-slice becomes a per-slot scatter, and inactive
    slots keep their length (their writes land on their own frozen slot
    and are never attended). With ``mesh`` (tensor-parallel serving) the
    flash path routes through ``_tp_decode_attention``."""
    B = token.shape[0]
    S = state["seg"].shape[1]
    lengths = state["lengths"]
    active = state["active"]
    wpos = jnp.minimum(lengths, S - 1)  # inactive/full slots re-write in place
    bidx = jnp.arange(B)
    new_seg = state["seg_count"] + (
        (token == cfg.sep_id).astype(jnp.int32) if cfg.sep_id is not None else 0
    )

    x = params["tok_emb"].astype(cfg.dtype)[token][:, None, :]  # (B, 1, C)
    pos_clip = jnp.minimum(lengths, cfg.block_size - 1)
    if not cfg.use_rope:
        x = x + params["pos_emb"].astype(cfg.dtype)[pos_clip][:, None, :]
    else:
        cos_full, sin_full = rope_cos_sin(
            cfg.block_size, cfg.head_dim, cfg.rope_base, cfg.dtype)
        cos_b = cos_full[pos_clip][:, None, None, :]  # (B,1,1,D)
        sin_b = sin_full[pos_clip][:, None, None, :]

    positions = jnp.arange(S)
    base_valid = positions[None, :] < lengths[:, None]
    if cfg.sep_id is not None:
        seg_ok = state["seg"] == new_seg[:, None]
    else:
        seg_ok = jnp.ones((B, S), jnp.bool_)
    valid = (base_valid & seg_ok) | (positions[None, :] == wpos[:, None])
    mask_add = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
    use_kernel = cfg.attention_impl == "flash" and B <= KERNEL_MAX_BATCH

    kv_quant = "k_scale" in state
    if kv_quant:
        from genomics_lm_tpu.ops.quant import quantize_kv

        new_k_scale = state["k_scale"]
        new_v_scale = state["v_scale"]
    new_k = state["k"]
    new_v = state["v"]
    for layer in range(cfg.n_layer):
        block_p = jax.tree.map(lambda p: p[layer], params["blocks"])
        h = _layer_norm(block_p["ln1"], x)
        q, k, v = _qkv(block_p, h, cfg)  # (B, H, 1, D), (B, Hkv, 1, D)
        if cfg.use_rope:
            q = q * cos_b + rotate_half(q) * sin_b
            k = k * cos_b + rotate_half(k) * sin_b
        if kv_quant:
            k, k_sc = quantize_kv(k)
            v, v_sc = quantize_kv(v)
            new_k_scale = new_k_scale.at[layer, bidx, :, wpos].set(k_sc[:, :, 0])
            new_v_scale = new_v_scale.at[layer, bidx, :, wpos].set(v_sc[:, :, 0])
        # one contiguous packed lane row per slot: (B, P)
        new_k = new_k.at[layer, bidx, wpos, :].set(
            k[:, :, 0, :].reshape(B, -1).astype(new_k.dtype))
        new_v = new_v.at[layer, bidx, wpos, :].set(
            v[:, :, 0, :].reshape(B, -1).astype(new_v.dtype))
        q_flat = q.reshape(B, cfg.n_head, cfg.head_dim)
        ks = new_k_scale if kv_quant else None
        vs = new_v_scale if kv_quant else None
        if use_kernel and mesh is not None:
            y = _tp_decode_attention(
                mesh, cfg, q_flat, new_k, new_v, mask_add, layer, ks, vs)
        elif use_kernel:
            y = decode_attention(q_flat, new_k, new_v, mask_add, layer, ks, vs,
                                 kv_heads=cfg.kv_heads)
        else:
            y = decode_attention_xla(
                q_flat, new_k, new_v, mask_add, layer, ks, vs,
                compute_dtype=cfg.dtype, kv_heads=cfg.kv_heads,
            )
        y = y.astype(cfg.dtype).reshape(B, 1, cfg.n_embd)
        x = block_epilogue(block_p, cfg, x, y)

    x = _layer_norm(params["ln_f"], x)
    logits = _lm_logits(params, cfg, x)[:, 0].astype(jnp.float32)

    out = dict(state)
    out["k"], out["v"] = new_k, new_v
    if kv_quant:
        out["k_scale"], out["v_scale"] = new_k_scale, new_v_scale
    out["seg"] = state["seg"].at[bidx, wpos].set(
        jnp.where(active, new_seg, state["seg"][bidx, wpos]))
    out["lengths"] = jnp.where(
        active, jnp.minimum(lengths + 1, S), lengths)
    out["seg_count"] = jnp.where(active, new_seg, state["seg_count"])
    out["last_logits"] = jnp.where(
        active[:, None], logits, state["last_logits"])
    return logits, out


def filtered_sampling_logits(logits, sampling, allowed_mask,
                             use_filters: bool = True):
    """Allowed-mask → temperature → top-k → top-p sampling filter chain.

    The ONE implementation shared by the plain sampler (``serve_steps``)
    and the speculative target transform
    (``serving.speculative._slot_probs``) — the speculative path's
    distribution-equality contract requires the two to apply identical
    filters, so the invariant is structural rather than comment-enforced.
    Returns (greedy_token (B,) int32, filtered temperature-scaled logits
    (B, V)). ``use_filters`` False (static) skips the top-k/top-p sort
    chain for callers that know every slot has both disabled."""
    neg = jnp.asarray(NEG_INF, jnp.float32)
    temps = sampling["temps"]
    top_k = sampling["top_k"]
    top_p = sampling["top_p"]
    V = logits.shape[-1]
    if allowed_mask is not None:
        logits = jnp.where(allowed_mask[None, :], logits, neg)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
    if not use_filters:
        return greedy, scaled
    # top-k: drop everything below the k-th largest (k = 0 disables)
    desc = -jnp.sort(-scaled, axis=-1)
    kth = jnp.take_along_axis(
        desc, jnp.clip(top_k - 1, 0, V - 1)[:, None], axis=-1)
    scaled = jnp.where((top_k > 0)[:, None] & (scaled < kth), neg, scaled)
    # top-p (nucleus): keep the shortest descending-probability prefix
    # whose cumulative mass reaches p (the argmax always survives)
    desc_k = -jnp.sort(-scaled, axis=-1)
    probs = jax.nn.softmax(desc_k, axis=-1)
    csum = jnp.cumsum(probs, axis=-1)
    p_eff = jnp.where((top_p > 0) & (top_p < 1.0), top_p, 1.0)
    n_keep = jnp.maximum(
        jnp.sum((csum - probs) < p_eff[:, None], axis=-1), 1)
    thr = jnp.take_along_axis(desc_k, (n_keep - 1)[:, None], axis=-1)
    nucleus_on = ((top_p > 0) & (top_p < 1.0))[:, None]
    scaled = jnp.where(nucleus_on & (scaled < thr), neg, scaled)
    return greedy, scaled


@functools.partial(jax.jit, static_argnums=(1, 3, 7), donate_argnums=(2,))
def serve_steps(
    params,
    cfg: CodonGPTConfig,
    state: dict,
    n_steps: int,
    sampling: dict,
    key: jax.Array,
    allowed_mask: jnp.ndarray | None = None,
    mesh=None,
) -> tuple[dict, jnp.ndarray]:
    """One compiled scan of ``n_steps`` ragged decode steps.

    ``sampling``: per-slot arrays — ``temps`` (B,) f32 (≤0 = greedy),
    ``top_k`` (B,) int32 (0 = off), ``top_p`` (B,) f32 (≤0 or ≥1 = off);
    filters apply in the usual top-k → top-p order on the
    temperature-scaled distribution, entirely on device (V is small, so
    the per-step sort is trivial). ``allowed_mask``: optional (V,) bool
    vocabulary restriction (e.g. CDS codons). ``mesh`` (static):
    tensor-parallel serving mesh — routes the flash kernel through
    shard_map (einsum/GSPMD paths ignore it). Returns (new state,
    (B, n_steps) sampled tokens); tokens of inactive slots are 0. One
    device dispatch per chunk — the host syncs only at chunk boundaries
    to admit/retire."""
    temps = sampling["temps"]

    def body(state, key):
        greedy, scaled = filtered_sampling_logits(
            state["last_logits"], sampling, allowed_mask)
        sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
        token = jnp.where(temps <= 0, greedy, sampled)
        token = jnp.where(state["active"], token, 0)
        _, state = _ragged_decode(params, cfg, state, token, mesh)
        return state, token

    state, tokens = jax.lax.scan(body, state, jax.random.split(key, n_steps))
    return state, tokens.T


@dataclass
class Request:
    request_id: int
    prompt: list[int]
    max_new_tokens: int
    temperature: float = 0.0
    stop_ids: tuple[int, ...] = ()
    top_k: int = 0       # 0 = disabled
    top_p: float = 0.0   # <=0 or >=1 = disabled


@dataclass
class RequestResult:
    request_id: int
    prompt: list[int]
    tokens: list[int] = field(default_factory=list)
    finish_reason: str = ""  # "stop" | "length"


class ServingEngine:
    """Host-side continuous-batching scheduler over ``serve_steps``.

    One engine owns one device state (``slots`` concurrent sequences, one
    static cache). ``submit`` enqueues; ``step`` admits + decodes one
    chunk + retires; ``run`` drains the queue. Determinism: greedy
    requests produce output independent of co-scheduling (tested).
    """

    def __init__(
        self,
        params,
        cfg: CodonGPTConfig,
        *,
        slots: int = 8,
        max_seq_len: int | None = None,
        kv_quant: bool = False,
        steps_per_sync: int = 16,
        allowed_ids: list[int] | None = None,
        seed: int = 0,
        mesh=None,
        speculative_k: int = 0,
        draft_table=None,
        pipeline_depth: int = 1,
        warm_spec_filters: bool = False,
    ):
        self.cfg = cfg
        self.slots = int(slots)
        self.S = int(max_seq_len or cfg.block_size)
        if self.S > cfg.block_size:
            raise ValueError("max_seq_len exceeds model block_size")
        self.kv_quant = bool(kv_quant)
        self.steps_per_sync = int(steps_per_sync)
        # chunks kept in flight by the pipelined drain (see run()): raise
        # past 1 when the fetch round trip exceeds chunk compute time
        self.pipeline_depth = max(1, int(pipeline_depth))
        # speculative decoding (serving/speculative.py): each sync chunk
        # becomes steps_per_sync draft→verify ROUNDS, each emitting
        # 1..K+1 tokens per slot; the cache takes K+1 slots of headroom
        # for the optimistic chunk writes
        self._spec_k = int(speculative_k)
        if self._spec_k:
            if draft_table is None:
                raise ValueError(
                    "speculative_k > 0 requires a draft_table "
                    "(serving.speculative.fit_bigram_table)")
            table = np.asarray(draft_table, np.float32)
            if table.shape != (cfg.vocab_size, cfg.vocab_size):
                raise ValueError(
                    f"draft_table shape {table.shape} != "
                    f"({cfg.vocab_size}, {cfg.vocab_size})")
            if allowed_ids is not None:
                from genomics_lm_tpu.serving.speculative import restrict_table

                allowed = np.zeros((cfg.vocab_size,), bool)
                allowed[np.asarray(allowed_ids, int)] = True
                table = restrict_table(table, allowed)
            else:
                # strictly positive rows: drafts must actually be samplable
                # from every conditional (a zero row would make the draft
                # categorical degenerate); fit_bigram_table smooths already,
                # this guards arbitrary user tables
                table = np.maximum(table, 1e-8)
                table = table / table.sum(axis=1, keepdims=True)
            self._table = jnp.asarray(table)
        tp = 1
        if mesh is not None:
            from genomics_lm_tpu.parallel.mesh import MODEL_AXIS

            tp = int(mesh.shape.get(MODEL_AXIS, 1))
        # mesh is kept only when it actually tensor-parallelizes the model
        self.mesh = mesh if tp > 1 else None
        if tp > 1:
            # Megatron head-split serving: params column/row-sharded, the
            # packed cache lane-sharded (serving_state_sharding). GSPMD
            # partitions the einsum decode path along the sharded
            # head/lane axes; the flash kernel path instead goes through
            # shard_map (_tp_decode_attention), since GSPMD cannot
            # partition a pallas_call.
            from genomics_lm_tpu.parallel.sharding import tp_param_sharding

            if cfg.kv_heads % tp or cfg.n_head % tp:
                raise ValueError(
                    f"kv_heads {cfg.kv_heads} / n_head {cfg.n_head} must "
                    f"divide over model={tp}")
            params = jax.device_put(params, tp_param_sharding(params, mesh))
        self.params = params
        cache_cap = self.S
        if self._spec_k:
            # K+1 slots of verify headroom, rounded to the cache bucket —
            # unaligned cache sublane dims put the fused kernels on
            # Mosaic's padded slow path (measured 3.5× per round)
            from genomics_lm_tpu.generation.decode import CACHE_BUCKET

            raw = self.S + self._spec_k + 1
            cache_cap = ((raw + CACHE_BUCKET - 1) // CACHE_BUCKET) * CACHE_BUCKET
        self.state = init_serving_state(cfg, self.slots, cache_cap, kv_quant)
        if tp > 1:
            self.state = jax.device_put(
                self.state, serving_state_sharding(self.state, mesh))
        # small admission bucket: prompts at or under this length prefill
        # at this width, longer ones at the full window
        self._admit_small = min(
            ((64 + PROMPT_BUCKET - 1) // PROMPT_BUCKET) * PROMPT_BUCKET, self.S)
        self._temps = np.zeros((self.slots,), np.float32)
        self._topk = np.zeros((self.slots,), np.int32)
        self._topp = np.zeros((self.slots,), np.float32)
        self._samp_dev = self._sampling_device()  # refreshed on admission
        self._key = jax.random.PRNGKey(seed)
        self._allowed = None
        if allowed_ids is not None:
            m = np.zeros((cfg.vocab_size,), bool)
            m[np.asarray(allowed_ids, int)] = True
            self._allowed = jnp.asarray(m)
        self._spec_rounds = 0   # active (slot, round) pairs consumed
        self._spec_emitted = 0  # tokens those rounds emitted
        # warm_spec_filters pins the filtered speculative program from the
        # first dispatch (cold start instead of a mid-serve recompile
        # stall when the first top-k/top-p request arrives); otherwise
        # the flag turns on at the first filtered request and stays on
        self._spec_filters_seen = bool(warm_spec_filters and self._spec_k)
        self.pending: list[Request] = []
        self.results: dict[int, RequestResult] = {}
        self._completed = 0  # finished (incl. cancelled); thread-safe to read
        self._slot_req: list[Request | None] = [None] * self.slots
        self._next_id = 0

    def _sampling_device(self) -> dict:
        return {
            "temps": jnp.asarray(self._temps),
            "top_k": jnp.asarray(self._topk),
            "top_p": jnp.asarray(self._topp),
        }

    # -- queue -------------------------------------------------------------
    def submit(self, prompt: list[int], max_new_tokens: int,
               temperature: float = 0.0,
               stop_ids: tuple[int, ...] = (),
               top_k: int = 0, top_p: float = 0.0) -> int:
        if not prompt:
            raise ValueError("empty prompt")
        tokens = list(map(int, prompt))
        bad = [t for t in tokens if not 0 <= t < self.cfg.vocab_size]
        if bad:
            raise ValueError(
                f"prompt token {bad[0]} outside vocabulary [0, {self.cfg.vocab_size})")
        if int(max_new_tokens) < 1:
            raise ValueError("max_new_tokens must be >= 1")
        budget = len(prompt) + int(max_new_tokens)
        if budget > self.S:
            raise ValueError(
                f"prompt+max_new_tokens {budget} exceeds engine max_seq_len {self.S}")
        rid = self._next_id
        self._next_id += 1
        self.pending.append(Request(rid, tokens,
                                    int(max_new_tokens), float(temperature),
                                    tuple(stop_ids), int(top_k), float(top_p)))
        return rid

    @property
    def n_active(self) -> int:
        return sum(r is not None for r in self._slot_req)

    def cancel(self, request_id: int) -> bool:
        """Cancel a request. Pending requests are dropped; an in-flight
        request's slot is freed at the next scheduling round (its decoded
        tokens so far stay in ``results`` with finish_reason "cancelled").
        Returns False if the request is unknown or already finished."""
        for i, req in enumerate(self.pending):
            if req.request_id == request_id:
                del self.pending[i]
                res = self.results.setdefault(
                    request_id, RequestResult(request_id, list(req.prompt)))
                res.finish_reason = "cancelled"
                self._completed += 1
                return True
        for slot, req in enumerate(self._slot_req):
            if req is not None and req.request_id == request_id:
                self.results[req.request_id].finish_reason = "cancelled"
                self._completed += 1
                self._slot_req[slot] = None
                freed = np.zeros((self.slots,), bool)
                freed[slot] = True
                self.state = deactivate(self.state, jnp.asarray(freed))
                return True
        return False

    def stats(self) -> dict:
        """Scheduler observability snapshot (host-side, no device sync)."""
        out = {
            "slots": self.slots,
            "active": self.n_active,
            "pending": len(self.pending),
            "completed": self._completed,
            "max_seq_len": self.S,
            "kv_quant": self.kv_quant,
            "steps_per_sync": self.steps_per_sync,
            "tensor_parallel": self.mesh is not None,
            "speculative_k": self._spec_k,
        }
        if self._spec_k and self._spec_rounds:
            # clamp: a cross-thread read between the two counter updates
            # can still observe a transiently-high emitted total
            rate = ((self._spec_emitted - self._spec_rounds)
                    / (self._spec_rounds * self._spec_k))
            out["speculative_accept_rate"] = round(min(max(rate, 0.0), 1.0), 4)
            out["speculative_tokens_per_round"] = round(
                min(self._spec_emitted / self._spec_rounds,
                    self._spec_k + 1), 3)
        return out

    # -- scheduling --------------------------------------------------------
    def _admit_pending(self) -> None:
        free = [s for s in range(self.slots) if self._slot_req[s] is None]
        take = self.pending[: len(free)]
        if not take:
            return
        self.pending = self.pending[len(take):]
        longest = max(len(r.prompt) for r in take)
        # fixed admission shapes — ONE small bucket plus the full window —
        # so at most two compiles ever; shape-stable admission matters far
        # more than trimmed prefill FLOPs on dispatch/compile-bound runtimes
        bucket = self._admit_small if longest <= self._admit_small else self.S
        N = self.slots
        prompts = np.zeros((N, bucket), np.int32)
        lens = np.ones((N,), np.int32)
        slot_idx = np.zeros((N,), np.int32)
        valid = np.zeros((N,), bool)
        for i, (req, slot) in enumerate(zip(take, free)):
            P = len(req.prompt)
            prompts[i, :P] = req.prompt
            lens[i] = P
            slot_idx[i] = slot
            valid[i] = True
            self._slot_req[slot] = req
            self._temps[slot] = req.temperature
            self._topk[slot] = req.top_k
            self._topp[slot] = req.top_p
            self.results[req.request_id] = RequestResult(
                req.request_id, list(req.prompt))
        self._samp_dev = self._sampling_device()
        self.state = admit_many(
            self.params, self.cfg, self.state,
            jnp.asarray(slot_idx), jnp.asarray(prompts),
            jnp.asarray(lens), jnp.asarray(valid),
        )

    def _retire(self, tokens: np.ndarray,
                snapshot: list[Request | None] | None = None,
                ) -> list[tuple[int, list[int], str]]:
        """Consume one chunk of sampled tokens; free finished slots.

        ``snapshot`` is the slot→request mapping at the chunk's dispatch
        time. Retiring against it (with an identity check against the
        live mapping) makes late retirement safe: tokens for a slot that
        has since been re-admitted to a different request are dropped
        instead of being credited to the new request.

        Returns streaming events: one (request_id, new_tokens,
        finish_reason) per request that produced tokens this chunk, with
        finish_reason "" while the request is still running."""
        finished = np.zeros((self.slots,), bool)
        events: list[tuple[int, list[int], str]] = []
        for slot, req in enumerate(snapshot or self._slot_req):
            if req is None or self._slot_req[slot] is not req:
                continue
            res = self.results[req.request_id]
            fresh: list[int] = []
            for t in tokens[slot]:
                t = int(t)
                res.tokens.append(t)
                fresh.append(t)
                if t in req.stop_ids:
                    res.finish_reason = "stop"
                    break
                if len(res.tokens) >= req.max_new_tokens:
                    res.finish_reason = "length"
                    break
            if fresh:
                events.append((req.request_id, fresh, res.finish_reason))
            if res.finish_reason:
                finished[slot] = True
                self._slot_req[slot] = None
                self._completed += 1
        if finished.any():
            self.state = deactivate(self.state, jnp.asarray(finished))
        return events

    def _dispatch_chunk(self):
        """Admit pending, then dispatch one decode chunk (no fetch).

        Returns (tokens device array, slot→request snapshot) or None when
        nothing is active. Overshoot past per-request budgets within the
        chunk is discarded on the host at retirement."""
        self._admit_pending()
        if self.n_active == 0:
            return None
        self._key, sub = jax.random.split(self._key)
        if self._spec_k:
            from genomics_lm_tpu.serving.speculative import (
                serve_steps_speculative)

            # static fast path when no ACTIVE request uses top-k/top-p
            # (slot params persist after retirement — mask to live slots,
            # else one finished top-k request disables the fast path until
            # its slot happens to be reused). The flag is STICKY once a
            # filtered request has been seen: flapping it as filtered
            # requests arrive/drain would trigger a full recompile stall
            # each way on a live server — one transition (and one cached
            # program per variant) is the bound. warm_spec_filters=True
            # precompiles the filtered variant at construction instead.
            live = np.array([r is not None for r in self._slot_req])
            use_filters = self._spec_filters_seen or bool(
                (self._topk[live] > 0).any()
                or ((self._topp[live] > 0) & (self._topp[live] < 1)).any())
            self._spec_filters_seen = use_filters
            self.state, toks, counts = serve_steps_speculative(
                self.params, self.cfg, self.state, self.steps_per_sync,
                self._samp_dev, self._table, sub, self._allowed,
                self._spec_k, self.mesh, use_filters,
            )
            # pack counts + tokens into ONE device array: the host-side
            # retire then fetches a single buffer — on relayed runtimes
            # each fetch is a round trip, and two per chunk measurably
            # drags the drain
            packed = jnp.concatenate([counts[:, :, None], toks], axis=2)
            return packed, list(self._slot_req)
        self.state, toks = serve_steps(
            self.params, self.cfg, self.state, self.steps_per_sync,
            self._samp_dev, sub, self._allowed, self.mesh,
        )
        return toks, list(self._slot_req)

    def _chunk_token_rows(self, payload) -> list:
        """Materialize a dispatched chunk into per-slot token sequences.

        Plain chunks are a dense (slots, steps) array; speculative chunks
        are packed (slots, rounds, 1 + K+1) arrays — per round, column 0
        is the emitted count and only the first ``count`` of the
        remaining columns are real tokens."""
        if self._spec_k:
            packed = np.asarray(payload)
            counts = packed[:, :, 0]
            toks = packed[:, :, 1:]
            # live acceptance telemetry: counts > 0 marks an active
            # (slot, round) pair; each emitted 1 + m tokens of which m
            # were accepted drafts. Emitted increments FIRST: stats() may
            # read from another thread (the HTTP /stats handler), and
            # emitted >= rounds must hold in every observable interleaving
            self._spec_emitted += int(counts.sum())
            self._spec_rounds += int((counts > 0).sum())
            return [
                [int(t)
                 for r in range(toks.shape[1])
                 for t in toks[s, r, : counts[s, r]]]
                for s in range(self.slots)
            ]
        return np.asarray(payload)

    def step(self) -> int:
        """Admit + decode one chunk + retire. Returns #tokens sampled
        (speculative mode emits a variable count, so it is summed from
        the chunk's actual per-round counts)."""
        chunk = self._dispatch_chunk()
        if chunk is None:
            return 0
        rows = self._chunk_token_rows(chunk[0])
        self._retire(rows, chunk[1])
        if self._spec_k:
            return sum(len(r) for r in rows)
        return int(self.n_active and self.steps_per_sync * self.slots)

    def run(self, max_chunks: int = 10_000, *,
            pipelined: bool = True,
            pipeline_depth: int | None = None) -> dict[int, RequestResult]:
        """Drain the queue; returns {request_id: RequestResult}.

        ``pipelined`` keeps decode chunks in flight: while chunk N runs
        on the device, the host fetches and retires earlier chunks and
        admits into the state later chunks will see. This hides the
        per-chunk dispatch + fetch latency (dominant on relayed runtimes)
        at the cost of finished slots decoding extra (discarded) chunks
        before they free. ``pipeline_depth`` (default: the engine's
        ``pipeline_depth``, itself default 1) sets how many chunks stay
        in flight — on runtimes whose fetch round trip exceeds the chunk
        compute time, depth 2–3 keeps the device busy through the fetch.
        GREEDY outputs are identical at every depth (a slot's tokens
        depend only on its own admission, and overshoot past a request's
        stop/budget is discarded on the host). Sampled (temperature > 0)
        outputs are drawn from the identical per-token distribution but
        the realized draws can differ: pipelining delays re-admission
        into a freed slot, shifting which split of the engine key serves
        that request."""
        for _ in self.stream(max_chunks, pipelined=pipelined,
                             pipeline_depth=pipeline_depth):
            pass
        return self.results

    def stream(self, max_chunks: int = 10_000, *, pipelined: bool = True,
               pipeline_depth: int | None = None):
        """Drain the queue, yielding token deltas as they are decoded.

        Generator of (request_id, new_tokens, finish_reason) events —
        one per request per chunk in which it produced tokens;
        ``finish_reason`` is "" while the request is still running, then
        "stop" or "length" on its final event. The same scheduling as
        ``run`` (which simply exhausts this generator); see ``run`` for
        the ``pipelined``/``pipeline_depth`` semantics. ``self.results``
        accumulates the full per-request outputs as usual."""
        if not pipelined:
            for _ in range(max_chunks):
                if not self.pending and self.n_active == 0:
                    return
                chunk = self._dispatch_chunk()
                if chunk is not None:
                    yield from self._retire(self._chunk_token_rows(chunk[0]), chunk[1])
            raise RuntimeError("serving run did not drain within max_chunks")

        from collections import deque

        depth = max(1, int(pipeline_depth or self.pipeline_depth))
        inflight: deque = deque()  # (tokens, slot→request snapshot) FIFO
        try:
            for _ in range(max_chunks):
                if not self.pending and self.n_active == 0 and not inflight:
                    return
                # keep ``depth`` chunks still in flight WHILE the oldest
                # is fetched/retired below (so fill to depth + 1 before
                # popping); chunks queue on the device, keeping compute
                # busy through the fetch round trip
                while len(inflight) < depth + 1:
                    chunk = self._dispatch_chunk()
                    if chunk is None:
                        break
                    inflight.append(chunk)
                if not inflight:
                    return
                # pop BEFORE yielding: _retire completes its bookkeeping
                # before any event is yielded, so if the consumer closes
                # the generator mid-yield, ``inflight`` holds exactly the
                # chunks still needing retirement (no double-retire)
                prev = inflight.popleft()
                yield from self._retire(self._chunk_token_rows(prev[0]), prev[1])
        finally:
            # an abandoned generator (consumer break / close) must not drop
            # dispatched-but-unretired chunks: the device state already
            # advanced, so skipping retirement would leave a silent gap in
            # every active request's tokens if draining resumes later
            while inflight:
                prev = inflight.popleft()
                self._retire(self._chunk_token_rows(prev[0]), prev[1])
        raise RuntimeError("serving run did not drain within max_chunks")


__all__ = [
    "PROMPT_BUCKET",
    "Request",
    "RequestResult",
    "ServingEngine",
    "admit_many",
    "deactivate",
    "init_serving_state",
    "serve_steps",
]
