"""Speculative decoding: bigram-draft proposals + chunked target verify.

Decode on TPU is bound by reading the KV cache from HBM every step
(``ops/decode_attention.py``); the model weights are re-read per step
too. Verifying K drafted tokens in ONE pass costs nearly the same HBM
traffic as decoding one token, so accepted drafts are almost free —
speculative decoding converts draft-model agreement directly into
decode throughput, with the output distribution provably unchanged
(Leviathan et al. / Chen et al. rejection-sampling scheme).

The draft model here is a smoothed bigram table over the codon
vocabulary — the same Markov statistics the reference uses as its
perplexity baselines (``eval_ppl_baselines.py``; reference
``docs/PERPLEXITY_BASELINES.md``): bacterial codon sequences have strong
first-order structure (the bigram baseline is within ~7% of the trained
model's perplexity on the corrected splits), so a 68×68 probability
table — resident in a few KB, sampled in one gather — proposes several
tokens per round at useful acceptance rates. No second transformer, no
extra weights to read.

One speculative round (``_speculative_round``):

    1. sample t0 from the pending next-token distribution
    2. chain K draft tokens d1..dK from the bigram table
    3. ONE ragged chunk forward verifies [t0, d1..dK] against the cache
       (per-slot positions — this composes with continuous batching)
    4. per-slot rejection sampling: accept the longest prefix, emit
       1 + m tokens (t0 plus m accepted drafts); the next pending
       distribution is the residual norm(max(p − q, 0)) on rejection or
       the bonus row p_K when everything was accepted

Per-slot sampling params (temperature / top-k / top-p, greedy ≤ 0) are
applied to the target rows BEFORE acceptance, so each emitted token is
drawn from exactly the distribution the plain path samples from; greedy
requests emit bit-identical tokens to ``generate_tokens`` (tested).

The cache is written optimistically for all K+1 chunk rows; a rejection
simply leaves the stale rows above the committed ``lengths`` — they are
masked out (position ≥ length) and overwritten by the next round. State
therefore needs K+1 slots of headroom beyond every active request's
budget; ``ServingEngine`` over-allocates its cache accordingly.

No reference analog (the reference decodes one token per full
re-forward, ``generate.py:13-27``); this is TPU-serving headroom on top
of parity, stacked on the packed-lane cache + int8 + continuous
batching.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genomics_lm_tpu.models import CodonGPTConfig
from genomics_lm_tpu.models.codon_gpt import (
    _layer_norm,
    _lm_logits,
    _qkv,
    block_epilogue,
    rope_cos_sin,
    rotate_half,
)
from genomics_lm_tpu.ops.attention import NEG_INF
from genomics_lm_tpu.ops.decode_attention import (
    KERNEL_MAX_BATCH,
    decode_attention_chunk,
    decode_attention_chunk_xla,
)


def fit_bigram_table(stream, vocab_size: int, alpha: float = 0.5,
                     exclude_ids: tuple = ()) -> np.ndarray:
    """(V, V) draft table: smoothed P(next | prev) from a token stream.

    ``stream``: one 1-D int sequence or a list of sequences (e.g. the
    packed training windows, or tokens sampled from the target model).
    Add-``alpha`` smoothing keeps every row strictly positive — the
    acceptance ratio p/q is then always finite. ``exclude_ids`` drops
    transitions into or out of the named tokens (pass ``(0,)`` when
    fitting on padded packed windows — pad transitions are artifacts).
    The draft needs no exactness, only overlap with the target's
    conditionals; reference Markov-baseline counting semantics
    (``eval_ppl_baselines.py``)."""
    counts = np.full((vocab_size, vocab_size), float(alpha), np.float64)
    if isinstance(stream, (list, tuple)):
        seqs = stream
    else:
        arr = np.asarray(stream)
        # a 2-D (N, T) window array is N sequences — raveling it would
        # invent a fake last-token→first-token transition per row
        seqs = list(arr) if arr.ndim == 2 else [arr]
    for s in seqs:
        s = np.asarray(s, np.int64).ravel()
        if s.size < 2:
            continue
        prev, nxt = s[:-1], s[1:]
        if exclude_ids:
            keep = ~(np.isin(prev, exclude_ids) | np.isin(nxt, exclude_ids))
            prev, nxt = prev[keep], nxt[keep]
        np.add.at(counts, (prev, nxt), 1.0)
    return (counts / counts.sum(axis=1, keepdims=True)).astype(np.float32)


def restrict_table(table: np.ndarray, allowed: np.ndarray,
                   floor: float = 1e-6) -> np.ndarray:
    """Mask draft-table columns to an allowed-token set and renormalize.

    Drafting a token the sampler can never emit wastes the proposal (it
    is always rejected); restricting q to the allowed set keeps the
    scheme exact (the target rows are masked identically) and lifts the
    acceptance rate. ``floor`` keeps allowed columns strictly positive."""
    t = np.where(allowed[None, :], np.maximum(table, floor), 0.0)
    return (t / t.sum(axis=1, keepdims=True)).astype(np.float32)


def _slot_probs(logits: jnp.ndarray, sampling: dict,
                allowed_mask: jnp.ndarray | None,
                use_filters: bool = True) -> jnp.ndarray:
    """Per-slot transformed next-token distribution, as probabilities.

    Shares ``serve_steps``'s filter chain structurally
    (``engine.filtered_sampling_logits`` — allowed mask → temperature →
    top-k → top-p), so the speculative path samples from exactly the
    distribution the plain sampler draws from; greedy slots
    (temperature ≤ 0) become an exact one-hot of the argmax so greedy
    acceptance is deterministic. logits: (B, V) raw f32 rows; returns
    (B, V) f32 probabilities. ``use_filters`` False (static) skips the
    top-k/top-p sort chain — callers pass it when every slot has both
    disabled, saving ~4 sorts per verified token."""
    from genomics_lm_tpu.serving.engine import filtered_sampling_logits

    temps = sampling["temps"]
    V = logits.shape[-1]
    greedy_tok, scaled = filtered_sampling_logits(
        logits, sampling, allowed_mask, use_filters)
    greedy = jax.nn.one_hot(greedy_tok, V, dtype=jnp.float32)
    probs = jax.nn.softmax(scaled, axis=-1)
    return jnp.where((temps <= 0)[:, None], greedy, probs)


def speculative_acceptance(P: jnp.ndarray, Q: jnp.ndarray,
                           drafts: jnp.ndarray, uniforms: jnp.ndarray):
    """Vectorized rejection sampling over one verification chunk.

    P: (B, K+1, V) target probabilities — row i is the distribution after
       consuming [t0, d1..d_i] (row 0 tests d1, row K is the bonus row).
    Q: (B, K, V) draft distributions that proposed d1..dK.
    drafts: (B, K) proposed tokens; uniforms: (B, K) in [0, 1).

    Returns (m, next_probs): ``m`` (B,) the number of accepted drafts
    (longest prefix), ``next_probs`` (B, V) the distribution the next
    emitted token must be drawn from — the residual norm(max(P_m − Q_m, 0))
    at the first rejection, or the bonus row P_K when all K were accepted.
    Acceptance uses u·q < p (no division, q = 0 safe)."""
    K = Q.shape[1]
    q_d = jnp.take_along_axis(Q, drafts[:, :, None], axis=2)[..., 0]
    p_d = jnp.take_along_axis(P[:, :K], drafts[:, :, None], axis=2)[..., 0]
    accept = uniforms * q_d < p_d
    acc = jnp.cumprod(accept.astype(jnp.int32), axis=1)
    m = jnp.sum(acc, axis=1)  # (B,) in [0, K]
    P_m = jnp.take_along_axis(P, m[:, None, None], axis=1)[:, 0]
    Q_m = jnp.take_along_axis(
        Q, jnp.minimum(m, K - 1)[:, None, None], axis=1)[:, 0]
    res = jnp.maximum(P_m - Q_m, 0.0)
    mass = jnp.sum(res, axis=-1, keepdims=True)
    # zero residual mass ⇔ P == Q, which cannot reject; guard float edges
    res = jnp.where(mass > 0, res / jnp.maximum(mass, 1e-20), P_m)
    next_probs = jnp.where((m == K)[:, None], P_m, res)
    return m, next_probs


def _ragged_verify(params, cfg: CodonGPTConfig, state: dict,
                   tokens: jnp.ndarray, mesh=None):
    """One chunk forward: append T tokens per slot, logits at every row.

    The multi-token generalization of ``serving.engine._ragged_decode``
    (same packed-lane cache writes, same int8 handling, per-slot
    positions); attention goes through ``decode_attention_chunk_xla``
    with a (B, T, S) mask — cached positions valid for row i iff
    position < length + i + 1 and segment-compatible, plus the row's own
    slot. Returns (logits (B, T, V) f32, cache updates dict,
    chunk_seg (B, T)). ``lengths``/``seg_count``/``last_logits`` are NOT
    committed here — the caller commits after acceptance."""
    B, T = tokens.shape
    S = state["seg"].shape[1]
    lengths = state["lengths"]
    active = state["active"]
    offs = jnp.arange(T)
    wpos = jnp.minimum(lengths[:, None] + offs[None, :], S - 1)  # (B, T)
    bidx = jnp.arange(B)
    if cfg.sep_id is not None:
        seg_inc = jnp.cumsum((tokens == cfg.sep_id).astype(jnp.int32), axis=1)
    else:
        seg_inc = jnp.zeros((B, T), jnp.int32)
    chunk_seg = state["seg_count"][:, None] + seg_inc  # (B, T)

    x = params["tok_emb"].astype(cfg.dtype)[tokens]  # (B, T, C)
    pos_clip = jnp.minimum(
        lengths[:, None] + offs[None, :], cfg.block_size - 1)  # (B, T)
    if not cfg.use_rope:
        x = x + params["pos_emb"].astype(cfg.dtype)[pos_clip]
    else:
        cos_full, sin_full = rope_cos_sin(
            cfg.block_size, cfg.head_dim, cfg.rope_base, cfg.dtype)
        cos_b = cos_full[pos_clip][:, None, :, :]  # (B, 1, T, D)
        sin_b = sin_full[pos_clip][:, None, :, :]

    # write the chunk's segment ids (guarded like _ragged_decode: a frozen
    # full slot must not have its top row overwritten)
    old_rows = state["seg"][bidx[:, None], wpos]
    new_seg_arr = state["seg"].at[bidx[:, None], wpos].set(
        jnp.where(active[:, None], chunk_seg, old_rows))

    positions = jnp.arange(S)
    # row i may attend every position below length + i + 1 (the cache plus
    # chunk rows 0..i, which sit at length..length+i) when segments match,
    # and always its own slot
    avail = positions[None, None, :] < (
        lengths[:, None] + offs[None, :] + 1)[:, :, None]      # (B, T, S)
    seg_ok = new_seg_arr[:, None, :] == chunk_seg[:, :, None]  # (B, T, S)
    self_pos = positions[None, None, :] == wpos[:, :, None]
    valid = (avail & seg_ok) | self_pos
    mask_add = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)

    # the fused chunk kernel needs the whole pipeline un-partitioned
    # (pallas under GSPMD); tensor-parallel serving uses the einsum path
    use_kernel = (
        cfg.attention_impl == "flash" and B <= KERNEL_MAX_BATCH
        and mesh is None
    )
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
        q, k, v = _qkv(block_p, h, cfg)  # (B, H, T, D), (B, Hkv, T, D)
        if cfg.use_rope:
            q = q * cos_b + rotate_half(q) * sin_b
            k = k * cos_b + rotate_half(k) * sin_b
        if kv_quant:
            k, k_sc = quantize_kv(k)  # int8 (B,Hkv,T,D), f32 (B,Hkv,T)
            v, v_sc = quantize_kv(v)
            # advanced indexing (B,1)+(B,T) around the ':' puts the routed
            # axes first: target block (B, T, Hkv)
            new_k_scale = new_k_scale.at[layer, bidx[:, None], :, wpos].set(
                k_sc.transpose(0, 2, 1))
            new_v_scale = new_v_scale.at[layer, bidx[:, None], :, wpos].set(
                v_sc.transpose(0, 2, 1))
        # T contiguous packed lane rows per slot: (B, T, P)
        new_k = new_k.at[layer, bidx[:, None], wpos, :].set(
            k.transpose(0, 2, 1, 3).reshape(B, T, -1).astype(new_k.dtype))
        new_v = new_v.at[layer, bidx[:, None], wpos, :].set(
            v.transpose(0, 2, 1, 3).reshape(B, T, -1).astype(new_v.dtype))
        ks = new_k_scale if kv_quant else None
        vs = new_v_scale if kv_quant else None
        if use_kernel:
            # fused multi-query kernel: the whole chunk verifies on ONE
            # raw cache read (ops/decode_attention.decode_attention_chunk)
            y = decode_attention_chunk(
                q, new_k, new_v, mask_add, layer, ks, vs,
                kv_heads=cfg.kv_heads,
            )
        else:
            # einsum path: parity reference, and under a tensor-parallel
            # mesh GSPMD partitions it along the sharded head/lane axes
            # (a pallas_call cannot be GSPMD-partitioned)
            y = decode_attention_chunk_xla(
                q, new_k, new_v, mask_add, layer, ks, vs,
                compute_dtype=cfg.dtype, kv_heads=cfg.kv_heads,
            )
        y = y.astype(cfg.dtype).transpose(0, 2, 1, 3).reshape(B, T, cfg.n_embd)
        x = block_epilogue(block_p, cfg, x, y)

    x = _layer_norm(params["ln_f"], x)
    logits = _lm_logits(params, cfg, x).astype(jnp.float32)  # (B, T, V)

    upd = {"k": new_k, "v": new_v, "seg": new_seg_arr}
    if kv_quant:
        upd["k_scale"] = new_k_scale
        upd["v_scale"] = new_v_scale
    return logits, upd, chunk_seg


def _speculative_round(params, cfg: CodonGPTConfig, state: dict,
                       sampling: dict, table: jnp.ndarray, key: jax.Array,
                       n_draft: int, allowed_mask: jnp.ndarray | None,
                       mesh=None, use_filters: bool = True):
    """One draft→verify→accept round; returns (state, tokens, counts).

    tokens: (B, K+1) = [t0, d1..dK]; counts: (B,) emitted tokens this
    round (1 + accepted, 0 for inactive slots) — tokens[:, :counts] are
    the committed outputs, the rest were rejected drafts."""
    B = state["lengths"].shape[0]
    K = int(n_draft)
    S = state["seg"].shape[1]
    active = state["active"]
    k_t0, k_draft, k_acc = jax.random.split(key, 3)

    # pending next-token distribution: raw logits (fresh admission) get
    # the slot's sampling transform; a previous round's residual/bonus is
    # already transformed and must be sampled as-is
    P0 = jnp.where(
        state["logits_raw"][:, None],
        _slot_probs(state["last_logits"], sampling, allowed_mask, use_filters),
        jnp.exp(state["last_logits"]),
    )
    t0 = jax.random.categorical(k_t0, jnp.log(P0), axis=-1).astype(jnp.int32)

    def draft_body(prev, k):
        rows = table[prev]  # (B, V)
        if use_filters:
            # pass the draft rows through each slot's own sampling chain
            # (temperature → top-k → top-p), mirroring the allowed_mask
            # handling: without this, a slot with aggressive filters
            # rejects every draft outside the target's nucleus and the
            # speedup silently collapses. Exactness is preserved for any
            # Q — the SAME transformed rows are used for drafting and in
            # speculative_acceptance, and tokens with Q=0 but P>0 are
            # covered by the residual resample.
            rows = _slot_probs(jnp.log(rows), sampling, allowed_mask, True)
        d = jax.random.categorical(k, jnp.log(rows), axis=-1).astype(jnp.int32)
        return d, (d, rows)

    _, (drafts_t, q_rows_t) = jax.lax.scan(
        draft_body, t0, jax.random.split(k_draft, K))
    drafts = drafts_t.T                 # (B, K)
    Q = q_rows_t.transpose(1, 0, 2)     # (B, K, V)

    tokens = jnp.concatenate([t0[:, None], drafts], axis=1)  # (B, K+1)
    tokens = jnp.where(active[:, None], tokens, 0)

    logits_rows, upd, chunk_seg = _ragged_verify(
        params, cfg, state, tokens, mesh)
    P = jax.vmap(
        lambda lg: _slot_probs(lg, sampling, allowed_mask, use_filters),
        in_axes=1, out_axes=1,
    )(logits_rows)                      # (B, K+1, V)
    m, next_probs = speculative_acceptance(
        P, Q, drafts, jax.random.uniform(k_acc, drafts.shape))

    out = dict(state)
    out.update(upd)
    out["lengths"] = jnp.where(
        active, jnp.minimum(state["lengths"] + 1 + m, S), state["lengths"])
    last_seg = jnp.take_along_axis(chunk_seg, m[:, None], axis=1)[:, 0]
    out["seg_count"] = jnp.where(active, last_seg, state["seg_count"])
    out["last_logits"] = jnp.where(
        active[:, None], jnp.log(next_probs), state["last_logits"])
    out["logits_raw"] = jnp.where(active, False, state["logits_raw"])
    counts = jnp.where(active, 1 + m, 0)
    return out, tokens, counts


@functools.partial(
    jax.jit, static_argnums=(1, 3, 8, 9, 10), donate_argnums=(2,))
def serve_steps_speculative(
    params,
    cfg: CodonGPTConfig,
    state: dict,
    n_rounds: int,
    sampling: dict,
    table: jnp.ndarray,
    key: jax.Array,
    allowed_mask: jnp.ndarray | None = None,
    n_draft: int = 4,
    mesh=None,
    use_filters: bool = True,
) -> tuple[dict, jnp.ndarray, jnp.ndarray]:
    """One compiled scan of ``n_rounds`` speculative rounds.

    The speculative counterpart of ``serve_steps``: same per-slot
    sampling params and allowed mask, but each round emits a VARIABLE
    1..K+1 tokens per slot. Returns (state, tokens (B, n_rounds, K+1),
    counts (B, n_rounds)); per slot and round only the first
    ``counts`` tokens are real — the host retires with the counts.
    Active slots need K+1 slots of cache headroom (see module doc)."""

    def body(state, key):
        state, tokens, counts = _speculative_round(
            params, cfg, state, sampling, table, key, n_draft, allowed_mask,
            mesh, use_filters)
        return state, (tokens, counts)

    state, (tokens, counts) = jax.lax.scan(
        body, state, jax.random.split(key, n_rounds))
    return state, tokens.transpose(1, 0, 2), counts.T


@functools.partial(jax.jit, static_argnums=(1, 3, 6, 8))
def generate_tokens_speculative(
    params,
    cfg: CodonGPTConfig,
    prompts: jnp.ndarray,
    n_tokens: int,
    key: jax.Array,
    table: jnp.ndarray,
    n_draft: int,
    temperature: jnp.ndarray | float = 1.0,
    kv_quant: bool = False,
    allowed_mask: jnp.ndarray | None = None,
):
    """Whole-speculative-generation-in-one-program (cf. ``generate_tokens``).

    Prefill + a ``lax.while_loop`` of draft→verify→accept rounds until
    every row has ``n_tokens`` — ONE device dispatch for the entire
    generation, so the tunnel/dispatch overhead profile matches the plain
    scan path. Emitted tokens land in a per-row cursor-indexed output
    buffer; finished rows deactivate (their slots stop writing).

    ``allowed_mask``: optional (V,) bool vocabulary restriction — the
    speculative counterpart of ``generate_masked_tokens`` (e.g. the CDS
    codon set for the design loop's candidate fan-out). Restrict the
    draft ``table`` to the same set (``restrict_table``) or drafts
    outside it are always rejected.

    Returns (tokens (B, n_tokens), active_row_rounds, emitted_total) —
    the scalars let callers compute acceptance statistics."""
    B, Plen = prompts.shape
    K = int(n_draft)
    if Plen + int(n_tokens) > cfg.block_size:
        raise ValueError(
            f"prompt+n_tokens {Plen + int(n_tokens)} exceeds block_size "
            f"{cfg.block_size}")
    from genomics_lm_tpu.generation.decode import CACHE_BUCKET, prefill

    # chunk headroom past the horizon, rounded to the cache bucket —
    # unaligned cache sublane dims put the fused kernel on Mosaic's
    # padded slow path (measured 3.5× per round at S = 202 vs 256)
    raw = Plen + int(n_tokens) + 2 * (K + 1)
    S = ((raw + CACHE_BUCKET - 1) // CACHE_BUCKET) * CACHE_BUCKET
    logits0, cache, _ = prefill(params, cfg, prompts, S, kv_quant,
                                want_aux=False)
    state = {
        "k": cache["k"],
        "v": cache["v"],
        "seg": cache["seg"],
        "lengths": jnp.full((B,), Plen, jnp.int32),
        "seg_count": cache["seg_count"],
        "last_logits": logits0.astype(jnp.float32),
        "logits_raw": jnp.ones((B,), bool),
        "active": jnp.ones((B,), bool),
    }
    if kv_quant:
        state["k_scale"] = cache["k_scale"]
        state["v_scale"] = cache["v_scale"]
    sampling = {
        "temps": jnp.full((B,), temperature, jnp.float32),
        "top_k": jnp.zeros((B,), jnp.int32),
        "top_p": jnp.zeros((B,), jnp.float32),
    }
    # width n_tokens + one scratch column where discarded (masked) chunk
    # positions park their writes
    out_buf = jnp.zeros((B, int(n_tokens) + 1), jnp.int32)
    bidx = jnp.arange(B)

    def cond(carry):
        return jnp.any(carry[2] < n_tokens)

    def body(carry):
        state, out_buf, filled, key, row_rounds, emitted = carry
        key, sub = jax.random.split(key)
        state = dict(state)
        state["active"] = filled < n_tokens
        state, tokens, counts = _speculative_round(
            params, cfg, state, sampling, table, sub, K, allowed_mask,
            use_filters=False)
        offs = jnp.arange(K + 1)
        real = offs[None, :] < counts[:, None]
        idx = jnp.where(real, filled[:, None] + offs[None, :], n_tokens)
        idx = jnp.minimum(idx, n_tokens)  # overshoot parks in scratch col
        out_buf = out_buf.at[bidx[:, None], idx].set(
            jnp.where(real, tokens, out_buf[:, n_tokens][:, None]))
        filled = filled + counts
        row_rounds = row_rounds + jnp.sum(state["active"].astype(jnp.int32))
        emitted = emitted + jnp.sum(counts)
        return (state, out_buf, filled, key, row_rounds, emitted)

    init = (state, out_buf, jnp.zeros((B,), jnp.int32), key,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    _, out_buf, _, _, row_rounds, emitted = jax.lax.while_loop(
        cond, body, init)
    return out_buf[:, : int(n_tokens)], row_rounds, emitted


def speculative_generate(
    params,
    cfg: CodonGPTConfig,
    prompts,
    n_tokens: int,
    key: jax.Array,
    table,
    n_draft: int = 4,
    temperature: float = 1.0,
    kv_quant: bool = False,
    rounds_per_sync: int = 8,  # kept for API stability; unused
):
    """Offline batched speculative sampling: (B, P) prompts → (B, n_tokens).

    Same output distribution as ``generate_tokens`` (greedy: identical
    tokens — tested); one compiled program per call
    (``generate_tokens_speculative``). Returns (tokens np.int32, stats
    dict with ``rounds`` (mean active rounds per row), ``accept_rate`` =
    mean accepted drafts / K, and ``tokens_per_round``)."""
    del rounds_per_sync
    prompts = jnp.asarray(prompts, jnp.int32)
    toks, row_rounds, emitted = generate_tokens_speculative(
        params, cfg, prompts, int(n_tokens), key,
        jnp.asarray(table, jnp.float32), int(n_draft),
        float(temperature), bool(kv_quant))
    row_rounds = int(row_rounds)
    emitted = int(emitted)
    B = prompts.shape[0]
    stats = {
        "rounds": row_rounds / max(1, B),
        "accept_rate": (emitted - row_rounds) / max(1, row_rounds * int(n_draft)),
        "tokens_per_round": emitted / max(1, row_rounds),
    }
    return np.asarray(toks), stats


__all__ = [
    "fit_bigram_table",
    "generate_tokens_speculative",
    "restrict_table",
    "speculative_acceptance",
    "speculative_generate",
    "serve_steps_speculative",
]
