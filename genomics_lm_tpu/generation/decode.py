"""Autoregressive decoding: jitted KV-cache step + uncached parity path.

The KV cache is a static-shape pytree: per layer stacked keys/values in
the packed-lane layout (L, B, S, P) with ``P = Hkv * head_dim`` on the
lane axis (zero lane padding — see ``ops/decode_attention.py``) plus a
scalar length. ``prefill``
runs one full forward (capturing every layer's K/V); ``decode_step`` then
attends one new token against the cache — O(T) per token instead of the
reference's O(T²) full re-forward (``generate.py:13-27``).

Segment semantics: the running segment counter reproduces
``cumsum(idx == sep_id)``; a cached decode only attends to positions with
the same segment id, exactly the training-time mask. Position embeddings and
RoPE use the absolute position in the (clipped) window, so cached and
uncached paths emit identical logits while the context fits in
``block_size``; past that, callers fall back to the reference's
clip-and-recompute behavior (``next_token_logits``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genomics_lm_tpu.models.codon_gpt import (
    _embed,
    _layer_norm,
    _linear,
    _lm_logits,
    _qkv,
    apply_rope,
    block_epilogue,
    rope_cos_sin,
)
from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt
from genomics_lm_tpu.ops.attention import NEG_INF
from genomics_lm_tpu.ops.decode_attention import (
    decode_attention,
    decode_attention_xla,
)


CACHE_BUCKET = 128  # cache sizes round up to multiples of this


def cache_bucket(cfg: CodonGPTConfig, horizon: int) -> int:
    """Smallest bucketed cache size covering ``horizon`` positions.

    Decode attention reads the whole (static-shape) cache every step, so a
    generation that will never exceed N positions should carry an N-slot
    cache, not a block_size one — at d384 b64 a 256-slot cache halves the
    per-step HBM traffic vs the 512 default."""
    rounded = ((max(1, int(horizon)) + CACHE_BUCKET - 1) // CACHE_BUCKET) * CACHE_BUCKET
    return min(cfg.block_size, rounded)


def init_cache(
    cfg: CodonGPTConfig,
    batch: int = 1,
    cache_size: int | None = None,
    kv_quant: bool = False,
) -> dict:
    """Empty KV cache for ``batch`` sequences (``cache_size`` ≤ block_size).

    With ``kv_quant`` the cache stores int8 K/V plus per-vector f32 scales
    (``ops/quant.py``) — half the HBM traffic per decode step; the scales
    factor out of both attention contractions so the int8 cache is read
    raw, never dequantized into a full-size temporary.
    """
    S = cfg.block_size if cache_size is None else int(cache_size)
    # packed-lane layout: all heads' K (or V) for one position in one
    # contiguous lane row — zero lane padding, one-row appends
    shape = (cfg.n_layer, batch, S, cfg.kv_heads * cfg.head_dim)
    cache = {
        "k": jnp.zeros(shape, jnp.int8 if kv_quant else cfg.dtype),
        "v": jnp.zeros(shape, jnp.int8 if kv_quant else cfg.dtype),
        "seg": jnp.zeros((batch, S), jnp.int32),
        "length": jnp.zeros((), jnp.int32),
        "seg_count": jnp.zeros((batch,), jnp.int32),
    }
    if kv_quant:
        # (L, B, Hkv, S): the kernel's per-block scale has Mosaic-legal
        # (Hkv sublane, S lane) trailing dims
        scale_shape = (cfg.n_layer, batch, cfg.kv_heads, S)
        cache["k_scale"] = jnp.zeros(scale_shape, jnp.float32)
        cache["v_scale"] = jnp.zeros(scale_shape, jnp.float32)
    return cache


@functools.partial(jax.jit, static_argnums=(1, 3, 4, 6))
def prefill(params, cfg: CodonGPTConfig, idx: jnp.ndarray,
            cache_size: int | None = None,
            kv_quant: bool = False,
            last_index: jnp.ndarray | None = None,
            want_aux: bool = True) -> tuple[jnp.ndarray, dict, dict]:
    """Full forward over the prompt, returning (last logits, cache, aux).

    Prompt attention always runs full precision; with ``kv_quant`` the K/V
    written into the cache are int8 + per-vector scales. ``last_index``
    (scalar or (B,)) gathers the returned logits/aux at that position
    instead of the final one — right-padded prompts (the serving engine's
    fixed-bucket admission) read their true last token while causality
    keeps the pad positions from influencing it."""
    B, T = idx.shape
    cache = init_cache(cfg, B, cache_size, kv_quant)
    seg = jnp.cumsum((idx == cfg.sep_id).astype(jnp.int32), axis=1) if cfg.sep_id is not None else jnp.zeros((B, T), jnp.int32)

    x = _embed(params, cfg, idx, None, train=False, rng=None)
    rope = rope_cos_sin(T, cfg.head_dim, cfg.rope_base, cfg.dtype) if cfg.use_rope else None

    ks, vs = [], []
    for layer in range(cfg.n_layer):
        block_p = jax.tree.map(lambda p: p[layer], params["blocks"])
        h = _layer_norm(block_p["ln1"], x)
        q, k, v = _qkv(block_p, h, cfg)
        if rope is not None:
            q, k = apply_rope(q, k, *rope)
        ks.append(k)
        vs.append(v)
        # standard causal+segment attention over the prompt — always the
        # einsum path, independent of cfg.attention_impl. Measured: flash
        # prefill at serving-admission shapes is a net loss (22% slower
        # drain at the 512 bucket; small-tile variants fail Mosaic
        # compilation), because prefill T is short enough that the
        # materialized scores fit and XLA fuses the chain well.
        from genomics_lm_tpu.ops.attention import attention

        y = attention(q, k, v, segment_ids=seg if cfg.sep_id is not None else None)
        y = y.transpose(0, 2, 1, 3).reshape(B, T, cfg.n_embd)
        x = block_epilogue(block_p, cfg, x, y)

    x = _layer_norm(params["ln_f"], x)
    logits = _lm_logits(params, cfg, x)
    # aux heads (termination + per-offset MLPs + extra LM-head matmuls over
    # all T) are dead weight for generation/serving prefills — static-gated
    aux = _aux_heads(params, cfg, x) if want_aux else {}

    k_stack, v_stack = jnp.stack(ks), jnp.stack(vs)
    if kv_quant:
        from genomics_lm_tpu.ops.quant import quantize_kv

        k_stack, k_scale = quantize_kv(k_stack)
        v_stack, v_scale = quantize_kv(v_stack)
        cache["k_scale"] = cache["k_scale"].at[:, :, :, :T].set(k_scale)
        cache["v_scale"] = cache["v_scale"].at[:, :, :, :T].set(v_scale)
    L_, B_ = k_stack.shape[0], k_stack.shape[1]
    pack = lambda s: s.transpose(0, 1, 3, 2, 4).reshape(L_, B_, T, -1)
    cache["k"] = cache["k"].at[:, :, :T, :].set(pack(k_stack))
    cache["v"] = cache["v"].at[:, :, :T, :].set(pack(v_stack))
    cache["seg"] = cache["seg"].at[:, :T].set(seg)
    cache["length"] = jnp.asarray(T, jnp.int32)
    if last_index is None:
        take = lambda a: a[:, -1]
        cache["seg_count"] = seg[:, -1]
    else:
        last = jnp.asarray(last_index, jnp.int32)
        if last.ndim == 0:
            # uniform right-padding: set the cache length to the true end
            # so a subsequent decode_step overwrites the pad K/V instead
            # of attending them and appending after the pads
            cache["length"] = last + 1
        # ragged (B,) last_index: a scalar cache length cannot represent
        # per-row ends — the returned cache is then only consumable by
        # ragged consumers that track their own lengths (the serving
        # engine), NOT by decode_step
        take = lambda a: a[jnp.arange(B), last_index]
        cache["seg_count"] = take(seg)
    return take(logits), cache, {k: take(v) for k, v in aux.items()}


def _aux_heads(params, cfg: CodonGPTConfig, x):
    aux = {}
    if cfg.termination_aux:
        aux["termination_logits"] = _linear(params["termination_head"], x)
    if cfg.multi_offset_targets:
        for offset in cfg.multi_offset_targets:
            p = params["offset_projs"][str(offset)]
            proj = _linear(p["proj"], jax.nn.gelu(_linear(p["fc"], x), approximate=False))
            aux[f"offset_{offset}_logits"] = _lm_logits(params, cfg, proj)
    return aux


def _decode_step_impl(params, cfg: CodonGPTConfig, cache: dict, token: jnp.ndarray):
    """Append one token per sequence; returns (logits, new_cache, aux).

    ``token``: (B,) int32. Attention masks cached positions by segment id
    and validity (pos < length); the new token always attends to itself.

    Kept undecorated: the scanned generators trace this body directly —
    a nested-jit call boundary inside ``lax.scan`` blocks XLA's in-place
    aliasing of the cache carry and reintroduces a full cache copy/step.
    """
    B = token.shape[0]
    length = cache["length"]
    new_seg = cache["seg_count"] + (
        (token == cfg.sep_id).astype(jnp.int32) if cfg.sep_id is not None else 0
    )

    x = params["tok_emb"].astype(cfg.dtype)[token][:, None, :]  # (B, 1, D)
    if not cfg.use_rope:
        x = x + params["pos_emb"].astype(cfg.dtype)[length][None, None, :]
    if cfg.use_rope:
        cos_full, sin_full = rope_cos_sin(cfg.block_size, cfg.head_dim, cfg.rope_base, cfg.dtype)
        cos = jax.lax.dynamic_slice_in_dim(cos_full, length, 1, axis=0)
        sin = jax.lax.dynamic_slice_in_dim(sin_full, length, 1, axis=0)

    # cache size S comes from the cache itself (bucketed caches < block_size)
    positions = jnp.arange(cache["seg"].shape[1])
    # valid cached positions, same-segment (new token's segment = new_seg)
    base_valid = positions[None, :] < length  # (1, S)
    if cfg.sep_id is not None:
        seg_ok = cache["seg"] == new_seg[:, None]
    else:
        seg_ok = jnp.ones_like(base_valid, dtype=jnp.bool_)
    # the new token's own slot (index == length) is always attendable;
    # one additive (B, S) mask row shared by every layer
    valid = (base_valid & seg_ok) | (positions[None, :] == length)
    mask_add = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
    # fused kernel below the measured batch crossover, einsum above it
    # (large batches are DMA-bound on the cache; the kernel's fusion win
    # is XLA's per-op overhead, which only dominates at small batch)
    from genomics_lm_tpu.ops.decode_attention import KERNEL_MAX_BATCH

    use_kernel = cfg.attention_impl == "flash" and B <= KERNEL_MAX_BATCH

    kv_quant = "k_scale" in cache
    if kv_quant:
        from genomics_lm_tpu.ops.quant import quantize_kv

        new_k_scale = cache["k_scale"]
        new_v_scale = cache["v_scale"]
    new_k = cache["k"]
    new_v = cache["v"]
    for layer in range(cfg.n_layer):
        block_p = jax.tree.map(lambda p: p[layer], params["blocks"])
        h = _layer_norm(block_p["ln1"], x)
        q, k, v = _qkv(block_p, h, cfg)  # (B, H, 1, D), (B, Hkv, 1, D)
        if cfg.use_rope:
            q, k = apply_rope(q, k, cos, sin)
        if kv_quant:
            k, k_sc = quantize_kv(k)  # int8 (B,Hkv,1,D), f32 (B,Hkv,1)
            v, v_sc = quantize_kv(v)
            new_k_scale = jax.lax.dynamic_update_slice(
                new_k_scale, k_sc[None], (layer, 0, 0, length)
            )
            new_v_scale = jax.lax.dynamic_update_slice(
                new_v_scale, v_sc[None], (layer, 0, 0, length)
            )
        # single dynamic-update-slice on the stacked packed cache: one
        # contiguous (B, P) lane-row write that XLA aliases in place; the
        # previous at[layer].set(dus(new_k[layer], ...)) chain forced
        # full-cache copies per layer (~6 ms/step at d384 b64)
        k_row = k[:, :, 0, :].reshape(B, -1)[None, :, None, :]  # (1,B,1,P)
        v_row = v[:, :, 0, :].reshape(B, -1)[None, :, None, :]
        new_k = jax.lax.dynamic_update_slice(
            new_k, k_row.astype(new_k.dtype), (layer, 0, length, 0)
        )
        new_v = jax.lax.dynamic_update_slice(
            new_v, v_row.astype(new_v.dtype), (layer, 0, length, 0)
        )
        q_flat = q.reshape(B, cfg.n_head, cfg.head_dim)  # (B,H,1,D) → (B,H,D)
        ks = new_k_scale if kv_quant else None
        vs = new_v_scale if kv_quant else None
        if use_kernel:
            # fused Pallas kernel: dequant-on-load + scores + masked softmax
            # + PV in one VMEM pass — HBM traffic is one raw cache read
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
    logits = _lm_logits(params, cfg, x)[:, 0]
    aux = {k: v[:, 0] for k, v in _aux_heads(params, cfg, x).items()}

    new_cache = {
        "k": new_k,
        "v": new_v,
        "seg": jax.lax.dynamic_update_slice_in_dim(
            cache["seg"], new_seg[:, None], length, axis=1
        ),
        "length": length + 1,
        "seg_count": new_seg,
    }
    if kv_quant:
        new_cache["k_scale"] = new_k_scale
        new_cache["v_scale"] = new_v_scale
    return logits, new_cache, aux


# External per-token entry points. The donated variant lets XLA alias the
# cache in→out (true in-place update, no per-step full-cache copy); callers
# must discard the passed-in cache afterwards. On relayed/tunneled runtimes
# donation can force buffer round trips (see docs/ARCHITECTURE.md), so the
# non-donated variant stays the default.
decode_step = functools.partial(jax.jit, static_argnums=(1,))(_decode_step_impl)
decode_step_donated = jax.jit(
    _decode_step_impl, static_argnums=(1,), donate_argnums=(2,)
)


@functools.partial(jax.jit, static_argnums=(1, 3, 5, 6))
def generate_tokens(
    params,
    cfg: CodonGPTConfig,
    prompt: jnp.ndarray,
    n_tokens: int,
    key: jax.Array,
    temperature: float = 1.0,
    kv_quant: bool = False,
):
    """Whole-generation-in-one-program batched sampling.

    ``prompt``: (B, P) int32. Runs ``prefill`` then a ``lax.scan`` over
    ``n_tokens`` decode steps with on-device categorical (or greedy when
    ``temperature <= 0``) sampling — ONE device dispatch for the entire
    generation instead of one per token, which matters both for serving
    (launch overhead) and on relayed runtimes (per-dispatch round trips).
    Returns (B, n_tokens) sampled token ids.

    The KV cache is bucketed to the generation horizon (prompt + n_tokens,
    rounded up) instead of block_size — decode attention reads the whole
    cache every step, so a short generation with a small cache moves
    proportionally less HBM traffic. ``kv_quant`` stores the cache as int8
    + per-vector scales (``ops/quant.py``) — half the cache bytes read per
    step.
    """
    horizon = prompt.shape[1] + int(n_tokens)
    if horizon > cfg.block_size:
        # past block_size the static cache clamps writes to the last slot
        # and positions clip — silently-garbage tokens; fail loudly (the
        # clip-and-recompute fallback lives in next_token_logits)
        raise ValueError(
            f"prompt+n_tokens {horizon} exceeds block_size {cfg.block_size}")
    logits, cache, _ = prefill(
        params, cfg, prompt, cache_bucket(cfg, horizon), kv_quant,
        want_aux=False,
    )

    def body(carry, key):
        logits, cache = carry
        if temperature <= 0:
            token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            token = jax.random.categorical(
                key, logits.astype(jnp.float32) / temperature, axis=-1
            ).astype(jnp.int32)
        logits, cache, _ = _decode_step_impl(params, cfg, cache, token)
        return (logits, cache), token

    (_, _), tokens = jax.lax.scan(
        body, (logits, cache), jax.random.split(key, n_tokens)
    )
    return tokens.T  # (B, n_tokens)


@functools.partial(jax.jit, static_argnums=(1, 3, 5, 7))
def generate_masked_tokens(
    params,
    cfg: CodonGPTConfig,
    prompt: jnp.ndarray,
    n_tokens: int,
    key: jax.Array,
    temperature: float,
    allowed_mask: jnp.ndarray,
    kv_quant: bool = False,
):
    """``generate_tokens`` with a static vocabulary mask applied on device.

    ``allowed_mask``: (V,) bool — e.g. the CDS codon set. Sampling is
    restricted to allowed ids every step; everything stays in one compiled
    program (the host-side constrained policies in
    ``generation.constrained`` remain the full-featured path — this is the
    high-throughput batched variant for the design-loop's candidate
    fan-out)."""
    horizon = prompt.shape[1] + int(n_tokens)
    if horizon > cfg.block_size:
        raise ValueError(
            f"prompt+n_tokens {horizon} exceeds block_size {cfg.block_size}")
    logits, cache, _ = prefill(
        params, cfg, prompt, cache_bucket(cfg, horizon), kv_quant,
        want_aux=False,
    )
    neg = jnp.asarray(NEG_INF, jnp.float32)

    def body(carry, key):
        logits, cache = carry
        masked = jnp.where(allowed_mask[None, :], logits.astype(jnp.float32), neg)
        if temperature <= 0:
            token = jnp.argmax(masked, axis=-1).astype(jnp.int32)
        else:
            token = jax.random.categorical(
                key, masked / temperature, axis=-1
            ).astype(jnp.int32)
        logits, cache, _ = _decode_step_impl(params, cfg, cache, token)
        return (logits, cache), token

    (_, _), tokens = jax.lax.scan(
        body, (logits, cache), jax.random.split(key, n_tokens)
    )
    return tokens.T


class CachedDecoder:
    """Host-side convenience wrapper maintaining a single-sequence cache.

    Falls back to clip-and-recompute (reference semantics) once the context
    exceeds ``block_size``.
    """

    def __init__(self, params, cfg: CodonGPTConfig):
        self.params = params
        self.cfg = cfg
        self.ids: list[int] = []
        self._cache = None
        self._last_logits = None
        self._last_aux = None

    def next_logits(self, ids: list[int], return_aux: bool = False):
        """Logits for the next token after ``ids`` (uses the cache when
        ``ids`` extends the previous call by exactly one token)."""
        cfg = self.cfg
        if len(ids) > cfg.block_size:
            out = next_token_logits(self.params, cfg, ids, return_aux=return_aux)
            self.ids = list(ids)
            self._cache = None
            return out
        if (
            self._cache is not None
            and len(ids) == len(self.ids) + 1
            and ids[: len(self.ids)] == self.ids
        ):
            token = jnp.asarray([ids[-1]], jnp.int32)
            logits, self._cache, aux = decode_step(self.params, cfg, self._cache, token)
        else:
            logits, self._cache, aux = prefill(
                self.params, cfg, jnp.asarray([ids], jnp.int32)
            )
        self.ids = list(ids)
        self._last_logits, self._last_aux = logits, aux
        if return_aux:
            return np.asarray(logits[0]), {k: np.asarray(v[0]) for k, v in aux.items()}
        return np.asarray(logits[0])


@functools.partial(jax.jit, static_argnums=(1,))
def _full_forward(params, cfg: CodonGPTConfig, x):
    logits, _, aux = codon_gpt.forward(params, cfg, x, None, return_aux=True)
    return logits, aux


def next_token_logits(params, cfg: CodonGPTConfig, ids, return_aux: bool = False):
    """Uncached reference path: full forward over the clipped context
    (parity: ``generate.py:13-27``). Jitted — once the context saturates
    ``block_size`` the clipped shape is constant, so this compiles once and
    keeps the clip-and-recompute fallback fast instead of op-by-op eager."""
    ctx = list(ids)[-cfg.block_size :]
    x = jnp.asarray([ctx], jnp.int32)
    logits, aux = _full_forward(params, cfg, x)
    flat_aux = {}
    if "termination_logits" in aux:
        flat_aux["termination_logits"] = np.asarray(aux["termination_logits"][0, -1])
    for offset, ol in aux.get("offset_logits", {}).items():
        flat_aux[f"offset_{offset}_logits"] = np.asarray(ol[0])
    if return_aux:
        return np.asarray(logits[0, -1]), flat_aux
    return np.asarray(logits[0, -1])


def sample_token(
    logits: np.ndarray, temperature: float, topk: int, rng: np.random.Generator
) -> int:
    """Temperature + top-k multinomial sampling (parity: generate.py:51-59)."""
    logits = np.asarray(logits, dtype=np.float64)
    if temperature != 1.0:
        logits = logits / max(1e-6, float(temperature))
    logits = logits - logits.max()
    probs = np.exp(logits)
    probs = probs / probs.sum()
    if topk and topk > 0:
        k = min(int(topk), probs.size)
        idxs = np.argpartition(probs, -k)[-k:]
        vals = probs[idxs]
        vals = vals / vals.sum()
        return int(rng.choice(idxs, p=vals))
    return int(rng.choice(probs.size, p=probs))


__all__ = [
    "CACHE_BUCKET",
    "CachedDecoder",
    "cache_bucket",
    "decode_step",
    "decode_step_donated",
    "generate_masked_tokens",
    "generate_tokens",
    "init_cache",
    "next_token_logits",
    "prefill",
    "sample_token",
]
