"""CodonGPT: compact causal codon LM as pure functions over param pytrees.

Capability parity with the reference ``TinyGPT``
(``src/codonlm/model_tiny_gpt.py:155-389``) — learned-pos or RoPE, GELU-MLP
or SwiGLU, MHA or GQA, causal + <SEP>-segment + optional local-window
masking, tied embeddings, f32 cross-entropy with ignore-pad / label smoothing
/ per-token weights, auxiliary termination head and per-offset identity-init
MLP heads sharing the LM head, and a canonical causal hidden-state API
(``hidden_states`` ≙ reference ``iter_hidden_states``).

TPU-first structure instead of a module graph:

- Per-layer weights are **stacked on a leading L axis** and the block is run
  under ``jax.lax.scan`` — one compiled block regardless of depth, flat HBM
  layout, uniform sharding rules.
- Optional ``jax.checkpoint`` (remat) around the scanned block body replaces
  the reference's ``torch.utils.checkpoint`` gradient checkpointing.
- Activations run in ``cfg.compute_dtype`` (bf16 for AMP) with parameters and
  the CE reduction in float32, mirroring the reference's MPS fp16 autocast +
  ``.float()`` loss.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from genomics_lm_tpu.models.config import CodonGPTConfig
from genomics_lm_tpu.ops.attention import attention, sdpa_xla
from genomics_lm_tpu.ops.losses import cross_entropy
from genomics_lm_tpu.ops.masks import segment_ids_from_tokens

# --- Initialization (torch-default distributions, for curve parity) ---------


def _linear_init(rng, fan_in: int, fan_out: int, *, bias: bool = True):
    """U(−1/√fan_in, 1/√fan_in) for weight and bias (torch nn.Linear)."""
    k = 1.0 / math.sqrt(fan_in)
    wkey, bkey = jax.random.split(rng)
    p = {"w": jax.random.uniform(wkey, (fan_in, fan_out), jnp.float32, -k, k)}
    if bias:
        p["b"] = jax.random.uniform(bkey, (fan_out,), jnp.float32, -k, k)
    return p


def _ln_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def _mlp_init(keys, cfg: CodonGPTConfig):
    """Dense MLP init — key order matches the original layout exactly so
    dense-model initialization streams are unchanged by the MoE addition."""
    D, H = cfg.n_embd, cfg.mlp_hidden
    if cfg.use_swiglu:
        return {
            "w_gate": _linear_init(keys[0], D, H, bias=False),
            "w_up": _linear_init(keys[1], D, H, bias=False),
            "w_down": _linear_init(keys[2], H, D, bias=False),
        }
    return {
        "fc": _linear_init(keys[0], D, H),
        "proj": _linear_init(keys[1], H, D),
    }


def _block_init(rng, cfg: CodonGPTConfig):
    D = cfg.n_embd
    kv_dim = cfg.kv_heads * cfg.head_dim
    keys = jax.random.split(rng, 8)
    attn = {
        "query": _linear_init(keys[0], D, D),
        "key": _linear_init(keys[1], D, kv_dim),
        "value": _linear_init(keys[2], D, kv_dim),
        "proj": _linear_init(keys[3], D, D),
    }
    out = {"ln1": _ln_init(D), "attn": attn, "ln2": _ln_init(D)}
    if cfg.moe_experts:
        # Expert weights stack on a leading E axis (mirrors the per-layer
        # L stacking): (E, D, H) etc. Router is bias-free like most
        # production routers; its logits/softmax run in f32.
        expert_keys = jax.random.split(keys[4], cfg.moe_experts)
        experts = [_mlp_init(jax.random.split(k, 3), cfg) for k in expert_keys]
        out["mlp"] = jax.tree.map(lambda *xs: jnp.stack(xs), *experts)
        out["router"] = {
            "w": _linear_init(keys[7], D, cfg.moe_experts, bias=False)["w"]
        }
    else:
        out["mlp"] = _mlp_init(keys[4:7], cfg)
    return out


def init(rng: jax.Array, cfg: CodonGPTConfig) -> dict:
    """Initialize the full parameter pytree (float32 master weights)."""
    keys = jax.random.split(rng, 8 + len(cfg.multi_offset_targets))
    params: dict = {
        "tok_emb": jax.random.normal(keys[0], (cfg.vocab_size, cfg.n_embd), jnp.float32),
        "ln_f": _ln_init(cfg.n_embd),
    }
    if not cfg.use_rope:
        params["pos_emb"] = jax.random.normal(
            keys[1], (cfg.block_size, cfg.n_embd), jnp.float32
        )
    # Stacked per-layer params: tree with leading axis L.
    block_keys = jax.random.split(keys[2], cfg.n_layer)
    blocks = [_block_init(k, cfg) for k in block_keys]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    if not cfg.tie_embeddings:
        params["head"] = _linear_init(keys[3], cfg.n_embd, cfg.vocab_size, bias=False)
    if cfg.termination_aux:
        params["termination_head"] = _linear_init(
            keys[4], cfg.n_embd, cfg.termination_n_classes
        )
    if cfg.use_shape_guidance:
        # Zero-init so guidance starts as a no-op (model_tiny_gpt.py:226-229).
        params["shape_proj"] = {
            "w": jnp.zeros((3, cfg.n_embd), jnp.float32),
            "b": jnp.zeros((cfg.n_embd,), jnp.float32),
        }
    if cfg.multi_offset_targets:
        offset_projs = {}
        for i, offset in enumerate(cfg.multi_offset_targets):
            # Identity-init 2-layer MLP sharing the LM head (ref :234-246).
            # Each weight gets its own buffer — sharing one array object
            # across tree leaves breaks jit buffer donation.
            offset_projs[str(offset)] = {
                "fc": {
                    "w": jnp.eye(cfg.n_embd, dtype=jnp.float32),
                    "b": jnp.zeros((cfg.n_embd,), jnp.float32),
                },
                "proj": {
                    "w": jnp.eye(cfg.n_embd, dtype=jnp.float32),
                    "b": jnp.zeros((cfg.n_embd,), jnp.float32),
                },
            }
        params["offset_projs"] = offset_projs
    return params


def param_count(params) -> int:
    return int(sum(p.size for p in jax.tree.leaves(params)))


# --- Forward pieces ----------------------------------------------------------


def _linear(p, x):
    if "w_q" in p:
        # weight-only int8 (ops/quant.py): the convert fuses into the dot's
        # operand load, the per-output-channel scale into its epilogue
        y = (x @ p["w_q"].astype(x.dtype)) * p["scale"].astype(x.dtype)
        if "b" in p:
            y = y + p["b"].astype(x.dtype)
        return y
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    if "lora_a" in p:
        # LoRA fine-tuning (training/lora.py): rank-r bottleneck add. Two
        # thin matmuls; the standard alpha/r output scale rides as a frozen
        # (stop-gradient) leaf so optimizer labeling never trains it.
        delta = (x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype)
        y = y + _lora_scale(p, x.dtype) * delta
    return y


def _lora_scale(p, dtype):
    if "lora_scale" in p:
        return jax.lax.stop_gradient(p["lora_scale"]).astype(dtype)
    return jnp.asarray(1.0, dtype)  # legacy checkpoints: scale folded into a


def _layer_norm(p, x, eps: float = 1e-5):
    # Normalize in f32 (torch LayerNorm computes statistics in higher precision)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def rope_cos_sin(T: int, head_dim: int, base: float, dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin caches with the reference's duplicated-halves layout
    (model_tiny_gpt.py:15-25): emb = concat(freqs, freqs) along the last dim."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(T, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q, k, cos, sin):
    """cos/sin: (T, head_dim) → broadcast over (B, H, T, D)."""
    cos = cos[None, None, :, :]
    sin = sin[None, None, :, :]
    return q * cos + rotate_half(q) * sin, k * cos + rotate_half(k) * sin


def _qkv(block_p, x, cfg: CodonGPTConfig):
    B, T, _ = x.shape
    hd = cfg.head_dim
    if cfg.fused_qkv:
        # one (C, Cq+2*Ckv) gemm; the concat is loop-invariant weight prep,
        # trivially cheap next to the matmul itself
        attn = block_p["attn"]
        if "w_q" in attn["query"]:
            # int8 weight-only: per-output-channel scales concatenate too
            w = jnp.concatenate(
                [attn["query"]["w_q"], attn["key"]["w_q"], attn["value"]["w_q"]],
                axis=1,
            )
            s = jnp.concatenate(
                [attn["query"]["scale"], attn["key"]["scale"], attn["value"]["scale"]],
                axis=0,
            )
            b = jnp.concatenate(
                [attn["query"]["b"], attn["key"]["b"], attn["value"]["b"]], axis=0
            )
            qkv = (x @ w.astype(x.dtype)) * s.astype(x.dtype) + b.astype(x.dtype)
        else:
            w = jnp.concatenate(
                [attn["query"]["w"], attn["key"]["w"], attn["value"]["w"]], axis=1
            )
            b = jnp.concatenate(
                [attn["query"]["b"], attn["key"]["b"], attn["value"]["b"]], axis=0
            )
            qkv = x @ w.astype(x.dtype) + b.astype(x.dtype)
        if "lora_a" in attn["query"]:
            # adapters keep per-projection factors; their thin matmuls are
            # negligible next to the fused base gemm
            qkv = qkv + jnp.concatenate(
                [
                    _lora_scale(attn[name], x.dtype)
                    * ((x @ attn[name]["lora_a"].astype(x.dtype))
                       @ attn[name]["lora_b"].astype(x.dtype))
                    for name in ("query", "key", "value")
                ],
                axis=-1,
            )
        c_q = cfg.n_head * hd
        c_kv = cfg.kv_heads * hd
        q, k, v = jnp.split(qkv, [c_q, c_q + c_kv], axis=-1)
        q = q.reshape(B, T, cfg.n_head, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, cfg.kv_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, cfg.kv_heads, hd).transpose(0, 2, 1, 3)
        return q, k, v
    q = _linear(block_p["attn"]["query"], x).reshape(B, T, cfg.n_head, hd).transpose(0, 2, 1, 3)
    k = _linear(block_p["attn"]["key"], x).reshape(B, T, cfg.kv_heads, hd).transpose(0, 2, 1, 3)
    v = _linear(block_p["attn"]["value"], x).reshape(B, T, cfg.kv_heads, hd).transpose(0, 2, 1, 3)
    return q, k, v


def _constrain_residual(x, cfg: CodonGPTConfig):
    """Pin the (B, T, C) residual stream to ``cfg.residual_sharding``.

    With ("data", "model") this is Megatron sequence parallelism: between
    blocks the activations live sequence-sharded over the tensor-parallel
    axis, so GSPMD lowers the row-parallel partial sums to reduce-scatter
    (and all-gathers tokens back only at the column-parallel entries).
    No-op when the config does not request it.
    """
    if cfg.residual_sharding is None:
        return x
    from jax.sharding import PartitionSpec as P

    return jax.lax.with_sharding_constraint(x, P(*cfg.residual_sharding))


def _constrain_experts(x, cfg: CodonGPTConfig):
    """Pin a leading-E MoE activation to the expert axis (no-op otherwise)."""
    if cfg.expert_sharding is None:
        return x
    from jax.sharding import PartitionSpec as P

    return jax.lax.with_sharding_constraint(
        x, P(cfg.expert_sharding, *([None] * (x.ndim - 1))))


def _moe_mlp(block_p, cfg: CodonGPTConfig, h, *, capped: bool):
    """GShard-style top-k routed mixture-of-experts MLP (beyond reference).

    TPU-first design: routing and dispatch are fixed-shape one-hot einsums
    (no ragged gathers, no data-dependent shapes), so the whole layer
    compiles into MXU matmuls + cheap VPU masks. In training (``capped``)
    each token's top-k experts get a slot in that expert's fixed capacity
    ``C = ceil(capacity_factor * k * N / E)``; slots are granted in
    (choice-rank, token-order) priority and over-capacity tokens fall
    through to the residual stream (standard GShard/Switch semantics).
    Inference runs dropless (``C = N``) so evaluation losses are exact and
    the KV-cached incremental decode — where each step routes one token
    and can never contend for capacity — produces bit-identical logits to
    the full forward (the cached-vs-uncached parity gate).
    Expert weights carry a leading E axis — sharding it over a mesh axis
    (``parallel.sharding.moe_param_sharding``) makes the two expert einsums
    expert-parallel; ``cfg.expert_sharding`` optionally pins the dispatched
    (E, C, D) activations to that axis explicitly.

    Returns ``(y, aux)`` where ``aux`` is the Switch load-balancing loss
    ``E * Σ_e f_e·p_e`` (f from top-1 assignments, p the mean router
    probability; ≈1.0 when balanced).
    """
    B, T, D = h.shape
    N = B * T
    E = cfg.moe_experts
    k = min(cfg.moe_top_k, E)
    C = max(1, math.ceil(cfg.moe_capacity_factor * k * N / E)) if capped else N

    ht = h.reshape(N, D)
    router_logits = ht.astype(jnp.float32) @ block_p["router"]["w"]  # (N, E)
    probs = jax.nn.softmax(router_logits, axis=-1)
    gate_vals, gate_idx = jax.lax.top_k(probs, k)  # (N, k)
    gate_vals = gate_vals / jnp.maximum(
        jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9)

    top1 = jax.nn.one_hot(gate_idx[:, 0], E, dtype=jnp.float32)
    aux = jnp.float32(E) * jnp.sum(
        jnp.mean(top1, axis=0) * jnp.mean(probs, axis=0))

    # Slot assignment: cumulative count per expert in rank-major, then
    # token-order priority (deterministic; matches the docstring contract).
    oh = jax.nn.one_hot(gate_idx, E, dtype=jnp.int32)           # (N, k, E)
    flat = oh.transpose(1, 0, 2).reshape(k * N, E)              # rank-major
    pos_flat = jnp.cumsum(flat, axis=0) - flat
    pos = pos_flat.reshape(k, N, E).transpose(1, 0, 2)
    pos = jnp.sum(pos * oh, axis=-1)                            # (N, k)

    de = jax.nn.one_hot(gate_idx, E, dtype=h.dtype)             # (N, k, E)
    dc = jax.nn.one_hot(pos, C, dtype=h.dtype)                  # (N, k, C); 0-row when pos >= C

    xe = jnp.einsum("nke,nkc,nd->ecd", de, dc, ht)              # dispatch
    xe = _constrain_experts(xe, cfg)
    mlp = block_p["mlp"]
    if cfg.use_swiglu:
        gate = jnp.einsum("ecd,edh->ech", xe, mlp["w_gate"]["w"].astype(h.dtype))
        up = jnp.einsum("ecd,edh->ech", xe, mlp["w_up"]["w"].astype(h.dtype))
        ye = jnp.einsum("ech,ehd->ecd", jax.nn.silu(gate) * up,
                        mlp["w_down"]["w"].astype(h.dtype))
    else:
        mid = jnp.einsum("ecd,edh->ech", xe, mlp["fc"]["w"].astype(h.dtype))
        mid = jax.nn.gelu(mid + mlp["fc"]["b"].astype(h.dtype)[:, None, :],
                          approximate=False)
        ye = jnp.einsum("ech,ehd->ecd", mid, mlp["proj"]["w"].astype(h.dtype))
        ye = ye + mlp["proj"]["b"].astype(h.dtype)[:, None, :]
    ye = _constrain_experts(ye, cfg)
    y = jnp.einsum("ecd,nke,nkc,nk->nd", ye, de, dc,
                   gate_vals.astype(h.dtype))                   # combine
    return y.reshape(B, T, D), aux


def block_epilogue(block_p, cfg: CodonGPTConfig, x, y_attn, *,
                   train: bool = False, mlp_rng=None, constrain: bool = False,
                   return_moe_aux: bool = False, moe_capped: bool | None = None):
    """Post-attention half of a transformer block, shared by every path.

    Residual-adds the attention output projection, applies LN2 and the
    (SwiGLU | GELU | MoE) MLP with its residual. The attention computation
    is the only part that differs between the training forward, attention
    maps, prompt prefill, single-token decode, and the serving ragged
    decode — they all call this for the rest, so block-body changes land
    once (MoE models decode/serve through the same code path).
    ``constrain`` applies the sequence-parallel residual sharding
    (training path only; decode operates on (B, 1, C) where a sharded T
    axis is meaningless). ``return_moe_aux`` additionally returns the MoE
    router load-balancing loss (0.0 for dense blocks) — the training
    forward collects it; inference paths ignore it."""
    x = x + _linear(block_p["attn"]["proj"], y_attn)
    if constrain:
        x = _constrain_residual(x, cfg)
    h = _layer_norm(block_p["ln2"], x)
    moe_aux = jnp.float32(0.0)
    if cfg.moe_experts:
        # capacity binds in training; inference is dropless (see _moe_mlp)
        m, moe_aux = _moe_mlp(
            block_p, cfg, h, capped=train if moe_capped is None else moe_capped)
    elif cfg.use_swiglu:
        m = _linear(block_p["mlp"]["w_down"],
                    jax.nn.silu(_linear(block_p["mlp"]["w_gate"], h))
                    * _linear(block_p["mlp"]["w_up"], h))
    else:
        m = _linear(block_p["mlp"]["proj"],
                    jax.nn.gelu(_linear(block_p["mlp"]["fc"], h), approximate=False))
    if train and mlp_rng is not None and cfg.dropout > 0.0:
        keep = jax.random.bernoulli(mlp_rng, 1.0 - cfg.dropout, m.shape)
        m = jnp.where(keep, m / (1.0 - cfg.dropout), 0.0)
    x = x + m
    if constrain:
        x = _constrain_residual(x, cfg)
    if return_moe_aux:
        return x, moe_aux
    return x


def _block_apply(
    block_p,
    x,
    cfg: CodonGPTConfig,
    *,
    segment_ids,
    attention_window,
    rope_cache,
    train: bool,
    rng,
    moe_capped: bool | None = None,
):
    B, T, C = x.shape
    h = _layer_norm(block_p["ln1"], x)
    q, k, v = _qkv(block_p, h, cfg)
    if rope_cache is not None:
        q, k = apply_rope(q, k, *rope_cache)
    drop_rate = cfg.dropout if train else 0.0
    attn_rng = mlp_rng = None
    if train and rng is not None and cfg.dropout > 0.0:
        attn_rng, mlp_rng = jax.random.split(rng)
    y = attention(
        q, k, v,
        segment_ids=segment_ids,
        attention_window=attention_window,
        dropout_rate=drop_rate,
        dropout_rng=attn_rng,
        impl=cfg.attention_impl,
        block_q=cfg.flash_block_q,
        block_k=cfg.flash_block_k,
    )
    y = y.transpose(0, 2, 1, 3).reshape(B, T, C)
    return block_epilogue(block_p, cfg, x, y, train=train, mlp_rng=mlp_rng,
                          constrain=True, return_moe_aux=True,
                          moe_capped=moe_capped)


def _embed(params, cfg: CodonGPTConfig, idx, shape_embeddings, *, train, rng):
    x = params["tok_emb"].astype(cfg.dtype)[idx]
    if not cfg.use_rope:
        T = idx.shape[1]
        x = x + params["pos_emb"].astype(cfg.dtype)[:T][None, :, :]
    if shape_embeddings is not None and cfg.use_shape_guidance:
        x = x + _linear(params["shape_proj"], shape_embeddings.astype(cfg.dtype))
    if train and rng is not None and cfg.dropout > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - cfg.dropout, x.shape)
        x = jnp.where(keep, x / (1.0 - cfg.dropout), 0.0)
    return x


def _run_blocks(params, cfg: CodonGPTConfig, x, *, segment_ids, attention_window, train, rng):
    """Scan the stacked blocks; returns ``(x, moe_aux)`` where ``moe_aux``
    is the mean per-layer router load-balancing loss (0.0 for dense)."""
    rope_cache = (
        rope_cos_sin(x.shape[1], cfg.head_dim, cfg.rope_base, cfg.dtype)
        if cfg.use_rope
        else None
    )
    use_dropout = train and rng is not None and cfg.dropout > 0.0

    def body(h, layer_in):
        block_p = layer_in[0] if use_dropout else layer_in
        layer_rng = layer_in[1] if use_dropout else None
        h, moe_aux = _block_apply(
            block_p, h, cfg,
            segment_ids=segment_ids,
            attention_window=attention_window,
            rope_cache=rope_cache,
            train=use_dropout,
            rng=layer_rng,
            # expert capacity binds on the true training flag, independent
            # of whether dropout is active
            moe_capped=train,
        )
        return h, moe_aux

    if cfg.use_checkpoint:
        body = jax.checkpoint(body)

    xs = (
        (params["blocks"], jax.random.split(rng, cfg.n_layer))
        if use_dropout
        else params["blocks"]
    )
    x, moe_aux = jax.lax.scan(
        body, _constrain_residual(x, cfg), xs, unroll=max(1, cfg.scan_unroll)
    )
    return x, jnp.mean(moe_aux)


def _lm_logits(params, cfg: CodonGPTConfig, x):
    if cfg.pad_vocab_lanes and cfg.vocab_size % 128:
        # shape-side lever: pad the 68-wide head matmul's output dim to
        # the MXU's 128-lane boundary explicitly, then slice back. XLA
        # pads the lane dim internally either way; this makes the layout
        # choice explicit so the effect can be measured (sweep_d512.py).
        lanes = (-cfg.vocab_size) % 128
        if cfg.tie_embeddings:
            w = jnp.pad(params["tok_emb"].astype(x.dtype), ((0, lanes), (0, 0)))
            return (x @ w.T)[..., : cfg.vocab_size]
        head = params["head"]
        w = jnp.pad(head["w"].astype(x.dtype), ((0, 0), (0, lanes)))
        out = x @ w
        if "b" in head:
            out = out + jnp.pad(head["b"].astype(x.dtype), (0, lanes))
        return out[..., : cfg.vocab_size]
    if cfg.tie_embeddings:
        return x @ params["tok_emb"].astype(x.dtype).T
    return _linear(params["head"], x)


def forward(
    params: dict,
    cfg: CodonGPTConfig,
    idx: jnp.ndarray,
    targets: jnp.ndarray | None = None,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    return_aux: bool = False,
    shape_embeddings: jnp.ndarray | None = None,
    attention_window: int | None = None,
):
    """Full forward pass. Returns (logits, loss, aux) — aux carries
    ``termination_logits`` and ``offset_logits`` when those heads exist,
    matching reference ``TinyGPT.forward(return_aux=True)``."""
    emb_rng = blocks_rng = None
    if train and rng is not None and cfg.dropout > 0.0:
        emb_rng, blocks_rng = jax.random.split(rng)
    segment_ids = (
        segment_ids_from_tokens(idx, cfg.sep_id) if cfg.sep_id is not None else None
    )
    x = _embed(params, cfg, idx, shape_embeddings, train=train, rng=emb_rng)
    x, moe_aux = _run_blocks(
        params, cfg, x,
        segment_ids=segment_ids,
        attention_window=attention_window,
        train=train,
        rng=blocks_rng,
    )
    x = _layer_norm(params["ln_f"], x)
    logits = _lm_logits(params, cfg, x)

    aux: dict = {}
    if cfg.moe_experts:
        aux["moe_aux_loss"] = moe_aux
    if cfg.termination_aux:
        aux["termination_logits"] = _linear(params["termination_head"], x)
    if cfg.multi_offset_targets:
        offset_logits = {}
        for offset in cfg.multi_offset_targets:
            p = params["offset_projs"][str(offset)]
            proj_x = _linear(p["proj"], jax.nn.gelu(_linear(p["fc"], x), approximate=False))
            offset_logits[offset] = _lm_logits(params, cfg, proj_x)
        aux["offset_logits"] = offset_logits

    loss = None
    if targets is not None:
        weight = (
            None
            if cfg.uniform_loss_weights
            else jnp.asarray(cfg.loss_weights, dtype=jnp.float32)
        )
        loss = cross_entropy(
            logits,
            targets,
            ignore_index=0,
            label_smoothing=cfg.label_smoothing,
            weight=weight,
        )
    if return_aux:
        return logits, loss, aux
    return logits, loss


def hidden_states(
    params: dict,
    cfg: CodonGPTConfig,
    idx: jnp.ndarray,
    *,
    shape_embeddings: jnp.ndarray | None = None,
    attention_window: int | None = None,
):
    """Canonical causal states at embedding, each block, and final norm.

    Returns ``[(0, emb), (1, h1), ..., (L, hL), ("final", ln_f(hL))]`` —
    parity with reference ``iter_hidden_states`` (model_tiny_gpt.py:368-389).
    Runs unscanned (per-layer Python loop) since this is the
    interpretability/extraction path, not the training hot loop.
    """
    segment_ids = (
        segment_ids_from_tokens(idx, cfg.sep_id) if cfg.sep_id is not None else None
    )
    x = _embed(params, cfg, idx, shape_embeddings, train=False, rng=None)
    rope_cache = (
        rope_cos_sin(idx.shape[1], cfg.head_dim, cfg.rope_base, cfg.dtype)
        if cfg.use_rope
        else None
    )
    out = [(0, x)]
    for layer in range(cfg.n_layer):
        block_p = jax.tree.map(lambda p: p[layer], params["blocks"])
        x, _ = _block_apply(
            block_p, x, cfg,
            segment_ids=segment_ids,
            attention_window=attention_window,
            rope_cache=rope_cache,
            train=False,
            rng=None,
        )
        out.append((layer + 1, x))
    out.append(("final", _layer_norm(params["ln_f"], x)))
    return out


def forward_hidden(params, cfg, idx, **kwargs) -> jnp.ndarray:
    """Final-norm hidden states — the canonical embedding-extraction output."""
    return hidden_states(params, cfg, idx, **kwargs)[-1][1]


def attention_maps(
    params: dict,
    cfg: CodonGPTConfig,
    idx: jnp.ndarray,
    *,
    attention_window: int | None = None,
) -> list[jnp.ndarray]:
    """Per-layer attention probabilities (B, H, T, T) for interpretability.

    Replaces the reference's ``last_attn`` side-channel
    (model_tiny_gpt.py:128) with an explicit functional API.
    """
    segment_ids = (
        segment_ids_from_tokens(idx, cfg.sep_id) if cfg.sep_id is not None else None
    )
    x = _embed(params, cfg, idx, None, train=False, rng=None)
    rope_cache = (
        rope_cos_sin(idx.shape[1], cfg.head_dim, cfg.rope_base, cfg.dtype)
        if cfg.use_rope
        else None
    )
    T = idx.shape[1]
    positions = jnp.arange(T)
    distance = positions[:, None] - positions[None, :]
    causal = distance >= 0
    if attention_window is not None:
        causal = causal & (distance < int(attention_window))
    mask = causal[None, None, :, :]
    if segment_ids is not None:
        seg_eq = segment_ids[:, :, None] == segment_ids[:, None, :]
        mask = mask & seg_eq[:, None, :, :]

    maps = []
    for layer in range(cfg.n_layer):
        block_p = jax.tree.map(lambda p: p[layer], params["blocks"])
        h = _layer_norm(block_p["ln1"], x)
        q, k, v = _qkv(block_p, h, cfg)
        if rope_cache is not None:
            q, k = apply_rope(q, k, *rope_cache)
        y, probs = sdpa_xla(q, k, v, mask=mask, return_probs=True)
        maps.append(probs)
        B, _, T_, _ = q.shape
        y = y.transpose(0, 2, 1, 3).reshape(B, T_, cfg.n_embd)
        x = block_epilogue(block_p, cfg, x, y)
    return maps


__all__ = [
    "apply_rope",
    "attention_maps",
    "forward",
    "forward_hidden",
    "hidden_states",
    "init",
    "param_count",
    "rope_cos_sin",
    "rotate_half",
]
