"""NoProp codon LM: backprop-free layer-local denoising training.

Parity: reference ``NoPropBlock``/``NoPropTinyGPT``
(``model_tiny_gpt.py:391-459``) and the layer-local trainer
(``src/codonlm/train_noprop.py``): each block receives the (stop-gradient)
previous hidden state plus noisy target embeddings and learns to denoise the
targets with a per-block MSE head; the LM head trains by CE on the final
(stop-gradient) state.

JAX formulation: instead of the reference's per-block optimizers and
separate backward passes, one forward inserts ``stop_gradient`` between
blocks so every parameter group receives exactly its layer-local gradient,
and a single AdamW step over the combined loss is then element-wise
identical to stepping per-block AdamW optimizers with the same
hyperparameters (AdamW state is per-parameter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from genomics_lm_tpu.models.codon_gpt import (
    _block_init,
    _layer_norm,
    _linear,
    _linear_init,
    _ln_init,
    _qkv,
)
from genomics_lm_tpu.models.config import CodonGPTConfig
from genomics_lm_tpu.ops.attention import attention
from genomics_lm_tpu.ops.losses import cross_entropy
from genomics_lm_tpu.ops.masks import segment_ids_from_tokens


def init(rng: jax.Array, cfg: CodonGPTConfig) -> dict:
    """NoProp parameter tree: GPT blocks + per-block denoise heads."""
    keys = jax.random.split(rng, 4 + cfg.n_layer)
    blocks = []
    for i in range(cfg.n_layer):
        bkey, dkey = jax.random.split(keys[3 + i])
        block = _block_init(bkey, cfg)
        block["denoise_head"] = _linear_init(dkey, cfg.n_embd, cfg.n_embd)
        blocks.append(block)
    return {
        "tok_emb": jax.random.normal(keys[0], (cfg.vocab_size, cfg.n_embd)),
        "pos_emb": jax.random.normal(keys[1], (cfg.block_size, cfg.n_embd)),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "ln_f": _ln_init(cfg.n_embd),
    }


def _block_apply(block_p, x, cfg, segment_ids, noisy_targets):
    if noisy_targets is not None:
        x = x + noisy_targets
    h = _layer_norm(block_p["ln1"], x)
    q, k, v = _qkv(block_p, h, cfg)
    y = attention(q, k, v, segment_ids=segment_ids)
    B, T, C = x.shape
    y = y.transpose(0, 2, 1, 3).reshape(B, T, C)
    x = x + _linear(block_p["attn"]["proj"], y)
    h2 = _layer_norm(block_p["ln2"], x)
    m = _linear(block_p["mlp"]["proj"],
                jax.nn.gelu(_linear(block_p["mlp"]["fc"], h2), approximate=False))
    x = x + m
    pred_y = _linear(block_p["denoise_head"], x)
    return x, pred_y


def forward(
    params: dict,
    cfg: CodonGPTConfig,
    idx: jnp.ndarray,
    target_embeddings: jnp.ndarray | None = None,
    *,
    layer_local: bool = False,
):
    """Returns (logits, per-block denoise predictions).

    ``layer_local=True`` inserts stop_gradient between blocks and before the
    LM head (the NoProp training topology); False gives the reference's
    inference forward.
    """
    B, T = idx.shape
    x = params["tok_emb"][idx] + params["pos_emb"][:T][None]
    segment_ids = (
        segment_ids_from_tokens(idx, cfg.sep_id) if cfg.sep_id is not None else None
    )
    preds = []
    for layer in range(cfg.n_layer):
        block_p = jax.tree.map(lambda p: p[layer], params["blocks"])
        if layer_local and layer > 0:
            x = jax.lax.stop_gradient(x)
        x, pred_y = _block_apply(block_p, x, cfg, segment_ids, target_embeddings)
        preds.append(pred_y)
    if layer_local:
        x = jax.lax.stop_gradient(x)
    h = _layer_norm(params["ln_f"], x)
    logits = h @ params["tok_emb"].T  # tied head (reference :435-436)
    return logits, preds


def noprop_loss(
    params: dict,
    cfg: CodonGPTConfig,
    xb: jnp.ndarray,
    yb: jnp.ndarray,
    rng: jax.Array,
    *,
    noise_sigma: float = 0.1,
):
    """Layer-local composite loss: Σ block denoise MSE + detached-head CE."""
    y_clean = jax.lax.stop_gradient(params["tok_emb"][yb])
    noise = noise_sigma * jax.random.normal(rng, y_clean.shape)
    y_noisy = y_clean + noise
    nonpad = (yb != 0).astype(jnp.float32)[:, :, None]

    logits, preds = forward(params, cfg, xb, y_noisy, layer_local=True)
    block_losses = []
    denom = jnp.maximum(nonpad.sum(), 1.0)
    for pred in preds:
        mse = jnp.sum(((pred - y_clean) ** 2) * nonpad) / denom
        block_losses.append(mse)
    ce = cross_entropy(logits, yb, ignore_index=0)
    total = sum(block_losses) + ce
    return total, {"ce": ce, "block_mse": block_losses}


__all__ = ["forward", "init", "noprop_loss"]
