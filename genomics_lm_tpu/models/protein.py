"""Protein-critic model stack: LM, classifier, multi-task critic, EBM.

Functional JAX re-design of the reference protein package
(``src/protein_lm/models.py``, ``models_multi.py``, ``ebm.py``):

- ``ProteinConditionalTransformer`` → post-LN encoder blocks (the reference
  stacks ``nn.TransformerEncoderLayer``: x = LN(x + MHA(x)); x = LN(x + FFN(x))
  with GELU FFN), learned positions, untied LM head, manual causal mask.
- ``ProteinClassifier`` → bidirectional backbone with key-padding masking,
  BOS-representation classification (``models.py:83-119``).
- ``MultiTaskProteinClassifier`` → mean/attention pooling, shared latent
  bottleneck (Linear+LN+GELU+Dropout), per-task linear heads,
  ``extract_latent`` for the EBM (``models_multi.py:31-178``).
- ``AttentionPooling`` → learned query over projected keys/values
  (``models_multi.py:7-29``).
- ``ProteinLatentEBM`` → 3-layer GELU MLP energy head (``ebm.py``).

All forward functions take ``(params, cfg, ...)`` and thread explicit
dropout RNGs; heavy math runs through the same einsum attention op as the
codon model so the Pallas kernel can be swapped in for long-context critics.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp

from genomics_lm_tpu.ops.attention import sdpa_xla


@dataclass(frozen=True)
class ProteinLMConfig:
    vocab_size: int
    n_layer: int
    n_head: int
    n_embd: int
    block_size: int
    dropout: float


@dataclass(frozen=True)
class ProteinClassifierConfig:
    vocab_size: int
    n_layer: int
    n_head: int
    n_embd: int
    block_size: int
    dropout: float
    num_classes: int = 2
    use_checkpoint: bool = False
    pooling: str = "mean"  # "mean" | "attention"
    bidirectional: bool = True

    def lm_config(self) -> ProteinLMConfig:
        return ProteinLMConfig(
            vocab_size=self.vocab_size, n_layer=self.n_layer, n_head=self.n_head,
            n_embd=self.n_embd, block_size=self.block_size, dropout=self.dropout,
        )


def load_config(path: str, config_class):
    """YAML ``model:`` sub-map → dataclass (parity: protein config loader)."""
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    model_data = data.get("model", {})
    expected = {f.name for f in fields(config_class)}
    return config_class(**{k: v for k, v in model_data.items() if k in expected})


# --- init -------------------------------------------------------------------


def _linear_init(rng, fan_in, fan_out, *, bias=True, xavier=False):
    wkey, bkey = jax.random.split(rng)
    if xavier:
        bound = math.sqrt(6.0 / (fan_in + fan_out))
    else:
        bound = 1.0 / math.sqrt(fan_in)
    p = {"w": jax.random.uniform(wkey, (fan_in, fan_out), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = (
            jax.random.uniform(bkey, (fan_out,), jnp.float32, -1 / math.sqrt(fan_in), 1 / math.sqrt(fan_in))
            if not xavier
            else jnp.zeros((fan_out,), jnp.float32)
        )
    return p


def _ln_init(dim):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def _encoder_layer_init(rng, cfg: ProteinLMConfig):
    D = cfg.n_embd
    keys = jax.random.split(rng, 6)
    return {
        "attn": {
            "query": _linear_init(keys[0], D, D, xavier=True),
            "key": _linear_init(keys[1], D, D, xavier=True),
            "value": _linear_init(keys[2], D, D, xavier=True),
            "out": _linear_init(keys[3], D, D),
        },
        "ln1": _ln_init(D),
        "ff": {
            "w1": _linear_init(keys[4], D, 4 * D),
            "w2": _linear_init(keys[5], 4 * D, D),
        },
        "ln2": _ln_init(D),
    }


def init_backbone(rng, cfg: ProteinLMConfig) -> dict:
    keys = jax.random.split(rng, 4 + cfg.n_layer)
    return {
        "token_embedding": jax.random.normal(keys[0], (cfg.vocab_size, cfg.n_embd)),
        "position_embedding": jax.random.normal(keys[1], (cfg.block_size, cfg.n_embd)),
        "blocks": [
            _encoder_layer_init(keys[4 + i], cfg) for i in range(cfg.n_layer)
        ],
        "layer_norm": _ln_init(cfg.n_embd),
    }


def init_protein_lm(rng, cfg: ProteinLMConfig) -> dict:
    k1, k2 = jax.random.split(rng)
    params = init_backbone(k1, cfg)
    params["output_head"] = _linear_init(k2, cfg.n_embd, cfg.vocab_size, bias=False)
    return params


def init_attention_pooling(rng, n_embd: int) -> dict:
    k0, k1, k2 = jax.random.split(rng, 3)
    return {
        "query": 0.02 * jax.random.normal(k0, (n_embd,)),
        "key_proj": _linear_init(k1, n_embd, n_embd),
        "value_proj": _linear_init(k2, n_embd, n_embd),
    }


def init_classifier(rng, cfg: ProteinClassifierConfig) -> dict:
    k1, k2 = jax.random.split(rng)
    return {
        "backbone": init_backbone(k1, cfg.lm_config()),
        "classification_head": _linear_init(k2, cfg.n_embd, cfg.num_classes),
    }


def init_multitask(rng, cfg: ProteinClassifierConfig, task_dims: dict[str, int]) -> dict:
    keys = jax.random.split(rng, 4 + len(task_dims))
    params = {
        "backbone": init_backbone(keys[0], cfg.lm_config()),
        "shared_latent": {
            "fc": _linear_init(keys[1], cfg.n_embd, cfg.n_embd),
            "ln": _ln_init(cfg.n_embd),
        },
        "heads": {
            name: _linear_init(keys[3 + i], cfg.n_embd, dim)
            for i, (name, dim) in enumerate(sorted(task_dims.items()))
        },
    }
    if cfg.pooling == "attention":
        params["pooler"] = init_attention_pooling(keys[2], cfg.n_embd)
    return params


def init_ebm(rng, n_embd: int = 256, hidden_dim: int = 512) -> dict:
    keys = jax.random.split(rng, 3)
    return {
        "fc1": _linear_init(keys[0], n_embd, hidden_dim),
        "fc2": _linear_init(keys[1], hidden_dim, hidden_dim),
        "fc3": _linear_init(keys[2], hidden_dim, 1),
    }


# --- forward ----------------------------------------------------------------


def _linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _layer_norm(p, x, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dropout(x, rate, rng, train):
    if not train or rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _encoder_layer(p, x, cfg: ProteinLMConfig, *, causal, padding_mask, train, rng):
    """Post-LN transformer encoder layer (torch TransformerEncoderLayer)."""
    B, T, D = x.shape
    H = cfg.n_head
    hd = D // H
    r1 = r2 = r3 = None
    if train and rng is not None:
        r1, r2, r3 = jax.random.split(rng, 3)

    q = _linear(p["attn"]["query"], x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    k = _linear(p["attn"]["key"], x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    v = _linear(p["attn"]["value"], x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)

    mask = jnp.ones((B, 1, T, T), jnp.bool_)
    if causal:
        tri = jnp.tril(jnp.ones((T, T), jnp.bool_))
        mask = mask & tri[None, None]
    if padding_mask is not None:
        # padding_mask True = valid token; keys at padded positions masked out
        mask = mask & padding_mask[:, None, None, :]
    y = sdpa_xla(q, k, v, mask=mask, dropout_rate=cfg.dropout if train else 0.0,
                 dropout_rng=r1)
    y = y.transpose(0, 2, 1, 3).reshape(B, T, D)
    y = _linear(p["attn"]["out"], y)
    x = _layer_norm(p["ln1"], x + _dropout(y, cfg.dropout, r2, train))

    h = _linear(p["ff"]["w2"], jax.nn.gelu(_linear(p["ff"]["w1"], x), approximate=False))
    x = _layer_norm(p["ln2"], x + _dropout(h, cfg.dropout, r3, train))
    return x


def backbone_hidden(
    params: dict,
    cfg: ProteinLMConfig,
    input_ids: jnp.ndarray,
    *,
    causal: bool,
    padding_mask: jnp.ndarray | None = None,
    train: bool = False,
    rng=None,
    inputs_embeds: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Backbone hidden states (pre-final-LN, matching the reference's
    feature-extraction path which skips ``layer_norm``)."""
    if inputs_embeds is None:
        x = params["token_embedding"][input_ids]
        T = input_ids.shape[1]
    else:
        x = inputs_embeds
        T = inputs_embeds.shape[1]
    x = x + params["position_embedding"][:T][None]
    r0 = None
    layer_rngs = [None] * cfg.n_layer
    if train and rng is not None:
        r0, *layer_rngs = jax.random.split(rng, cfg.n_layer + 1)
    x = _dropout(x, cfg.dropout, r0, train)
    for p_layer, r in zip(params["blocks"], layer_rngs):
        x = _encoder_layer(
            p_layer, x, cfg, causal=causal, padding_mask=padding_mask,
            train=train, rng=r,
        )
    return x


def protein_lm_forward(
    params: dict, cfg: ProteinLMConfig, input_ids: jnp.ndarray,
    *, train: bool = False, rng=None,
) -> jnp.ndarray:
    """Causal LM logits (B, T, V) — parity: models.py:33-59."""
    x = backbone_hidden(params, cfg, input_ids, causal=True, train=train, rng=rng)
    x = _layer_norm(params["layer_norm"], x)
    return _linear(params["output_head"], x)


def classifier_forward(
    params: dict, cfg: ProteinClassifierConfig, input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None, *, train: bool = False, rng=None,
) -> jnp.ndarray:
    """BOS-representation classification logits (B, C) — models.py:83-119."""
    if attention_mask is None:
        attention_mask = input_ids != 0
    x = backbone_hidden(
        params["backbone"], cfg.lm_config(), input_ids,
        causal=False, padding_mask=attention_mask.astype(bool), train=train, rng=rng,
    )
    return _linear(params["classification_head"], x[:, 0, :])


def attention_pool(p, x, attention_mask=None):
    """Learned-query pooling → (pooled (B, D), weights (B, T))."""
    k = _linear(p["key_proj"], x)
    v = _linear(p["value_proj"], x)
    logits = (k @ p["query"]) / math.sqrt(k.shape[-1])
    if attention_mask is not None:
        logits = jnp.where(attention_mask.astype(bool), logits, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bt,btd->bd", weights, v), weights


def _pool(params, cfg: ProteinClassifierConfig, x, attention_mask):
    if cfg.pooling == "attention":
        return attention_pool(params["pooler"], x, attention_mask)
    if attention_mask is None:
        return x.mean(axis=1), None
    m = attention_mask.astype(x.dtype)[:, :, None]
    return (x * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0), None


def _shared_latent(p, x, *, dropout, train, rng):
    h = jax.nn.gelu(_layer_norm(p["ln"], _linear(p["fc"], x)), approximate=False)
    return _dropout(h, dropout, rng, train)


def multitask_forward(
    params: dict, cfg: ProteinClassifierConfig, input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None, *, train: bool = False, rng=None,
) -> dict:
    """Per-task logits dict (+ attention weights) — models_multi.py:118-178."""
    r_back = r_lat = None
    if train and rng is not None:
        r_back, r_lat = jax.random.split(rng)
    x = backbone_hidden(
        params["backbone"], cfg.lm_config(), input_ids,
        causal=not cfg.bidirectional,
        padding_mask=attention_mask.astype(bool) if attention_mask is not None else None,
        train=train, rng=r_back,
    )
    pooled, attn_weights = _pool(params, cfg, x, attention_mask)
    latent = _shared_latent(
        params["shared_latent"], pooled, dropout=cfg.dropout, train=train, rng=r_lat
    )
    out = {name: _linear(head, latent) for name, head in params["heads"].items()}
    if attn_weights is not None:
        out["attention_weights"] = attn_weights
    return out


def extract_latent(
    params: dict, cfg: ProteinClassifierConfig, input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None, *, inputs_embeds=None,
) -> jnp.ndarray:
    """Continuous bottleneck latent z (B, D) — models_multi.py:80-116."""
    x = backbone_hidden(
        params["backbone"], cfg.lm_config(), input_ids,
        causal=not cfg.bidirectional,
        padding_mask=attention_mask.astype(bool) if attention_mask is not None else None,
        inputs_embeds=inputs_embeds,
    )
    pooled, _ = _pool(params, cfg, x, attention_mask)
    return _shared_latent(params["shared_latent"], pooled, dropout=0.0, train=False, rng=None)


def ebm_energy(params: dict, z: jnp.ndarray, *, train: bool = False, rng=None,
               dropout: float = 0.1) -> jnp.ndarray:
    """Scalar energy per latent (B,) — parity: ebm.py."""
    if z.ndim == 3:
        z = z.mean(axis=1)
    r1 = r2 = None
    if train and rng is not None:
        r1, r2 = jax.random.split(rng)
    h = _dropout(jax.nn.gelu(_linear(params["fc1"], z), approximate=False), dropout, r1, train)
    h = _dropout(jax.nn.gelu(_linear(params["fc2"], h), approximate=False), dropout, r2, train)
    return _linear(params["fc3"], h)[..., 0]


__all__ = [
    "ProteinClassifierConfig",
    "ProteinLMConfig",
    "attention_pool",
    "backbone_hidden",
    "classifier_forward",
    "ebm_energy",
    "extract_latent",
    "init_attention_pooling",
    "init_backbone",
    "init_classifier",
    "init_ebm",
    "init_multitask",
    "init_protein_lm",
    "load_config",
    "multitask_forward",
    "protein_lm_forward",
]
