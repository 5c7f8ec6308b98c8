"""Int8 serving path: weight-only linears and the int8 KV cache.

No reference analog — the reference serves in full precision
(``generate.py:13-27``); these tests pin the quantized path's agreement
with the full-precision one (it is an approximation, so tolerances are
looser than the exact cache-parity tests in test_generation.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt
from genomics_lm_tpu.generation.decode import (
    decode_step,
    generate_tokens,
    init_cache,
    prefill,
)
from genomics_lm_tpu.ops.quant import (
    dequantize_weight,
    quantize_kv,
    quantize_params,
    quantize_weight,
)


def make_model(**kw):
    base = dict(
        vocab_size=68, block_size=32, n_layer=2, n_head=4, n_embd=32,
        dropout=0.0, compute_dtype="float32",
    )
    base.update(kw)
    cfg = CodonGPTConfig(**base)
    params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
    return params, cfg


def test_weight_quant_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 64, 48), jnp.float32)
    q = quantize_weight(w)
    assert q["w_q"].dtype == jnp.int8
    assert q["scale"].shape == (3, 48)
    err = jnp.max(jnp.abs(dequantize_weight(q) - w))
    # symmetric int8: max error <= scale/2 = amax/254 per channel
    assert float(err) <= float(jnp.max(jnp.abs(w))) / 254 + 1e-6


def test_kv_quant_roundtrip_error():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 16), jnp.float32)
    x_q, scale = quantize_kv(x)
    assert x_q.dtype == jnp.int8 and scale.shape == (2, 4, 8)
    recon = x_q.astype(jnp.float32) * scale[..., None]
    assert float(jnp.max(jnp.abs(recon - x))) <= float(jnp.max(jnp.abs(x))) / 254 + 1e-6


@pytest.mark.parametrize("kw", [{}, {"use_swiglu": True}, {"fused_qkv": True}],
                         ids=["gelu", "swiglu", "fused_qkv"])
def test_quantized_weights_logit_agreement(kw):
    params, cfg = make_model(**kw)
    qparams = quantize_params(params)
    # block linears replaced, everything else untouched
    assert "w_q" in qparams["blocks"]["attn"]["query"]
    assert "w" not in qparams["blocks"]["attn"]["query"]
    assert qparams["tok_emb"] is params["tok_emb"]

    idx = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, cfg.vocab_size)
    ref = codon_gpt.forward(params, cfg, idx, None)[0]
    got = codon_gpt.forward(qparams, cfg, idx, None)[0]
    # int8 weights perturb logits slightly; rank structure must survive
    assert float(jnp.max(jnp.abs(ref - got))) < 0.35
    agree = jnp.mean(
        (jnp.argmax(ref, -1) == jnp.argmax(got, -1)).astype(jnp.float32)
    )
    assert float(agree) > 0.9


def test_int8_kv_cache_decode_matches_full_precision():
    params, cfg = make_model(use_rope=True, n_kv_head=2)
    prompt = jax.random.randint(jax.random.PRNGKey(4), (2, 8), 0, cfg.vocab_size)

    logits_fp, cache_fp, _ = prefill(params, cfg, prompt)
    logits_q, cache_q, _ = prefill(params, cfg, prompt, None, True)
    assert cache_q["k"].dtype == jnp.int8
    assert "k_scale" in cache_q and cache_q["k_scale"].dtype == jnp.float32
    # prefill logits come from the full-precision forward in both cases
    np.testing.assert_allclose(np.asarray(logits_fp), np.asarray(logits_q), atol=1e-5)

    # several decode steps: quantized cache must track the fp path closely
    tok = jnp.argmax(logits_fp, -1).astype(jnp.int32)
    for _ in range(4):
        logits_fp, cache_fp, _ = decode_step(params, cfg, cache_fp, tok)
        logits_q, cache_q, _ = decode_step(params, cfg, cache_q, tok)
        assert cache_q["k"].dtype == jnp.int8  # scales persist across steps
        assert "k_scale" in cache_q
        assert float(jnp.max(jnp.abs(logits_fp - logits_q))) < 0.2
        agree = jnp.mean(
            (jnp.argmax(logits_fp, -1) == jnp.argmax(logits_q, -1)).astype(jnp.float32)
        )
        assert float(agree) == 1.0
        tok = jnp.argmax(logits_fp, -1).astype(jnp.int32)


def test_generate_tokens_kv_quant_runs_and_is_greedy_consistent():
    params, cfg = make_model(use_rope=True)
    prompt = jax.random.randint(jax.random.PRNGKey(5), (2, 4), 0, cfg.vocab_size)
    key = jax.random.PRNGKey(6)
    out_fp = generate_tokens(params, cfg, prompt, 8, key, 0.0)
    out_q = generate_tokens(params, cfg, prompt, 8, key, 0.0, True)
    assert out_q.shape == (2, 8)
    # greedy decode: int8 cache rounding may flip near-ties, but on a
    # random-init model the argmax path should almost always agree
    agree = np.mean(np.asarray(out_fp) == np.asarray(out_q))
    assert agree >= 0.75


def test_quantized_weights_plus_int8_cache_end_to_end():
    params, cfg = make_model(fused_qkv=True, use_rope=True)
    qparams = quantize_params(params)
    prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    out = generate_tokens(qparams, cfg, prompt, 6, jax.random.PRNGKey(7), 0.0, True)
    assert out.shape == (1, 6)
    assert int(out.min()) >= 0 and int(out.max()) < cfg.vocab_size


def test_init_cache_quant_shapes():
    _, cfg = make_model()
    c = init_cache(cfg, batch=3, cache_size=16, kv_quant=True)
    assert c["k"].shape == (cfg.n_layer, 3, 16, cfg.kv_heads * cfg.head_dim)
    # packed-lane cache, (L, B, Hkv, S) scales — see ops/decode_attention.py
    assert c["k_scale"].shape == (cfg.n_layer, 3, cfg.kv_heads, 16)
    assert c["v_scale"].dtype == jnp.float32
