"""Fused Pallas decode-attention kernel vs the XLA einsum reference.

The kernel (``ops/decode_attention.py``) runs in interpret mode on CPU;
parity against ``decode_attention_xla`` is exact-semantics (same masked
softmax chain) so tolerances are f32 rounding only. The end-to-end cases
drive ``decode_step``/``generate_tokens`` with ``attention_impl="flash"``
and require identical results to the einsum path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt
from genomics_lm_tpu.generation.decode import generate_tokens, prefill, decode_step
from genomics_lm_tpu.ops.decode_attention import (
    decode_attention,
    decode_attention_streamed,
    decode_attention_xla,
)
from genomics_lm_tpu.ops.quant import quantize_kv


def _rand_cache(rng, L, B, Hkv, S, D):
    """Packed-lane (L, B, S, Hkv*D) caches."""
    k = jnp.asarray(rng.normal(size=(L, B, S, Hkv * D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(L, B, S, Hkv * D)), jnp.float32)
    return k, v


class TestKernelParity:
    @pytest.mark.parametrize("G", [1, 2])
    @pytest.mark.parametrize("B", [5, 8])
    def test_fp_matches_xla(self, B, G):
        rng = np.random.default_rng(0)
        L, Hkv, S, D = 3, 4, 64, 48
        k, v = _rand_cache(rng, L, B, Hkv, S, D)
        q = jnp.asarray(rng.normal(size=(B, Hkv * G, D)), jnp.float32)
        mask = np.zeros((B, S), np.float32)
        mask[:, 40:] = -1e30
        mask[2, 10:40] = -1e30  # per-row structure (segment semantics)
        mask = jnp.asarray(mask)
        for layer in (0, L - 1):
            got = decode_attention(q, k, v, mask, layer, kv_heads=Hkv,
                                   interpret=True)
            want = decode_attention_xla(q, k, v, mask, layer, kv_heads=Hkv)
            np.testing.assert_allclose(got, want, atol=2e-6)

    def test_int8_matches_xla(self):
        rng = np.random.default_rng(1)
        L, B, Hkv, S, D = 2, 6, 4, 128, 48
        # quantize per head vector, then pack heads into lanes
        kh = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32)
        vh = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32)
        kq, ks = quantize_kv(kh)  # scales (L, B, Hkv, S)
        vq, vs = quantize_kv(vh)
        pack = lambda a: a.transpose(0, 1, 3, 2, 4).reshape(L, B, S, Hkv * D)
        kq, vq = pack(kq), pack(vq)
        q = jnp.asarray(rng.normal(size=(B, Hkv, D)), jnp.float32)
        mask = jnp.where(jnp.arange(S)[None, :] < 100, 0.0, -1e30).astype(
            jnp.float32
        ) * jnp.ones((B, 1))
        got = decode_attention(q, kq, vq, mask, 1, ks, vs, interpret=True)
        want = decode_attention_xla(q, kq, vq, mask, 1, ks, vs)
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_int8_gqa_matches_xla(self):
        # G = 2: scale rows must broadcast per head group
        rng = np.random.default_rng(7)
        L, B, Hkv, S, D = 2, 8, 2, 64, 48
        kh = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32)
        vh = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32)
        kq, ks = quantize_kv(kh)
        vq, vs = quantize_kv(vh)
        pack = lambda a: a.transpose(0, 1, 3, 2, 4).reshape(L, B, S, Hkv * D)
        kq, vq = pack(kq), pack(vq)
        q = jnp.asarray(rng.normal(size=(B, Hkv * 2, D)), jnp.float32)
        mask = jnp.zeros((B, S), jnp.float32)
        got = decode_attention(q, kq, vq, mask, 0, ks, vs, interpret=True)
        want = decode_attention_xla(q, kq, vq, mask, 0, ks, vs)
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_single_valid_slot(self):
        # only the self slot attendable → output is exactly that V row
        rng = np.random.default_rng(2)
        L, B, Hkv, S, D = 1, 4, 2, 64, 48
        k, v = _rand_cache(rng, L, B, Hkv, S, D)
        q = jnp.asarray(rng.normal(size=(B, Hkv, D)), jnp.float32)
        mask = jnp.full((B, S), -1e30, jnp.float32).at[:, 7].set(0.0)
        got = decode_attention(q, k, v, mask, 0, kv_heads=Hkv, interpret=True)
        want = v[0, :, 7, :].reshape(B, Hkv, D)
        np.testing.assert_allclose(got, want, atol=2e-6)


class TestStreamedKernel:
    """decode_attention_streamed: online-softmax + DMA ring vs einsum."""

    def test_fp_gqa_blocks_match_xla(self):
        rng = np.random.default_rng(11)
        L, B, Hkv, S, D, G = 2, 8, 2, 64, 48, 2
        k, v = _rand_cache(rng, L, B, Hkv, S, D)
        q = jnp.asarray(rng.normal(size=(B, Hkv * G, D)), jnp.float32)
        mask = np.zeros((B, S), np.float32)
        mask[:, 50:] = -1e30
        mask[1, 5:50] = -1e30
        mask[2, :32] = -1e30  # first stream chunk fully masked (bs=32):
        # the online-softmax m=-inf edge must contribute exactly zero
        mask = jnp.asarray(mask)
        want = decode_attention_xla(q, k, v, mask, 1, kv_heads=Hkv)
        for bs in (None, 32, 16):
            got = decode_attention_streamed(
                q, k, v, mask, 1, kv_heads=Hkv, interpret=True, block_s=bs
            )
            np.testing.assert_allclose(got, want, atol=2e-6)

    def test_int8_matches_xla(self):
        rng = np.random.default_rng(12)
        L, B, Hkv, S, D = 2, 8, 4, 64, 48
        kh = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32)
        vh = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32)
        kq, ks = quantize_kv(kh)
        vq, vs = quantize_kv(vh)
        pack = lambda a: a.transpose(0, 1, 3, 2, 4).reshape(L, B, S, Hkv * D)
        kq, vq = pack(kq), pack(vq)
        q = jnp.asarray(rng.normal(size=(B, Hkv * 2, D)), jnp.float32)
        mask = jnp.where(jnp.arange(S)[None, :] < 40, 0.0, -1e30).astype(
            jnp.float32
        ) * jnp.ones((B, 1))
        got = decode_attention_streamed(
            q, kq, vq, mask, 0, ks, vs, interpret=True, block_s=32
        )
        want = decode_attention_xla(q, kq, vq, mask, 0, ks, vs)
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_odd_batch_falls_back_to_full_axis(self):
        # B=5 has no 8-multiple divisor → one whole-batch program
        rng = np.random.default_rng(13)
        L, B, Hkv, S, D = 1, 5, 2, 64, 48
        k, v = _rand_cache(rng, L, B, Hkv, S, D)
        q = jnp.asarray(rng.normal(size=(B, Hkv, D)), jnp.float32)
        mask = jnp.zeros((B, S), jnp.float32)
        got = decode_attention_streamed(
            q, k, v, mask, 0, kv_heads=Hkv, interpret=True, block_s=32
        )
        want = decode_attention_xla(q, k, v, mask, 0, kv_heads=Hkv)
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_block_pick_respects_budget(self):
        from genomics_lm_tpu.ops.decode_attention import (
            _STREAM_VMEM_BUDGET, _pick_stream_blocks)

        for B, S, P, esize in [(256, 256, 384, 2), (256, 512, 384, 1),
                               (64, 128, 512, 2), (8, 64, 96, 4)]:
            bb, sb = _pick_stream_blocks(B, S, P, esize, None, None)
            assert B % bb == 0 and S % sb == 0
            # hardware contract: dynamic lane slices need 128-multiples
            assert sb % 128 == 0 or sb == S
            assert 4 * bb * sb * P * esize <= _STREAM_VMEM_BUDGET or bb == 8


class TestEndToEnd:
    def _cfg(self, impl, **kw):
        return CodonGPTConfig(
            vocab_size=68, block_size=64, n_layer=2, n_head=4, n_embd=64,
            dropout=0.0, sep_id=3, attention_impl=impl, **kw,
        )

    @pytest.mark.parametrize("kv_quant", [False, True])
    def test_decode_step_flash_matches_xla(self, kv_quant):
        rng = np.random.default_rng(3)
        prompt = jnp.asarray(rng.integers(4, 68, (3, 10)), jnp.int32)
        cfg_x, cfg_f = self._cfg("xla"), self._cfg("flash")
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg_x)
        logits_x, cache_x, _ = prefill(params, cfg_x, prompt, None, kv_quant)
        logits_f, cache_f, _ = prefill(params, cfg_f, prompt, None, kv_quant)
        np.testing.assert_allclose(logits_x, logits_f, atol=1e-5)
        token = jnp.argmax(logits_x, -1).astype(jnp.int32)
        for _ in range(3):
            logits_x, cache_x, _ = decode_step(params, cfg_x, cache_x, token)
            logits_f, cache_f, _ = decode_step(params, cfg_f, cache_f, token)
            np.testing.assert_allclose(logits_x, logits_f, atol=1e-4)
            token = jnp.argmax(logits_x, -1).astype(jnp.int32)

    def test_generate_tokens_flash_matches_xla_greedy(self):
        rng = np.random.default_rng(4)
        prompt = jnp.asarray(rng.integers(4, 68, (2, 8)), jnp.int32)
        params = codon_gpt.init(jax.random.PRNGKey(1), self._cfg("xla"))
        out_x = generate_tokens(
            params, self._cfg("xla"), prompt, 12, jax.random.PRNGKey(2), 0.0
        )
        out_f = generate_tokens(
            params, self._cfg("flash"), prompt, 12, jax.random.PRNGKey(2), 0.0
        )
        np.testing.assert_array_equal(np.asarray(out_x), np.asarray(out_f))

    def test_decode_step_flash_with_segments(self):
        # a <SEP> token mid-stream must reset attention identically
        cfg_x, cfg_f = self._cfg("xla"), self._cfg("flash")
        params = codon_gpt.init(jax.random.PRNGKey(5), cfg_x)
        prompt = jnp.asarray([[10, 11, 3, 12, 13]], jnp.int32)  # SEP at pos 2
        lx, cx, _ = prefill(params, cfg_x, prompt)
        lf, cf, _ = prefill(params, cfg_f, prompt)
        for tok in [14, 3, 15]:  # includes another SEP during decode
            t = jnp.asarray([tok], jnp.int32)
            lx, cx, _ = decode_step(params, cfg_x, cx, t)
            lf, cf, _ = decode_step(params, cfg_f, cf, t)
            np.testing.assert_allclose(lx, lf, atol=1e-4)
