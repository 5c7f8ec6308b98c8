"""Pallas flash attention vs XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genomics_lm_tpu.ops.attention import attention
from genomics_lm_tpu.ops.flash_attention import flash_attention
from genomics_lm_tpu.ops.masks import segment_ids_from_tokens

rng = np.random.default_rng(7)
B, H, T, D = 2, 2, 64, 16


def make_qkv(hkv=None):
    q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, hkv or H, T, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, hkv or H, T, D)), jnp.float32)
    return q, k, v


def make_segments():
    tokens = rng.integers(4, 68, (B, T))
    tokens[:, ::17] = 3
    return segment_ids_from_tokens(jnp.asarray(tokens), 3)


CASES = [
    dict(),
    dict(seg=True),
    dict(window=9),
    dict(seg=True, window=21),
    dict(hkv=1),
    dict(seg=True, window=30, hkv=1),
]


@pytest.mark.parametrize("case", CASES, ids=[str(c) for c in CASES])
def test_forward_and_grad_parity(case):
    seg = make_segments() if case.get("seg") else None
    window = case.get("window")
    q, k, v = make_qkv(case.get("hkv"))

    ref = attention(q, k, v, segment_ids=seg, attention_window=window, impl="xla")
    out = flash_attention(q, k, v, segment_ids=seg, attention_window=window, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)

    def loss(fn):
        def inner(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2)

        return jax.grad(inner, argnums=(0, 1, 2))(q, k, v)

    g_ref = loss(lambda q, k, v: attention(q, k, v, segment_ids=seg, attention_window=window, impl="xla"))
    g_out = loss(lambda q, k, v: flash_attention(q, k, v, segment_ids=seg, attention_window=window, interpret=True))
    for a, b in zip(g_ref, g_out):
        scale = float(jnp.abs(a).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-4)


def test_model_forward_with_flash_impl():
    from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt

    cfg_x = CodonGPTConfig(vocab_size=68, block_size=32, n_layer=2, n_head=4,
                           n_embd=32, dropout=0.0, attention_impl="xla")
    cfg_f = cfg_x.replace(attention_impl="flash")
    params = codon_gpt.init(jax.random.PRNGKey(0), cfg_x)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, 68)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 32), 1, 68)
    lx, lossx = codon_gpt.forward(params, cfg_x, idx, tgt)
    lf, lossf = codon_gpt.forward(params, cfg_f, idx, tgt)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lf), atol=1e-4)
    assert abs(float(lossx) - float(lossf)) < 1e-5

    def lfn(p, c):
        return codon_gpt.forward(p, c, idx, tgt)[1]

    gx = jax.grad(lfn)(params, cfg_x)
    gf = jax.grad(lfn)(params, cfg_f)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestLargeTiles:
    """512-tile configs (the tuned bench setting) must match XLA exactly."""

    def test_full_sequence_tiles_match_xla(self):
        import numpy as np

        from genomics_lm_tpu.ops.attention import attention
        from genomics_lm_tpu.ops.flash_attention import flash_attention

        rng = np.random.default_rng(0)
        B, H, T, D = 2, 2, 256, 48
        q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        seg = jnp.asarray(np.cumsum(rng.random((B, T)) < 0.02, axis=1),
                          jnp.int32)
        ref = attention(q, k, v, segment_ids=seg, impl="xla")
        for bq, bk in [(256, 256), (512, 512), (512, 256)]:
            out = flash_attention(q, k, v, segment_ids=seg, block_q=bq,
                                  block_k=bk, interpret=True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=5e-6)

    def test_fused_qkv_logits_exact(self):
        import numpy as np

        from genomics_lm_tpu.models import codon_gpt
        from genomics_lm_tpu.models.config import CodonGPTConfig

        cfg = CodonGPTConfig(vocab_size=68, block_size=32, n_layer=2,
                             n_head=4, n_embd=64, dropout=0.0)
        params = codon_gpt.init(jax.random.key(0), cfg)
        x = jnp.asarray(
            np.random.default_rng(0).integers(4, 68, (2, 32)), jnp.int32
        )
        base = codon_gpt.forward(params, cfg, x)[0]
        fused = codon_gpt.forward(params, cfg.replace(fused_qkv=True), x)[0]
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                                   atol=1e-5)


class TestSuffixQueries:
    """T < S: queries are the suffix of the key sequence (cached decode).
    The flash band must bottom-right align (positions S-T..S-1)."""

    @pytest.mark.parametrize("case", [
        dict(), dict(window=9), dict(seg=True), dict(seg=True, window=13),
    ], ids=["causal", "window", "seg", "seg+window"])
    def test_suffix_matches_dense_reference(self, case):
        from genomics_lm_tpu.ops.attention import sdpa_xla

        S, Tq = 64, 16
        rng2 = np.random.default_rng(11)
        q = jnp.asarray(rng2.normal(size=(B, H, Tq, D)), jnp.float32)
        k = jnp.asarray(rng2.normal(size=(B, H, S, D)), jnp.float32)
        v = jnp.asarray(rng2.normal(size=(B, H, S, D)), jnp.float32)
        seg = None
        if case.get("seg"):
            tokens = rng2.integers(4, 68, (B, S))
            tokens[:, ::17] = 3
            seg = segment_ids_from_tokens(jnp.asarray(tokens), 3)
        window = case.get("window")

        q_pos = jnp.arange(Tq) + (S - Tq)
        k_pos = jnp.arange(S)
        dense = (q_pos[:, None] >= k_pos[None, :])[None, None]
        if window is not None:
            dense = dense & ((q_pos[:, None] - k_pos[None, :]) < window)[None, None]
        dense = jnp.broadcast_to(dense, (B, 1, Tq, S))
        if seg is not None:
            seg_eq = seg[:, S - Tq:, None] == seg[:, None, :]
            dense = dense & seg_eq[:, None, :, :]

        ref = sdpa_xla(q, k, v, mask=dense)
        out = flash_attention(q, k, v, segment_ids=seg,
                              attention_window=window, interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)
        # the dispatcher's structured-mask XLA lowering must align the same
        via_xla = attention(q, k, v, segment_ids=seg,
                            attention_window=window, impl="xla")
        np.testing.assert_allclose(np.asarray(ref), np.asarray(via_xla), atol=1e-5)

        # gradients through the custom VJP, same alignment
        def loss(fn):
            return jax.grad(lambda *a: jnp.sum(fn(*a) ** 2), argnums=(0, 1, 2))(q, k, v)

        g_ref = loss(lambda q, k, v: sdpa_xla(q, k, v, mask=dense))
        g_out = loss(lambda q, k, v: flash_attention(
            q, k, v, segment_ids=seg, attention_window=window, interpret=True))
        for a, b in zip(g_ref, g_out):
            scale = float(jnp.abs(a).max()) + 1e-9
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-4)

    def test_key_shorter_than_query_rejected(self):
        q, k, v = make_qkv()
        with pytest.raises(ValueError):
            flash_attention(q, k[:, :, :T // 2], v[:, :, :T // 2], interpret=True)


class TestOffGridFallback:
    def test_off_grid_lengths_fall_back_to_xla(self):
        """T not divisible by the flash blocks (e.g. a 304-token battery
        sample under 512-wide blocks) must degrade to the XLA path instead
        of rejecting in Mosaic — and match it exactly."""
        import numpy as np
        import jax
        import jax.numpy as jnp

        from genomics_lm_tpu.ops.attention import attention

        rng = np.random.default_rng(0)
        B, H, T, D = 2, 2, 76, 16  # 76 % 64 != 0
        q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
                   for _ in range(3))
        seg = jnp.asarray(rng.integers(0, 2, (B, T)).cumsum(axis=1), jnp.int32)
        got = attention(q, k, v, segment_ids=seg, impl="flash",
                        block_q=64, block_k=64)
        want = attention(q, k, v, segment_ids=seg, impl="xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
