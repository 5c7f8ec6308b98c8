"""CodonGPT model: toggle smoke tests, masking, and API contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt
from genomics_lm_tpu.ops.masks import build_attention_mask, segment_ids_from_tokens


def tiny(**kw):
    base = dict(vocab_size=68, block_size=16, n_layer=2, n_head=4, n_embd=32, dropout=0.0)
    base.update(kw)
    return CodonGPTConfig(**base)


TOGGLES = [
    {},
    {"use_rope": True},
    {"use_swiglu": True},
    {"n_kv_head": 2},
    {"n_kv_head": 1},
    {"tie_embeddings": False},
    {"termination_aux": True},
    {"multi_offset_targets": (2, 3)},
    {"use_shape_guidance": True},
    {"use_checkpoint": True},
    {"sep_id": None},
]


@pytest.mark.parametrize("kw", TOGGLES, ids=[str(t) for t in TOGGLES])
def test_forward_smoke(kw):
    cfg = tiny(**kw)
    params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 68)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 1, 68)
    se = jnp.ones((2, 16, 3)) if kw.get("use_shape_guidance") else None
    logits, loss, aux = codon_gpt.forward(
        params, cfg, idx, tgt, return_aux=True, shape_embeddings=se
    )
    assert logits.shape == (2, 16, 68)
    assert jnp.isfinite(loss)
    if cfg.termination_aux:
        assert aux["termination_logits"].shape == (2, 16, 5)
    if cfg.multi_offset_targets:
        assert set(aux["offset_logits"]) == {2, 3}


def test_gqa_invalid():
    with pytest.raises(ValueError):
        tiny(n_kv_head=3)  # 4 heads not divisible by 3


def test_dropout_changes_output_but_eval_deterministic():
    cfg = tiny(dropout=0.5)
    params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 68)
    l1, _ = codon_gpt.forward(params, cfg, idx, train=True, rng=jax.random.PRNGKey(3))
    l2, _ = codon_gpt.forward(params, cfg, idx, train=True, rng=jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(l1), np.asarray(l2))
    e1, _ = codon_gpt.forward(params, cfg, idx)
    e2, _ = codon_gpt.forward(params, cfg, idx)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_causality():
    """Changing a future token never changes past logits."""
    cfg = tiny(sep_id=None)
    params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 4, 68)
    logits1, _ = codon_gpt.forward(params, cfg, idx)
    idx2 = idx.at[0, 10].set((idx[0, 10] + 1) % 64 + 4)
    logits2, _ = codon_gpt.forward(params, cfg, idx2)
    np.testing.assert_allclose(
        np.asarray(logits1[0, :10]), np.asarray(logits2[0, :10]), atol=1e-5
    )


def test_segment_isolation():
    """Tokens after a <SEP> don't see tokens before it."""
    cfg = tiny()
    params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 4, 68)
    idx = idx.at[0, 8].set(3)  # SEP
    logits1, _ = codon_gpt.forward(params, cfg, idx)
    # change a token in the first segment
    idx2 = idx.at[0, 2].set((idx[0, 2] + 1) % 64 + 4)
    logits2, _ = codon_gpt.forward(params, cfg, idx2)
    np.testing.assert_allclose(
        np.asarray(logits1[0, 9:]), np.asarray(logits2[0, 9:]), atol=1e-5
    )
    # without SEP masking the same perturbation must propagate
    cfg_nosep = tiny(sep_id=None)
    l3, _ = codon_gpt.forward(params, cfg_nosep, idx)
    l4, _ = codon_gpt.forward(params, cfg_nosep, idx2)
    assert not np.allclose(np.asarray(l3[0, 9:]), np.asarray(l4[0, 9:]), atol=1e-5)


def test_attention_window_limits_context():
    cfg = tiny(sep_id=None)
    params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 4, 68)
    logits1, _ = codon_gpt.forward(params, cfg, idx, attention_window=2)
    idx2 = idx.at[0, 0].set((idx[0, 0] + 1) % 64 + 4)
    logits2, _ = codon_gpt.forward(params, cfg, idx2, attention_window=2)
    # with window 2 and 2 layers, information reaches at most ~2 layers *
    # (window-1) positions ahead; position 15 is unaffected by position 0
    np.testing.assert_allclose(
        np.asarray(logits1[0, 15]), np.asarray(logits2[0, 15]), atol=1e-5
    )
    with pytest.raises(ValueError):
        build_attention_mask(idx, sep_id=3, attention_window=0)


def test_mask_builder_matches_reference_semantics():
    idx = jnp.asarray([[5, 6, 3, 7, 8]])
    mask = build_attention_mask(idx, sep_id=3)
    m = np.asarray(mask)[0, 0]
    # causal
    assert not m[0, 1]
    # SEP position starts a new segment: positions 2,3,4 are segment 1
    assert m[3, 2] and m[3, 3]
    # cross-segment blocked
    assert not m[3, 1] and not m[4, 0]
    seg = segment_ids_from_tokens(idx, 3)
    np.testing.assert_array_equal(np.asarray(seg)[0], [0, 0, 1, 1, 1])


def test_hidden_states_api():
    cfg = tiny()
    params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 68)
    states = codon_gpt.hidden_states(params, cfg, idx)
    assert [tag for tag, _ in states] == [0, 1, 2, "final"]
    final = codon_gpt.forward_hidden(params, cfg, idx)
    assert final.shape == (2, 16, 32)
    # final == ln_f applied after last block; logits from final @ emb.T
    logits, _ = codon_gpt.forward(params, cfg, idx)
    np.testing.assert_allclose(
        np.asarray(final @ params["tok_emb"].T), np.asarray(logits), atol=1e-5
    )


def test_attention_maps():
    cfg = tiny()
    params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 4, 68)
    maps = codon_gpt.attention_maps(params, cfg, idx)
    assert len(maps) == 2
    assert maps[0].shape == (1, 4, 16, 16)
    probs = np.asarray(maps[0])
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    # causal: strictly-upper-triangular probabilities are zero
    assert abs(np.triu(probs[0, 0], k=1)).max() < 1e-6


def test_remat_matches_no_remat():
    cfg = tiny()
    cfg_ckpt = tiny(use_checkpoint=True)
    params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 68)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 1, 68)

    def loss_fn(p, c):
        return codon_gpt.forward(p, c, idx, tgt)[1]

    g1 = jax.grad(loss_fn)(params, cfg)
    g2 = jax.grad(loss_fn)(params, cfg_ckpt)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_param_count_and_config_dict():
    cfg = tiny()
    params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
    n = codon_gpt.param_count(params)
    assert n > 0
    d = cfg.to_dict()
    assert d["n_layer"] == 2 and d["sep_mask_enabled"] is True
    cfg2 = CodonGPTConfig.from_run_config(
        {"vocab_size": 68, "block_size": 16, "n_layer": 2, "n_head": 4, "d_head": 8}
    )
    assert cfg2.n_embd == 32


class TestPadVocabLanes:
    """pad_vocab_lanes pads the LM-head matmul to 128 output lanes and
    slices back — logits and loss must match the unpadded path (fp32
    reduction-order tolerance), tied and untied, and the flag must
    round-trip through from_run_config (it drives sweep_d512.py)."""

    def _pair(self, tie):
        cfg = CodonGPTConfig(
            vocab_size=68, block_size=32, n_layer=2, n_head=2, n_embd=64,
            dropout=0.0, tie_embeddings=tie,
        )
        params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(3)
        idx = jnp.asarray(rng.integers(4, 68, (2, 32)), jnp.int32)
        tgt = jnp.asarray(rng.integers(4, 68, (2, 32)), jnp.int32)
        return cfg, params, idx, tgt

    @pytest.mark.parametrize("tie", [True, False])
    def test_numerics_match_unpadded(self, tie):
        cfg, params, idx, tgt = self._pair(tie)
        base_logits, base_loss = codon_gpt.forward(params, cfg, idx, tgt)
        pad_logits, pad_loss = codon_gpt.forward(
            params, cfg.replace(pad_vocab_lanes=True), idx, tgt
        )
        assert pad_logits.shape == base_logits.shape
        np.testing.assert_allclose(
            np.asarray(pad_logits), np.asarray(base_logits), atol=1e-4
        )
        np.testing.assert_allclose(float(pad_loss), float(base_loss), atol=1e-5)

    def test_flag_reaches_config_from_run_config(self):
        cfg = CodonGPTConfig.from_run_config(
            {"vocab_size": 68, "block_size": 32, "pad_vocab_lanes": True}
        )
        assert cfg.pad_vocab_lanes is True
        assert CodonGPTConfig.from_run_config(
            {"vocab_size": 68, "block_size": 32}
        ).pad_vocab_lanes is False
