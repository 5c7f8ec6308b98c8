"""Generation: KV-cache logit parity, sampling semantics, constrained loops."""

import jax
import numpy as np
import pytest

from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt
from genomics_lm_tpu.generation.decode import (
    CachedDecoder,
    next_token_logits,
    prefill,
    decode_step,
    sample_token,
)
from genomics_lm_tpu.generation import constrained as gen
from genomics_lm_tpu.generation.genetic_code import CODON_TABLE, translate_codons_to_aa
from genomics_lm_tpu.tokenizers.codon import VOCAB, itos as codon_itos, stoi as codon_stoi

ITOS = [codon_itos[i] for i in range(len(VOCAB))]


def make_model(**kw):
    base = dict(vocab_size=68, block_size=32, n_layer=2, n_head=4, n_embd=32, dropout=0.0)
    base.update(kw)
    cfg = CodonGPTConfig(**base)
    params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
    return params, cfg


CACHE_VARIANTS = [
    {},
    {"use_rope": True},
    {"n_kv_head": 2},
    {"use_swiglu": True},
    {"sep_id": None},
    {"termination_aux": True},
    {"moe_experts": 4, "moe_top_k": 2},
]


@pytest.mark.parametrize("kw", CACHE_VARIANTS, ids=[str(v) for v in CACHE_VARIANTS])
def test_cached_vs_uncached_logit_parity(kw):
    """The identical-next-codon-top-k gate: cached decode must reproduce the
    reference's clip-and-recompute logits."""
    params, cfg = make_model(**kw)
    rng = np.random.default_rng(0)
    ids = [1] + [int(x) for x in rng.integers(4, 68, 10)]
    ids.insert(5, 3)  # a SEP mid-sequence
    decoder = CachedDecoder(params, cfg)

    # grow the sequence token by token through the cache
    for t in range(3, len(ids) + 1):
        prefix = ids[:t]
        cached = decoder.next_logits(prefix)
        uncached = next_token_logits(params, cfg, prefix)
        np.testing.assert_allclose(cached, uncached, atol=2e-4)
        # top-k identical
        assert list(np.argsort(cached)[-5:]) == list(np.argsort(uncached)[-5:])


def test_cache_prefill_matches_stepwise():
    params, cfg = make_model()
    rng = np.random.default_rng(1)
    ids = [int(x) for x in rng.integers(4, 68, 8)]
    import jax.numpy as jnp

    logits_a, cache_a, _ = prefill(params, cfg, jnp.asarray([ids], jnp.int32))
    # build the same cache step by step
    logits_b, cache_b, _ = prefill(params, cfg, jnp.asarray([ids[:1]], jnp.int32))
    for tok in ids[1:]:
        logits_b, cache_b, _ = decode_step(
            params, cfg, cache_b, jnp.asarray([tok], jnp.int32)
        )
    np.testing.assert_allclose(
        np.asarray(logits_a[0]), np.asarray(logits_b[0]), atol=2e-4
    )
    assert int(cache_a["length"]) == int(cache_b["length"])


def test_sample_token_semantics():
    rng = np.random.default_rng(0)
    logits = np.asarray([0.0, 10.0, -5.0, 2.0])
    # near-greedy at low temperature
    picks = {sample_token(logits, 1e-4, 0, rng) for _ in range(10)}
    assert picks == {1}
    # topk=1 is greedy
    assert sample_token(logits, 1.0, 1, rng) == 1
    # topk=2 only samples from the top two
    picks = {sample_token(logits, 1.0, 2, rng) for _ in range(50)}
    assert picks <= {1, 3}


def test_generate_cds_constrained_properties():
    params, cfg = make_model()
    decoder = CachedDecoder(params, cfg)
    rng = np.random.default_rng(0)
    ctx = [1, codon_stoi["ATG"]]
    ids, info = gen.generate_cds_constrained(
        decoder, ctx, codon_stoi, ITOS, target_codons=5, hard_cap=10, rng=rng
    )
    new = ids[len(ctx):]
    # CDS-only masking: every generated token is a codon
    assert all(gen._is_codon(ITOS[t]) for t in new)
    assert info["generated_codons"] <= 10
    assert info["protocol"] == "cds_constrained"


def test_generate_red_retries_until_stop():
    params, cfg = make_model()
    decoder = CachedDecoder(params, cfg)
    rng = np.random.default_rng(0)
    ids, info = gen.generate_cds_red(
        decoder, [1], codon_stoi, ITOS, target_codons=3, hard_cap=6,
        max_attempts=3, rng=rng,
    )
    assert "attempts" in info and info["attempts"] <= 3
    if info["had_terminal_stop"]:
        last_codons = [ITOS[t] for t in ids if gen._is_codon(ITOS[t])]
        assert last_codons[-1] in gen.STOP_CODONS


def test_batch_red_budget():
    params, cfg = make_model()
    decoder = CachedDecoder(params, cfg)
    rng = np.random.default_rng(0)
    solved, remaining, total = gen.batch_red_sampler(
        decoder, [[1], [1, codon_stoi["ATG"]]], codon_stoi, ITOS,
        target_codons=3, hard_cap=6, global_token_budget=60, rng=rng,
    )
    assert total <= 60 + 6  # one in-flight attempt may finish
    assert set(solved) | set(remaining) == {0, 1}


def test_critic_guided_uses_score_fn():
    params, cfg = make_model()
    decoder = CachedDecoder(params, cfg)
    rng = np.random.default_rng(0)
    calls = []

    def score_fn(aa_seqs):
        calls.append(aa_seqs)
        return np.zeros(len(aa_seqs))

    ids, info = gen.generate_cds_critic_guided(
        decoder, score_fn, [1], codon_stoi, ITOS,
        target_codons=3, hard_cap=5, guide_top_k=4, rng=rng,
    )
    assert calls and all(len(c) <= 4 for c in calls)
    assert info["guidance_components"][0] == "critic"


def test_synonymous_translates_exactly():
    params, cfg = make_model()
    decoder = CachedDecoder(params, cfg)
    rng = np.random.default_rng(0)
    target = "MKV"
    ids, info = gen.generate_cds_synonymous(
        decoder, [1], codon_stoi, ITOS, target, rng=rng
    )
    codons = [ITOS[t] for t in ids[1:] if gen._is_codon(ITOS[t])]
    assert translate_codons_to_aa(codons[:-1]) == target
    assert codons[-1] in gen.STOP_CODONS
    assert ids[-1] == codon_stoi["<EOS_CDS>"]


def test_genetic_code_table():
    assert CODON_TABLE["ATG"] == "M"
    assert CODON_TABLE["TAA"] == "_"
    assert len(CODON_TABLE) == 64
    assert translate_codons_to_aa(["ATG", "AAA", "NNN"]) == "MKX"


class TestScanGeneration:
    def test_generate_tokens_matches_stepwise_greedy(self):
        import numpy as np

        from genomics_lm_tpu.generation.decode import (
            decode_step,
            generate_tokens,
            prefill,
        )
        from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt

        import jax.numpy as jnp

        cfg = CodonGPTConfig(vocab_size=68, block_size=64, n_layer=2,
                             n_head=4, n_embd=64, dropout=0.0, sep_id=3)
        params = codon_gpt.init(jax.random.key(0), cfg)
        prompt = jnp.asarray(
            np.random.default_rng(0).integers(4, 68, (3, 10)), jnp.int32
        )
        scan_tokens = np.asarray(
            generate_tokens(params, cfg, prompt, 12, jax.random.key(1), 0.0)
        )
        logits, cache, _ = prefill(params, cfg, prompt)
        manual = []
        for _ in range(12):
            token = jnp.argmax(logits, -1).astype(jnp.int32)
            manual.append(np.asarray(token))
            logits, cache, _ = decode_step(params, cfg, cache, token)
        np.testing.assert_array_equal(scan_tokens, np.stack(manual, axis=1))

    def test_generate_masked_tokens_respects_mask(self):
        import jax.numpy as jnp
        import numpy as np

        from genomics_lm_tpu.generation.constrained import cds_token_ids
        from genomics_lm_tpu.generation.decode import generate_masked_tokens
        from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt
        from genomics_lm_tpu.tokenizers.codon import itos as codon_itos

        cfg = CodonGPTConfig(vocab_size=68, block_size=64, n_layer=2,
                             n_head=4, n_embd=64, dropout=0.0, sep_id=3)
        params = codon_gpt.init(jax.random.key(0), cfg)
        prompt = jnp.asarray(
            np.random.default_rng(0).integers(4, 68, (4, 8)), jnp.int32
        )
        itos_list = [codon_itos[i] for i in range(68)]
        allowed = np.zeros(68, bool)
        allowed[cds_token_ids(itos_list)] = True
        tokens = np.asarray(generate_masked_tokens(
            params, cfg, prompt, 16, jax.random.key(1), 1.0,
            jnp.asarray(allowed),
        ))
        assert tokens.shape == (4, 16)
        assert allowed[tokens].all()  # every sampled id is in the CDS set

    def test_bucketed_cache_fills_to_boundary(self):
        """A generation whose horizon exactly fills the bucket stays correct
        through the final slot (off-by-one guard for bucketed caches)."""
        import numpy as np

        from genomics_lm_tpu.generation.decode import (
            cache_bucket,
            decode_step,
            generate_tokens,
            prefill,
        )
        from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt

        import jax.numpy as jnp

        cfg = CodonGPTConfig(vocab_size=68, block_size=512, n_layer=1,
                             n_head=2, n_embd=32, dropout=0.0, sep_id=3)
        params = codon_gpt.init(jax.random.key(0), cfg)
        P, N = 100, 28  # horizon 128 = exactly one bucket
        assert cache_bucket(cfg, P + N) == 128
        prompt = jnp.asarray(
            np.random.default_rng(1).integers(4, 68, (2, P)), jnp.int32
        )
        bucketed = np.asarray(
            generate_tokens(params, cfg, prompt, N, jax.random.key(2), 0.0)
        )
        # full-block stepwise reference
        logits, cache, _ = prefill(params, cfg, prompt)
        manual = []
        for _ in range(N):
            token = jnp.argmax(logits, -1).astype(jnp.int32)
            manual.append(np.asarray(token))
            logits, cache, _ = decode_step(params, cfg, cache, token)
        np.testing.assert_array_equal(bucketed, np.stack(manual, axis=1))

    def test_donated_step_matches_plain(self):
        import numpy as np

        from genomics_lm_tpu.generation.decode import (
            decode_step,
            decode_step_donated,
            prefill,
        )
        from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt

        import jax.numpy as jnp

        cfg = CodonGPTConfig(vocab_size=68, block_size=32, n_layer=1,
                             n_head=2, n_embd=32, dropout=0.0, sep_id=3)
        params = codon_gpt.init(jax.random.key(0), cfg)
        prompt = jnp.asarray(
            np.random.default_rng(2).integers(4, 68, (2, 6)), jnp.int32
        )
        logits_a, cache_a, _ = prefill(params, cfg, prompt)
        logits_b, cache_b, _ = prefill(params, cfg, prompt)
        token = jnp.argmax(logits_a, -1).astype(jnp.int32)
        out_a, _, _ = decode_step(params, cfg, cache_a, token)
        out_b, _, _ = decode_step_donated(params, cfg, cache_b, token)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                                   atol=1e-6)
