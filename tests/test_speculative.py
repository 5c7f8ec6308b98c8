"""Speculative decoding: verify-chunk parity, acceptance math, exactness.

The contract: speculative decoding is a pure throughput optimization —
the output DISTRIBUTION is identical to the plain sampled path, and
greedy outputs are bit-identical to ``generate_tokens`` regardless of
the draft table. Verified here by (1) chunk-forward parity against the
stepwise ragged decode, (2) the rejection-sampling math against a numpy
reference, (3) greedy token equality end-to-end, (4) an empirical
distribution check against the exactly-computed target joint, and
(5) engine integration under co-scheduling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt
from genomics_lm_tpu.generation.decode import decode_step, generate_tokens, prefill
from genomics_lm_tpu.serving.engine import (
    ServingEngine,
    _ragged_decode,
    admit_many,
    init_serving_state,
)
from genomics_lm_tpu.serving.speculative import (
    _ragged_verify,
    fit_bigram_table,
    generate_tokens_speculative,
    restrict_table,
    speculative_acceptance,
    speculative_generate,
)


def make_model(**over):
    kw = dict(
        vocab_size=68, block_size=96, n_layer=2, n_head=4, n_embd=64,
        dropout=0.0, sep_id=3,
    )
    kw.update(over)
    cfg = CodonGPTConfig(**kw)
    params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
    return params, cfg


def ragged_state(params, cfg, prompt_lens, pad_to=32, kv_quant=False,
                 cache=48):
    """Serving state with ragged random prompts admitted into every slot."""
    rng = np.random.default_rng(7)
    B = len(prompt_lens)
    prompts = np.zeros((B, pad_to), np.int32)
    for i, n in enumerate(prompt_lens):
        prompts[i, 0] = 1
        prompts[i, 1:n] = rng.integers(4, cfg.vocab_size, n - 1)
    state = init_serving_state(cfg, B, cache, kv_quant)
    state = admit_many(
        params, cfg, state, jnp.arange(B), jnp.asarray(prompts),
        jnp.asarray(prompt_lens, jnp.int32), jnp.ones((B,), bool))
    return state


class TestRaggedVerify:
    @pytest.mark.parametrize("kv_quant", [False, True])
    def test_chunk_matches_stepwise(self, kv_quant):
        """Verify-chunk logits == iterated single-token ragged decode."""
        params, cfg = make_model(use_rope=True, use_swiglu=True, n_kv_head=2)
        state = ragged_state(params, cfg, [5, 9, 3], kv_quant=kv_quant)
        rng = np.random.default_rng(1)
        T = 5
        tokens = rng.integers(4, cfg.vocab_size, (3, T)).astype(np.int32)
        tokens[0, 2] = cfg.sep_id  # exercise mid-chunk segment reset
        tokens[2, 0] = cfg.sep_id
        chunk_logits, upd, chunk_seg = _ragged_verify(
            params, cfg, state, jnp.asarray(tokens))

        st = state
        rows, segs = [], []
        for j in range(T):
            logits, st = _ragged_decode(
                params, cfg, st, jnp.asarray(tokens[:, j]))
            rows.append(logits)
            segs.append(st["seg_count"])
        tol = 2e-2 if kv_quant else 1e-4  # int8 requantization differs per path
        np.testing.assert_allclose(
            np.asarray(chunk_logits), np.stack(rows, 1), atol=tol, rtol=tol)
        np.testing.assert_array_equal(
            np.asarray(chunk_seg), np.stack(segs, 1))
        if not kv_quant:
            np.testing.assert_allclose(
                np.asarray(upd["k"]), np.asarray(st["k"]), atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(upd["v"]), np.asarray(st["v"]), atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(upd["seg"]), np.asarray(st["seg"]))

    def test_learned_positions_and_aux_free(self):
        """Non-RoPE (learned positional) chunk parity."""
        params, cfg = make_model(use_rope=False)
        state = ragged_state(params, cfg, [4, 12])
        rng = np.random.default_rng(2)
        tokens = rng.integers(4, cfg.vocab_size, (2, 3)).astype(np.int32)
        chunk_logits, _, _ = _ragged_verify(
            params, cfg, state, jnp.asarray(tokens))
        st = state
        rows = []
        for j in range(3):
            logits, st = _ragged_decode(
                params, cfg, st, jnp.asarray(tokens[:, j]))
            rows.append(logits)
        np.testing.assert_allclose(
            np.asarray(chunk_logits), np.stack(rows, 1), atol=1e-4)


class TestChunkKernelParity:
    """Fused multi-query kernel (interpret mode) vs the einsum reference."""

    @pytest.mark.parametrize("G", [1, 2])
    def test_fp_matches_xla(self, G):
        from genomics_lm_tpu.ops.decode_attention import (
            decode_attention_chunk,
            decode_attention_chunk_xla,
        )

        rng = np.random.default_rng(0)
        L, B, Hkv, S, D, T = 3, 5, 4, 64, 48, 4
        k = jnp.asarray(rng.normal(size=(L, B, S, Hkv * D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(L, B, S, Hkv * D)), jnp.float32)
        q = jnp.asarray(rng.normal(size=(B, Hkv * G, T, D)), jnp.float32)
        mask = np.zeros((B, T, S), np.float32)
        for t in range(T):  # staircase intra-chunk causality
            mask[:, t, 40 + t + 1:] = -1e30
        mask[2, :, 10:30] = -1e30  # per-row segment structure
        mask = jnp.asarray(mask)
        for layer in (0, L - 1):
            got = decode_attention_chunk(
                q, k, v, mask, layer, kv_heads=Hkv, interpret=True)
            want = decode_attention_chunk_xla(
                q, k, v, mask, layer, kv_heads=Hkv)
            np.testing.assert_allclose(got, want, atol=2e-6)

    def test_int8_matches_xla(self):
        from genomics_lm_tpu.ops.decode_attention import (
            decode_attention_chunk,
            decode_attention_chunk_xla,
        )
        from genomics_lm_tpu.ops.quant import quantize_kv

        rng = np.random.default_rng(1)
        L, B, Hkv, S, D, T, G = 2, 6, 4, 128, 48, 3, 2
        kh = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32)
        vh = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32)
        kq, ks = quantize_kv(kh)
        vq, vs = quantize_kv(vh)
        pack = lambda a: a.transpose(0, 1, 3, 2, 4).reshape(L, B, S, Hkv * D)
        kq, vq = pack(kq), pack(vq)
        q = jnp.asarray(rng.normal(size=(B, Hkv * G, T, D)), jnp.float32)
        mask = np.zeros((B, T, S), np.float32)
        mask[:, :, 100:] = -1e30
        mask = jnp.asarray(mask)
        got = decode_attention_chunk(
            q, kq, vq, mask, 1, ks, vs, kv_heads=Hkv, interpret=True)
        want = decode_attention_chunk_xla(
            q, kq, vq, mask, 1, ks, vs, kv_heads=Hkv)
        np.testing.assert_allclose(got, want, atol=2e-6)


class TestAcceptance:
    def test_matches_numpy_reference(self):
        rng = np.random.default_rng(0)
        B, K, V = 6, 3, 7
        P = rng.dirichlet(np.ones(V), (B, K + 1)).astype(np.float32)
        Q = rng.dirichlet(np.ones(V), (B, K)).astype(np.float32)
        drafts = rng.integers(0, V, (B, K)).astype(np.int32)
        U = rng.random((B, K)).astype(np.float32)
        m, nxt = speculative_acceptance(
            jnp.asarray(P), jnp.asarray(Q), jnp.asarray(drafts),
            jnp.asarray(U))
        m, nxt = np.asarray(m), np.asarray(nxt)
        for b in range(B):
            mm = 0
            for j in range(K):
                if U[b, j] * Q[b, j, drafts[b, j]] < P[b, j, drafts[b, j]]:
                    mm += 1
                else:
                    break
            assert m[b] == mm
            if mm == K:
                expect = P[b, K]
            else:
                r = np.maximum(P[b, mm] - Q[b, mm], 0.0)
                expect = r / r.sum()
            np.testing.assert_allclose(nxt[b], expect, atol=1e-6)

    def test_greedy_onehot_target(self):
        """One-hot P: the argmax draft always accepts, others always
        reject with a one-hot residual — speculative greedy is greedy."""
        V, K = 5, 2
        P = np.zeros((2, K + 1, V), np.float32)
        P[:, :, 2] = 1.0  # argmax token is 2 at every position
        Q = np.full((2, K, V), 1.0 / V, np.float32)
        drafts = np.array([[2, 2], [2, 4]], np.int32)
        U = np.full((2, K), 0.999, np.float32)
        m, nxt = speculative_acceptance(
            jnp.asarray(P), jnp.asarray(Q), jnp.asarray(drafts),
            jnp.asarray(U))
        assert list(np.asarray(m)) == [2, 1]
        np.testing.assert_allclose(np.asarray(nxt)[:, 2], 1.0, atol=1e-6)


class TestSpeculativeGenerate:
    def test_greedy_matches_generate_tokens(self):
        params, cfg = make_model(use_rope=True)
        rng = np.random.default_rng(3)
        B, Plen, n = 4, 8, 16
        prompts = np.concatenate(
            [np.ones((B, 1), np.int32),
             rng.integers(4, cfg.vocab_size, (B, Plen - 1)).astype(np.int32)],
            axis=1)
        plain = np.asarray(generate_tokens(
            params, cfg, jnp.asarray(prompts), n, jax.random.PRNGKey(5), 0.0))
        table = fit_bigram_table(
            rng.integers(0, cfg.vocab_size, 5000), cfg.vocab_size)
        spec, stats = speculative_generate(
            params, cfg, prompts, n, jax.random.PRNGKey(6), table,
            n_draft=3, temperature=0.0)
        np.testing.assert_array_equal(plain, spec)
        assert stats["tokens_per_round"] >= 1.0

    def test_masked_greedy_matches_generate_masked_tokens(self):
        """CDS-restricted speculative greedy == generate_masked_tokens
        greedy (the design-loop candidate fan-out path)."""
        from genomics_lm_tpu.generation.decode import generate_masked_tokens

        params, cfg = make_model()
        rng = np.random.default_rng(8)
        allowed = np.zeros((68,), bool)
        allowed[4:] = True  # CDS codons only
        prompts = np.concatenate(
            [np.ones((3, 1), np.int32),
             rng.integers(4, 68, (3, 5)).astype(np.int32)], axis=1)
        plain = np.asarray(generate_masked_tokens(
            params, cfg, jnp.asarray(prompts), 12, jax.random.PRNGKey(5),
            0.0, jnp.asarray(allowed)))
        table = restrict_table(
            fit_bigram_table(rng.integers(0, 68, 4000), 68), allowed)
        spec, _, _ = generate_tokens_speculative(
            params, cfg, jnp.asarray(prompts), 12, jax.random.PRNGKey(6),
            jnp.asarray(table), 3, 0.0, False, jnp.asarray(allowed))
        np.testing.assert_array_equal(plain, np.asarray(spec))

    @pytest.mark.parametrize("n_tokens,n_draft,plen", [
        (1, 3, 4),   # K > n_tokens: overshoot parks in the scratch column
        (2, 4, 1),   # minimal prompt
        (5, 1, 3),   # minimal draft
    ])
    def test_edge_shapes_greedy_exact(self, n_tokens, n_draft, plen):
        """Tiny horizons/prompts/drafts: the while-loop generator's output
        buffer and overshoot parking must stay exact."""
        params, cfg = make_model()
        rng = np.random.default_rng(20 + n_tokens)
        prompts = np.concatenate(
            [np.ones((2, 1), np.int32),
             rng.integers(4, 68, (2, plen - 1)).astype(np.int32)], axis=1
        ) if plen > 1 else np.ones((2, 1), np.int32)
        plain = np.asarray(generate_tokens(
            params, cfg, jnp.asarray(prompts), n_tokens,
            jax.random.PRNGKey(5), 0.0))
        table = fit_bigram_table(rng.integers(0, 68, 3000), 68)
        spec, stats = speculative_generate(
            params, cfg, prompts, n_tokens, jax.random.PRNGKey(6), table,
            n_draft=n_draft, temperature=0.0)
        np.testing.assert_array_equal(plain, spec)
        assert stats["tokens_per_round"] >= 1.0

    def test_distribution_preserved(self):
        """Empirical speculative joint over 2 sampled tokens matches the
        exactly-computed target joint (temperature 0.9)."""
        params, cfg = make_model(
            vocab_size=8, block_size=16, n_layer=1, n_head=2, n_embd=16)
        temp = 0.9
        prompt = np.array([[1, 4]], np.int32)

        # exact target joint via the parity-tested cached decode
        logits0, cache, _ = prefill(params, cfg, jnp.asarray(prompt))
        p1 = np.asarray(jax.nn.softmax(logits0[0].astype(jnp.float32) / temp))
        joint = np.zeros((8, 8))
        for t1 in range(8):
            logits1, _, _ = decode_step(
                params, cfg, cache, jnp.asarray([t1], jnp.int32))
            p2 = np.asarray(
                jax.nn.softmax(logits1[0].astype(jnp.float32) / temp))
            joint[t1] = p1[t1] * p2

        # draft deliberately different from the target (uniform-ish)
        table = fit_bigram_table(
            np.random.default_rng(0).integers(0, 8, 2000), 8)
        B = 8000
        spec, stats = speculative_generate(
            params, cfg, np.tile(prompt, (B, 1)), 2, jax.random.PRNGKey(11),
            table, n_draft=2, temperature=temp)
        emp = np.zeros((8, 8))
        for t1, t2 in spec:
            emp[t1, t2] += 1.0 / B
        tv = 0.5 * np.abs(emp - joint).sum()
        assert tv < 0.08, f"TV distance {tv:.4f} (sampling noise ≈ 0.035)"
        assert 0.0 <= stats["accept_rate"] <= 1.0


class TestEngineSpeculative:
    def test_greedy_matches_offline_under_coscheduling(self):
        params, cfg = make_model()
        rng = np.random.default_rng(4)
        prompts = [
            [1] + [int(t) for t in rng.integers(4, 68, n)]
            for n in (5, 11, 17, 3, 24)
        ]
        table = fit_bigram_table(rng.integers(0, 68, 4000), 68)
        eng = ServingEngine(
            params, cfg, slots=2, steps_per_sync=3,
            speculative_k=3, draft_table=table)
        n_new = 12
        rids = [eng.submit(p, n_new) for p in prompts]
        results = eng.run()
        for rid, p in zip(rids, prompts):
            expect = np.asarray(generate_tokens(
                params, cfg, jnp.asarray([p], jnp.int32), n_new,
                jax.random.PRNGKey(9), 0.0))[0]
            assert results[rid].tokens == [int(t) for t in expect]
            assert results[rid].finish_reason == "length"
        stats = eng.stats()
        assert stats["speculative_k"] == 3
        assert 0.0 <= stats["speculative_accept_rate"] <= 1.0
        assert 1.0 <= stats["speculative_tokens_per_round"] <= 4.0

    def test_stop_ids_and_budget(self):
        params, cfg = make_model()
        rng = np.random.default_rng(5)
        table = fit_bigram_table(rng.integers(0, 68, 4000), 68)
        eng = ServingEngine(
            params, cfg, slots=2, steps_per_sync=4,
            speculative_k=2, draft_table=table)
        prompt = [1] + [int(t) for t in rng.integers(4, 68, 6)]
        probe = np.asarray(generate_tokens(
            params, cfg, jnp.asarray([prompt], jnp.int32), 20,
            jax.random.PRNGKey(9), 0.0))[0]
        stop = int(probe[7])  # stop id taken from inside the greedy stream
        rid = eng.submit(prompt, 20, stop_ids=(stop,))
        res = eng.run()[rid]
        assert res.finish_reason == "stop"
        # tokens match the offline greedy stream through its FIRST stop hit
        # (speculative overshoot past the stop must be discarded)
        first = [int(t) for t in probe].index(stop)
        assert res.tokens == [int(t) for t in probe[: first + 1]]

    def test_allowed_mask_restricts_sampled_tokens(self):
        params, cfg = make_model()
        rng = np.random.default_rng(6)
        allowed = list(range(4, 68))
        table = fit_bigram_table(rng.integers(0, 68, 4000), 68)
        eng = ServingEngine(
            params, cfg, slots=2, steps_per_sync=3,
            allowed_ids=allowed, speculative_k=3, draft_table=table)
        rid = eng.submit(
            [1] + [int(t) for t in rng.integers(4, 68, 5)], 15,
            temperature=1.0, top_k=12)
        res = eng.run()[rid]
        assert len(res.tokens) == 15
        assert all(t in set(allowed) for t in res.tokens)

    def test_greedy_unaffected_by_sampled_neighbors(self):
        """A greedy request co-scheduled with temperature-sampled slots in
        the same speculative chunks must emit exactly its solo greedy
        stream — per-slot sampling transforms and acceptance must never
        leak across batch rows."""
        params, cfg = make_model(use_rope=True)
        rng = np.random.default_rng(13)
        table = fit_bigram_table(rng.integers(0, 68, 4000), 68)
        probe = [1] + [int(t) for t in rng.integers(4, 68, 7)]
        expect = np.asarray(generate_tokens(
            params, cfg, jnp.asarray([probe], jnp.int32), 10,
            jax.random.PRNGKey(9), 0.0))[0]

        eng = ServingEngine(params, cfg, slots=3, steps_per_sync=3,
                            speculative_k=3, draft_table=table)
        rid = eng.submit(probe, 10)  # greedy
        for n in (5, 12):
            eng.submit([1] + [int(t) for t in rng.integers(4, 68, n)], 9,
                       temperature=1.1, top_k=8)
        res = eng.run()
        assert res[rid].tokens == [int(t) for t in expect]

    def test_filtered_slots_still_accept_with_fitted_draft(self):
        """Per-slot top-k/top-p filters must not collapse acceptance.

        The draft rows pass through each slot's own sampling chain
        (``speculative.py`` draft_body), so a draft fitted to the model's
        conditionals keeps a nonzero accept rate even when every active
        request uses an aggressive filter — previously drafts were drawn
        from the raw table and anything outside the target's nucleus was
        always rejected. Output exactness is asserted alongside (greedy
        rows must still match the plain generate_tokens stream)."""
        params, cfg = make_model()
        rng = np.random.default_rng(21)
        prompts = [
            [1] + [int(t) for t in rng.integers(4, 68, n)]
            for n in (7, 12, 9)
        ]
        # fit the draft to the model's own greedy continuations
        streams = []
        for p in prompts:
            toks = np.asarray(generate_tokens(
                params, cfg, jnp.asarray([p], jnp.int32), 16,
                jax.random.PRNGKey(3), 0.0))[0]
            streams.append(np.concatenate([np.asarray(p), toks]))
        table = fit_bigram_table(streams, 68, alpha=0.01)

        eng = ServingEngine(params, cfg, slots=2, steps_per_sync=3,
                            speculative_k=3, draft_table=table,
                            warm_spec_filters=True)
        # greedy rows under top_k=1 (the most aggressive filter) — the
        # use_filters path is pinned on by warm_spec_filters
        rids = [eng.submit(p, 10, temperature=0.0, top_k=1)
                for p in prompts]
        res = eng.run()
        for rid, p in zip(rids, prompts):
            expect = np.asarray(generate_tokens(
                params, cfg, jnp.asarray([p], jnp.int32), 10,
                jax.random.PRNGKey(9), 0.0))[0]
            assert res[rid].tokens == [int(t) for t in expect]
        rate = eng.stats()["speculative_accept_rate"]
        assert rate > 0.0, f"fitted draft under top_k=1 accepted nothing ({rate})"

    @pytest.mark.parametrize("kv_quant", [False, True])
    def test_tensor_parallel_matches_single_device(self, kv_quant):
        """Speculative serving over a ('model',) mesh (GSPMD-partitioned
        einsum verify) must emit exactly the meshless engine's greedy
        tokens."""
        from genomics_lm_tpu.parallel.mesh import MODEL_AXIS, make_mesh

        params, cfg = make_model()
        rng = np.random.default_rng(12)
        reqs = [([1] + [int(t) for t in rng.integers(4, 68, n)], b)
                for n, b in [(8, 10), (14, 6), (5, 12)]]
        table = fit_bigram_table(rng.integers(0, 68, 4000), 68)

        def drain(mesh):
            eng = ServingEngine(params, cfg, slots=2, steps_per_sync=3,
                                kv_quant=kv_quant, mesh=mesh,
                                speculative_k=3, draft_table=table)
            rids = [eng.submit(p, b) for p, b in reqs]
            res = eng.run()
            return [res[r].tokens for r in rids]

        mesh = make_mesh(2, axes={MODEL_AXIS: 2})
        assert drain(mesh) == drain(None)

    def test_requires_draft_table(self):
        params, cfg = make_model()
        with pytest.raises(ValueError, match="draft_table"):
            ServingEngine(params, cfg, slots=2, speculative_k=2)


class TestBenchmarkCLIs:
    """The --speculative benchmark modes run end-to-end on tiny shapes."""

    def _run(self, script, *args):
        import subprocess, sys
        from pathlib import Path

        repo = Path(__file__).resolve().parent.parent
        return subprocess.run(
            [sys.executable, str(repo / "scripts" / script), *args],
            capture_output=True, text=True, timeout=500,
            env={"PATH": "/usr/bin:/bin", "HOME": "/root",
                 "JAX_PLATFORMS": "cpu", "PYTHONPATH": str(repo)},
        )

    def test_benchmark_decode_speculative(self):
        import json

        proc = self._run(
            "benchmark_decode.py", "--n_layer", "1", "--n_head", "2",
            "--n_embd", "32", "--block_size", "64", "--batch_size", "4",
            "--prefill_len", "8", "--decode_tokens", "6",
            "--measure_rounds", "1", "--speculative", "2",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        report = json.loads(proc.stdout.strip().splitlines()[-1])
        assert report["speculative_k"] == 2
        assert 0.0 <= report["accept_rate"] <= 1.0
        assert report["tokens_per_round"] >= 1.0

    def test_benchmark_speculative_trained(self):
        """The train-then-measure benchmark runs end-to-end on tiny shapes."""
        import json

        proc = self._run(
            "benchmark_speculative.py", "--n_layer", "1", "--n_head", "2",
            "--n_embd", "32", "--block_size", "32", "--train_windows", "48",
            "--epochs", "2", "--batch_size", "4", "--prefill_len", "8",
            "--decode_tokens", "10", "--measure_rounds", "1",
            "--n_draft", "2", "--serving_requests", "6",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        report = json.loads(proc.stdout.strip().splitlines()[-1])
        assert report["offline_plain_tok_per_sec"] > 0
        assert report["serving_speculative_tok_per_sec"] > 0
        assert 0.0 <= report["accept_rate"] <= 1.0

    def test_benchmark_serving_speculative(self):
        import json

        proc = self._run(
            "benchmark_serving.py", "--n_layer", "1", "--n_head", "2",
            "--n_embd", "32", "--block_size", "64", "--slots", "2",
            "--max_seq_len", "48", "--requests", "3",
            "--prompt_len_min", "4", "--prompt_len_max", "8",
            "--new_tokens_min", "4", "--new_tokens_max", "6",
            "--steps_per_sync", "3", "--speculative", "2",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        report = json.loads(proc.stdout.strip().splitlines()[-1])
        assert report["delivered_tokens"] > 0
        assert report["speculative_k"] == 2


class TestDraftTables:
    def test_fit_bigram_rows_normalized(self):
        t = fit_bigram_table([np.array([1, 2, 3, 2, 1])], 5, alpha=0.1)
        np.testing.assert_allclose(t.sum(1), 1.0, atol=1e-6)
        assert t[2, 1] > t[2, 0]  # observed transition outweighs smoothing

    def test_restrict_table(self):
        t = fit_bigram_table(np.arange(10) % 5, 5)
        allowed = np.array([False, True, True, False, True])
        r = restrict_table(t, allowed)
        np.testing.assert_allclose(r.sum(1), 1.0, atol=1e-6)
        assert (r[:, ~allowed] == 0).all()
