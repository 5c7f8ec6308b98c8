"""Continuous-batching serving engine: correctness under co-scheduling.

The contract under test: scheduling must never change the numbers. A
greedy request served through the ragged batched engine — admitted late,
sharing its chunk with other requests at other positions, retired
mid-chunk — must emit exactly the tokens that ``generate_tokens`` (the
offline single-dispatch path, itself parity-tested against the uncached
reference semantics) produces for its prompt alone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt
from genomics_lm_tpu.generation.decode import generate_tokens
from genomics_lm_tpu.serving.engine import ServingEngine, init_serving_state


def make_model(**over):
    kw = dict(
        vocab_size=68, block_size=96, n_layer=2, n_head=4, n_embd=64,
        dropout=0.0, sep_id=3,
    )
    kw.update(over)
    cfg = CodonGPTConfig(**kw)
    params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
    return params, cfg


def offline_greedy(params, cfg, prompt, n, kv_quant=False):
    toks = generate_tokens(
        params, cfg, jnp.asarray([prompt], jnp.int32), n,
        jax.random.PRNGKey(9), 0.0, kv_quant,
    )
    return [int(t) for t in np.asarray(toks[0])]


class TestServingEngine:
    def test_greedy_matches_offline_generation(self):
        params, cfg = make_model()
        rng = np.random.default_rng(0)
        prompts = [
            [1] + [int(t) for t in rng.integers(4, 68, n)]
            for n in (5, 11, 17, 3, 24)
        ]
        n_new = 12
        eng = ServingEngine(params, cfg, slots=2, steps_per_sync=4)
        rids = [eng.submit(p, n_new) for p in prompts]
        results = eng.run()
        for rid, p in zip(rids, prompts):
            expect = offline_greedy(params, cfg, p, n_new)
            assert results[rid].tokens == expect, f"prompt len {len(p)}"
            assert results[rid].finish_reason == "length"

    def test_greedy_independent_of_co_scheduling(self):
        """Same request alone vs packed with others: identical output."""
        params, cfg = make_model(use_rope=True, use_swiglu=True)
        rng = np.random.default_rng(1)
        probe = [1] + [int(t) for t in rng.integers(4, 68, 9)]
        others = [
            [1] + [int(t) for t in rng.integers(4, 68, n)] for n in (20, 7, 13)
        ]
        alone = ServingEngine(params, cfg, slots=4, steps_per_sync=5)
        rid = alone.submit(probe, 10)
        alone_tokens = alone.run()[rid].tokens

        packed = ServingEngine(params, cfg, slots=2, steps_per_sync=5)
        for o in others[:2]:
            packed.submit(o, 15)
        rid2 = packed.submit(probe, 10)  # admitted only when a slot frees
        packed.submit(others[2], 6)
        assert packed.run()[rid2].tokens == alone_tokens

    def test_cancel_pending_and_inflight(self):
        params, cfg = make_model()
        rng = np.random.default_rng(9)
        eng = ServingEngine(params, cfg, slots=2, steps_per_sync=4)
        mk = lambda n: [1] + [int(t) for t in rng.integers(4, 68, n)]
        r1 = eng.submit(mk(6), 20)
        r2 = eng.submit(mk(6), 20)
        r3 = eng.submit(mk(6), 20)  # stays pending (2 slots)
        eng.step()  # admits r1, r2; decodes one chunk
        assert eng.cancel(r3)  # pending cancel
        assert eng.cancel(r1)  # in-flight cancel frees the slot
        assert not eng.cancel(r1)  # already cancelled
        assert not eng.cancel(999)
        res = eng.run()
        assert res[r1].finish_reason == "cancelled"
        assert res[r3].finish_reason == "cancelled" and res[r3].tokens == []
        assert res[r2].finish_reason == "length" and len(res[r2].tokens) == 20
        st = eng.stats()
        assert st["active"] == 0 and st["pending"] == 0 and st["completed"] == 3

    @pytest.mark.parametrize("impl", ["xla", "flash"])
    @pytest.mark.parametrize("kv_quant", [False, True])
    def test_tensor_parallel_engine_matches_single_device(self, kv_quant, impl):
        """Megatron head-split serving over a ('model',) mesh must emit
        exactly the single-device engine's greedy tokens. The einsum path
        is partitioned by GSPMD; the flash path runs the Pallas kernel per
        shard through shard_map (_tp_decode_attention) — both must agree
        with the meshless engine bit for bit."""
        from genomics_lm_tpu.parallel.mesh import MODEL_AXIS, make_mesh

        params, cfg = make_model(attention_impl=impl)
        rng = np.random.default_rng(11)
        reqs = [([1] + [int(t) for t in rng.integers(4, 68, n)], b)
                for n, b in [(8, 10), (14, 6), (5, 12)]]

        def drain(mesh):
            eng = ServingEngine(params, cfg, slots=2, steps_per_sync=4,
                                kv_quant=kv_quant, mesh=mesh)
            rids = [eng.submit(p, b) for p, b in reqs]
            res = eng.run()
            return [res[r].tokens for r in rids]

        mesh = make_mesh(2, axes={MODEL_AXIS: 2})
        assert drain(mesh) == drain(None)

    def test_pipelined_drain_matches_sync(self):
        """pipelined=True (chunks in flight, late retirement) must
        deliver identical per-request tokens to the synchronous drain at
        EVERY pipeline depth, including through slot reuse under queue
        pressure."""
        params, cfg = make_model()
        rng = np.random.default_rng(6)
        reqs = [([1] + [int(t) for t in rng.integers(4, 68, n)], b)
                for n, b in [(6, 8), (12, 5), (4, 14), (9, 7), (15, 4), (5, 11)]]

        def drain(pipelined, depth=1):
            eng = ServingEngine(params, cfg, slots=2, steps_per_sync=4,
                                pipeline_depth=depth)
            rids = [eng.submit(p, b) for p, b in reqs]
            res = eng.run(pipelined=pipelined)
            return [res[r].tokens for r in rids]

        sync = drain(False)
        assert drain(True) == sync
        assert drain(True, depth=2) == sync
        assert drain(True, depth=3) == sync

    @pytest.mark.parametrize("pipelined", [False, True])
    def test_stream_yields_incremental_deltas(self, pipelined):
        """stream() events concatenate to the final tokens, arrive over
        multiple chunks, and carry the finish_reason on the last event."""
        params, cfg = make_model()
        rng = np.random.default_rng(3)
        eng = ServingEngine(params, cfg, slots=2, steps_per_sync=4)
        rids = [eng.submit([1] + [int(t) for t in rng.integers(4, 68, 6)], 13)
                for _ in range(3)]
        deltas: dict[int, list[int]] = {r: [] for r in rids}
        finishes: dict[int, list[str]] = {r: [] for r in rids}
        for rid, toks, reason in eng.stream(pipelined=pipelined):
            deltas[rid].extend(toks)
            finishes[rid].append(reason)
        for rid in rids:
            assert deltas[rid] == eng.results[rid].tokens
            assert len(finishes[rid]) >= 2  # 13 tokens over 4-step chunks
            assert all(r == "" for r in finishes[rid][:-1])
            assert finishes[rid][-1] in ("stop", "length")

    def test_stop_ids_retire_and_free_slot(self):
        params, cfg = make_model()
        prompt = [1, 10, 11, 12]
        full = offline_greedy(params, cfg, prompt, 16)
        stop = full[4]
        first = full.index(stop)  # untrained outputs may repeat early
        eng = ServingEngine(params, cfg, slots=1, steps_per_sync=3)
        rid_a = eng.submit(prompt, 16, stop_ids=(stop,))
        rid_b = eng.submit(prompt, 6)  # must reuse the freed slot
        results = eng.run()
        assert results[rid_a].finish_reason == "stop"
        assert results[rid_a].tokens == full[: first + 1]
        assert results[rid_b].tokens == full[:6]

    def test_slot_reuse_does_not_leak_state(self):
        """A long occupant then a short one: the short request's output
        must be unaffected by stale cache/segment content above its
        length."""
        params, cfg = make_model()
        rng = np.random.default_rng(2)
        long_p = [1] + [int(t) for t in rng.integers(4, 68, 30)]
        # include a <SEP> so stale segment ids are non-trivial
        long_p[10] = 3
        short_p = [1] + [int(t) for t in rng.integers(4, 68, 4)]
        eng = ServingEngine(params, cfg, slots=1, steps_per_sync=8)
        eng.submit(long_p, 20)
        rid = eng.submit(short_p, 8)
        out = eng.run()[rid].tokens
        assert out == offline_greedy(params, cfg, short_p, 8)

    def test_int8_kv_cache_path(self):
        params, cfg = make_model()
        rng = np.random.default_rng(3)
        prompts = [[1] + [int(t) for t in rng.integers(4, 68, n)] for n in (6, 14)]
        eng = ServingEngine(params, cfg, slots=2, steps_per_sync=4, kv_quant=True)
        rids = [eng.submit(p, 8) for p in prompts]
        results = eng.run()
        for rid, p in zip(rids, prompts):
            expect = offline_greedy(params, cfg, p, 8, kv_quant=True)
            assert results[rid].tokens == expect

    def test_allowed_mask_restricts_sampling(self):
        params, cfg = make_model()
        allowed = list(range(4, 68))  # CDS codons only
        eng = ServingEngine(
            params, cfg, slots=2, steps_per_sync=4, allowed_ids=allowed)
        rid = eng.submit([1, 20, 21], 10, temperature=1.3)
        out = eng.run()[rid].tokens
        assert len(out) == 10
        assert all(4 <= t < 68 for t in out)

    def test_per_slot_temperature(self):
        """Greedy and sampled requests co-scheduled: the greedy one stays
        deterministic."""
        params, cfg = make_model()
        prompt = [1, 30, 31, 32, 33]
        expect = offline_greedy(params, cfg, prompt, 8)
        eng = ServingEngine(params, cfg, slots=2, steps_per_sync=4, seed=7)
        rid_g = eng.submit(prompt, 8, temperature=0.0)
        rid_s = eng.submit(prompt, 8, temperature=2.0)
        results = eng.run()
        assert results[rid_g].tokens == expect
        assert len(results[rid_s].tokens) == 8

    def test_budget_validation(self):
        params, cfg = make_model()
        eng = ServingEngine(params, cfg, slots=1, max_seq_len=32)
        with pytest.raises(ValueError):
            eng.submit(list(range(4, 30)), 10)  # 26 + 10 > 32
        with pytest.raises(ValueError):
            ServingEngine(params, cfg, max_seq_len=128)  # > block_size

    def test_admit_many_routing(self):
        """Direct admit_many semantics: valid lanes install, invalid lanes
        are inert, untouched slots keep their state bit-for-bit."""
        from genomics_lm_tpu.serving.engine import admit_many

        params, cfg = make_model()
        st = init_serving_state(cfg, slots=4, cache_size=32, kv_quant=True)
        # pre-occupy slot 1 with sentinel state that must survive
        st["lengths"] = st["lengths"].at[1].set(7)
        st["active"] = st["active"].at[1].set(True)
        st["k"] = st["k"].at[:, 1].set(3)
        before_k_slot1 = np.asarray(st["k"][:, 1])

        rng = np.random.default_rng(0)
        N, P = 4, 16
        prompts = np.zeros((N, P), np.int32)
        prompts[0, :5] = rng.integers(4, 68, 5)
        prompts[2, :9] = rng.integers(4, 68, 9)
        lens = np.array([5, 1, 9, 1], np.int32)
        slot_idx = np.array([3, 0, 0, 0], np.int32)  # invalid lanes point anywhere
        valid = np.array([True, False, True, False])
        out = admit_many(params, cfg, st, jnp.asarray(slot_idx),
                         jnp.asarray(prompts), jnp.asarray(lens),
                         jnp.asarray(valid))
        # valid lanes landed
        assert int(out["lengths"][3]) == 5 and bool(out["active"][3])
        assert int(out["lengths"][0]) == 9 and bool(out["active"][0])
        # occupied slot untouched (including its cache rows)
        assert int(out["lengths"][1]) == 7 and bool(out["active"][1])
        np.testing.assert_array_equal(np.asarray(out["k"][:, 1]), before_k_slot1)
        # slot 2 never written
        assert int(out["lengths"][2]) == 0 and not bool(out["active"][2])
        # installed K prefix is the prefill K (exact int8 round-trip)
        from genomics_lm_tpu.generation.decode import prefill

        _, mini, _ = prefill(params, cfg, jnp.asarray(prompts), P, True,
                             jnp.maximum(jnp.asarray(lens) - 1, 0))
        np.testing.assert_array_equal(
            np.asarray(out["k"][:, 3, :P]), np.asarray(mini["k"][:, 0]))
        np.testing.assert_array_equal(
            np.asarray(out["k_scale"][:, 3, :, :P]),
            np.asarray(mini["k_scale"][:, 0]))

    def test_state_shapes(self):
        _, cfg = make_model()
        st = init_serving_state(cfg, slots=3, cache_size=64, kv_quant=True)
        assert st["k"].shape == (2, 3, 64, cfg.kv_heads * cfg.head_dim)
        assert st["k_scale"].shape == (2, 3, cfg.kv_heads, 64)
        assert st["lengths"].shape == (3,)
        assert not bool(st["active"].any())


class TestSchedulingFuzz:
    def test_random_workloads_match_offline(self):
        """Randomized mixed workloads: random prompt/budget/stop-id mixes,
        random slot counts and chunk sizes, pipelined or sync, with random
        mid-drain cancellations — every non-cancelled greedy request must
        emit exactly its offline prefix-truncated generation."""
        params, cfg = make_model()
        rng = np.random.default_rng(123)
        for trial in range(4):
            slots = int(rng.integers(1, 4))
            chunk = int(rng.integers(2, 7))
            n_req = int(rng.integers(3, 8))
            eng = ServingEngine(params, cfg, slots=slots, steps_per_sync=chunk)
            reqs = []
            for _ in range(n_req):
                p = [1] + [int(t) for t in rng.integers(4, 68, int(rng.integers(3, 20)))]
                budget = int(rng.integers(1, 18))
                stop = (int(rng.integers(4, 68)),) if rng.random() < 0.5 else ()
                rid = eng.submit(p, budget, stop_ids=stop)
                reqs.append((rid, p, budget, stop))
            cancel_rid = reqs[int(rng.integers(len(reqs)))][0] if rng.random() < 0.4 else None
            pipelined = bool(rng.random() < 0.5)
            seen = 0
            for ev in eng.stream(pipelined=pipelined):
                seen += 1
                if cancel_rid is not None and seen == 2:
                    eng.cancel(cancel_rid)
            res = eng.results
            for rid, p, budget, stop in reqs:
                if rid == cancel_rid:
                    continue
                offline = offline_greedy(params, cfg, p, budget)
                want = []
                for t in offline:
                    want.append(t)
                    if t in stop:
                        break
                assert res[rid].tokens == want, (trial, rid)
                assert res[rid].finish_reason in ("stop", "length")


class TestInferenceServer:
    def test_http_generate_stats_and_stream(self):
        """End-to-end HTTP: concurrent non-stream + stream requests through
        one engine; greedy output equals the offline path; bad requests 400."""
        import json as _json
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        from genomics_lm_tpu.serving.server import InferenceServer

        params, cfg = make_model()
        eng = ServingEngine(params, cfg, slots=2, steps_per_sync=4)
        srv = InferenceServer(eng, host="127.0.0.1", port=0)
        srv.start()
        host, port = srv.address
        base = f"http://{host}:{port}"
        try:
            def post(payload):
                req = urllib.request.Request(
                    base + "/generate", data=_json.dumps(payload).encode(),
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=120) as r:
                    return r.status, r.read()

            rng = np.random.default_rng(2)
            prompts = [[1] + [int(t) for t in rng.integers(4, 68, 6)]
                       for _ in range(3)]
            with ThreadPoolExecutor(4) as pool:
                futs = [pool.submit(post, {"prompt": p, "max_new_tokens": 8})
                        for p in prompts]
                sfut = pool.submit(post, {"prompt": prompts[0],
                                          "max_new_tokens": 8, "stream": True})
                results = [f.result() for f in futs]
                s_status, s_body = sfut.result()

            for (status, body), p in zip(results, prompts):
                assert status == 200
                out = _json.loads(body)
                assert out["finish_reason"] == "length"
                assert out["tokens"] == offline_greedy(params, cfg, p, 8)
            # streamed events concatenate to the same greedy output
            assert s_status == 200
            lines = [_json.loads(l) for l in s_body.splitlines() if l.strip()]
            streamed = [t for l in lines for t in l["tokens"]]
            assert streamed == offline_greedy(params, cfg, prompts[0], 8)
            assert lines[-1]["finish_reason"] == "length"

            # stats + health + error paths
            with urllib.request.urlopen(base + "/stats", timeout=30) as r:
                st = _json.loads(r.read())
            assert st["slots"] == 2 and st["completed"] == 4
            with urllib.request.urlopen(base + "/health", timeout=30) as r:
                assert _json.loads(r.read())["status"] == "ok"
            try:
                post({"max_new_tokens": 8})
                raise AssertionError("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
            # out-of-vocabulary / overflowing tokens must 400, not kill
            # the scheduler thread
            for bad in ([1099511627776, 1], [1, -3], [1, 9999]):
                try:
                    post({"prompt": bad, "max_new_tokens": 4})
                    raise AssertionError("expected 400")
                except urllib.error.HTTPError as e:
                    assert e.code == 400
            # the engine must still serve after the rejects
            status, _ = post({"prompt": prompts[1], "max_new_tokens": 4})
            assert status == 200
            # DNA in / DNA out
            status, body = post({"dna": "ATGGCT", "max_new_tokens": 4})
            out = _json.loads(body)
            assert status == 200 and len(out["tokens"]) == 4
        finally:
            srv.stop()


class TestBenchmarkCLIs:
    """The serving/decode benchmark scripts run end-to-end on tiny shapes."""

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

    def test_benchmark_serving_cli(self):
        import json

        proc = self._run(
            "benchmark_serving.py", "--n_layer", "1", "--n_head", "2",
            "--n_embd", "32", "--block_size", "64", "--slots", "2",
            "--max_seq_len", "48", "--requests", "3",
            "--prompt_len_min", "4", "--prompt_len_max", "8",
            "--new_tokens_min", "4", "--new_tokens_max", "6",
            "--steps_per_sync", "3",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        report = json.loads(proc.stdout.strip().splitlines()[-1])
        assert report["metric"] == "serving_delivered_tokens_per_sec_per_chip"
        assert report["delivered_tokens"] > 0

    def test_benchmark_serving_latency_protocol(self):
        import json

        proc = self._run(
            "benchmark_serving.py", "--n_layer", "1", "--n_head", "2",
            "--n_embd", "32", "--block_size", "64", "--slots", "2",
            "--max_seq_len", "48", "--requests", "4",
            "--prompt_len_min", "4", "--prompt_len_max", "8",
            "--new_tokens_min", "4", "--new_tokens_max", "6",
            "--steps_per_sync", "3", "--arrival_rate", "50",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        report = json.loads(proc.stdout.strip().splitlines()[-1])
        assert report["metric"] == "serving_latency_ms"
        assert report["ttft_p50_ms"] >= 0
        assert report["throughput_tok_per_sec"] > 0

    def test_benchmark_decode_cli(self):
        import json

        proc = self._run(
            "benchmark_decode.py", "--n_layer", "1", "--n_head", "2",
            "--n_embd", "32", "--block_size", "64", "--batch_size", "4",
            "--prefill_len", "8", "--decode_tokens", "6",
            "--measure_rounds", "1",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        report = json.loads(proc.stdout.strip().splitlines()[-1])
        assert report["metric"] == "decode_codon_tokens_per_sec_per_chip"


class TestTopKTopP:
    def test_filters_reduce_to_greedy_and_plain_sampling(self):
        """top_k=1 and tiny top_p must equal greedy; disabled filters must
        reproduce plain-temperature sampling token for token."""
        params, cfg = make_model()
        rng = np.random.default_rng(5)
        prompt = [1] + [int(t) for t in rng.integers(4, 68, 8)]

        def drain(**kw):
            eng = ServingEngine(params, cfg, slots=1, steps_per_sync=4, seed=3)
            rid = eng.submit(prompt, 12, **kw)
            return eng.run()[rid].tokens

        greedy = drain(temperature=0.0)
        assert drain(temperature=0.9, top_k=1) == greedy
        assert drain(temperature=0.9, top_p=1e-6) == greedy
        plain = drain(temperature=0.9)
        assert drain(temperature=0.9, top_k=cfg.vocab_size) == plain
        assert drain(temperature=0.9, top_p=1.0) == plain
        # a moderate top_k changes the draw but still decodes validly
        out = drain(temperature=0.9, top_k=5)
        assert len(out) == 12
