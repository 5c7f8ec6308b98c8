#!/usr/bin/env python3
"""Honest speculative-decoding benchmark: train, then measure.

Speculative decoding's win is proportional to how well the cheap draft
(a bigram table) predicts the target model — which for RANDOM weights is
near zero (an untrained transformer's conditionals depend on the whole
random context), so ``benchmark_decode.py --speculative`` on random
weights dramatically UNDERSTATES the real win. Real codon LMs are highly
bigram-predictable (the reference's trigram baseline is within ~4% PPL
of the trained model, ``docs/PERPLEXITY_BASELINES.md``), so this
benchmark measures the deployment-shaped scenario end to end:

  1. synthesize a first-order-Markov codon corpus (the learnable
     structure bacterial CDS actually have at codon order ~1);
  2. train the benchmark model on it (briefly — enough to learn the
     chain, exactly like ``tests/test_learning_dynamics.py``);
  3. fit the bigram draft table on the TRAINING tokens (what a
     deployment fits on its corpus);
  4. measure BOTH decode protocols on the trained weights:
     (a) serving — ``ServingEngine`` drain with and without speculation
         (the production path: speculation rides the same ragged verify
         machinery the engine already pays for, so the round premium is
         small and acceptance converts ~1:1 into delivered tok/s);
     (b) offline — ``generate_tokens`` vs ``generate_tokens_speculative``
         (the scalar-length scan decode is cheaper per step than any
         ragged path, so offline speculation needs higher acceptance to
         pay off; reported for honesty).

Prints one JSON line with all four throughputs, the acceptance rate,
and both speedups.
"""

from __future__ import annotations

import argparse
import json
import sys as _sys
import time
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def markov_windows(n, T, seed, concentration=0.5, vocab=64, offset=4):
    """Windows from a sparse random bigram chain over codon ids 4..67
    (the generator from tests/test_learning_dynamics.py)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    trans = np.full((vocab, vocab), 1e-3)
    for i in range(vocab):
        successors = rng.choice(vocab, 4, replace=False)
        trans[i, successors] = rng.dirichlet(np.ones(4) * concentration) * 10
    trans /= trans.sum(axis=1, keepdims=True)
    X = np.zeros((n, T), np.int32)
    state = rng.integers(0, vocab, n)
    for t in range(T):
        X[:, t] = state + offset
        cum = trans[state].cumsum(axis=1)
        u = rng.random((n, 1))
        state = (u > cum).sum(axis=1)
    Y = np.roll(X, -1, axis=1)
    Y[:, -1] = 0
    return X, Y


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_layer", type=int, default=4)
    ap.add_argument("--n_head", type=int, default=4)
    ap.add_argument("--n_embd", type=int, default=256)
    ap.add_argument("--block_size", type=int, default=256)
    ap.add_argument("--train_windows", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--prefill_len", type=int, default=64)
    ap.add_argument("--decode_tokens", type=int, default=128)
    ap.add_argument("--n_draft", type=int, default=4)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--kv_quant", action="store_true")
    ap.add_argument("--measure_rounds", type=int, default=3)
    ap.add_argument("--rounds_per_sync", type=int, default=16)
    ap.add_argument("--serving_requests", type=int, default=256,
                    help="requests per serving drain (0 skips the serving "
                         "comparison)")
    ap.add_argument("--arrival_rate", type=float, default=0.0,
                    help="also run the open-loop Poisson latency protocol "
                         "(req/s) with and without speculation, reporting "
                         "TTFT/ITL percentiles for both")
    ap.add_argument("--steps_per_sync", type=int, default=16,
                    help="decode rounds per dispatched serving chunk (longer "
                         "chunks amortize the relay round trip)")
    ap.add_argument("--repeats", type=int, default=5,
                    help="median-of-N serving drains (drain absolutes swing "
                         "+-20%% on the relayed runtime)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from genomics_lm_tpu.generation.decode import generate_tokens
    from genomics_lm_tpu.serving.speculative import fit_bigram_table
    from genomics_lm_tpu.tokenizers.codon import write_itos
    from genomics_lm_tpu.training.loop import run_training

    on_tpu = jax.default_backend() == "tpu"
    T = args.block_size
    X, Y = markov_windows(args.train_windows + 64, T, args.seed)
    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        np.savez(tmp / "train.npz", X=X[: args.train_windows],
                 Y=Y[: args.train_windows])
        np.savez(tmp / "val.npz", X=X[args.train_windows:],
                 Y=Y[args.train_windows:])
        write_itos(tmp / "itos.txt")
        cfg_d = dict(
            train_npz=str(tmp / "train.npz"), val_npz=str(tmp / "val.npz"),
            block_size=T, n_layer=args.n_layer, n_head=args.n_head,
            n_embd=args.n_embd, dropout=0.0, batch_size=16,
            grad_accum_steps=1, lr=3e-3, min_lr=3e-4, warmup_steps=20,
            epochs=args.epochs, seed=1337, run_id="spec-bench",
            early_stop_patience=0,
            compute_dtype="bfloat16" if on_tpu else "float32",
            attention_impl="flash" if on_tpu else "xla",
        )
        t_train0 = time.perf_counter()
        meta = run_training(cfg_d, run_root=str(tmp / "runs"))
        train_sec = time.perf_counter() - t_train0
        assert meta["status"] == "completed", meta

        from genomics_lm_tpu.evals.playground import load_codon_model

        params, cfg, _, _ = load_codon_model(tmp / "runs" / "spec-bench")
        cfg = cfg.replace(dropout=0.0, fused_qkv=on_tpu)

    table = fit_bigram_table(X[: args.train_windows], cfg.vocab_size)
    # prompts drawn from held-out chain windows (in-domain, like serving
    # a trained model on real sequences)
    prompts = X[args.train_windows:args.train_windows + args.batch_size,
                : args.prefill_len].astype(np.int32)
    prompts_j = jnp.asarray(prompts)

    def run_plain(key):
        return generate_tokens(params, cfg, prompts_j, args.decode_tokens,
                               key, args.temperature, args.kv_quant)

    out = run_plain(jax.random.PRNGKey(1))
    float(jnp.sum(out).astype(jnp.float32))  # compile + hard sync
    t0 = time.perf_counter()
    for i in range(args.measure_rounds):
        out = run_plain(jax.random.PRNGKey(2 + i))
    float(jnp.sum(out).astype(jnp.float32))
    plain_sec = time.perf_counter() - t0
    generated = args.batch_size * args.decode_tokens * args.measure_rounds
    plain_tps = generated / plain_sec

    # time the jitted whole-generation program directly so the timed loop
    # stays async like the plain loop (speculative_generate fetches its
    # stats per call, which would serialize dispatch + D2H per run and
    # bias the comparison on relayed runtimes)
    from genomics_lm_tpu.serving.speculative import generate_tokens_speculative

    table_dev = jnp.asarray(table, jnp.float32)

    def run_spec(key):
        return generate_tokens_speculative(
            params, cfg, prompts_j, args.decode_tokens, key, table_dev,
            args.n_draft, args.temperature, args.kv_quant)

    out = run_spec(jax.random.PRNGKey(11))
    float(jnp.sum(out[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for i in range(args.measure_rounds):
        out = run_spec(jax.random.PRNGKey(12 + i))
    float(jnp.sum(out[0]).astype(jnp.float32))
    spec_sec = time.perf_counter() - t0
    spec_tps = generated / spec_sec
    row_rounds, emitted = int(out[1]), int(out[2])
    stats = {
        "accept_rate": (emitted - row_rounds) / max(1, row_rounds * args.n_draft),
        "tokens_per_round": emitted / max(1, row_rounds),
    }

    serving = {}
    if args.serving_requests > 0:
        from genomics_lm_tpu.serving import ServingEngine

        n_req = int(args.serving_requests)
        hold = prompts  # held-out prompts, reused round-robin

        def mk_engine(spec: bool) -> "ServingEngine":
            # ONE construction site: the drain and latency protocols must
            # measure identical engines
            kw = (dict(speculative_k=args.n_draft, draft_table=table)
                  if spec else {})
            return ServingEngine(
                params, cfg, slots=args.batch_size,
                max_seq_len=args.prefill_len + args.decode_tokens,
                kv_quant=args.kv_quant, steps_per_sync=args.steps_per_sync,
                seed=7, **kw)

        def drain(spec: bool) -> float:
            def once(n):
                eng = mk_engine(spec)
                for i in range(n):
                    eng.submit([int(t) for t in hold[i % len(hold)]],
                               args.decode_tokens,
                               temperature=args.temperature)
                t0 = time.perf_counter()
                results = eng.run()
                delivered = sum(len(r.tokens) for r in results.values())
                return delivered / (time.perf_counter() - t0)

            once(args.batch_size)  # compile + warm
            # median-of-N with dispersion: drain absolutes are
            # chunk-round-trip bound and swing +-20% run to run
            return sorted(once(n_req) for _ in range(max(1, args.repeats)))

        def spread(xs):
            med = float(np.median(xs))
            return round(100.0 * (xs[-1] - xs[0]) / med, 1) if med else 0.0

        plain = drain(False)
        spec_s = drain(True)
        serving["serving_plain_tok_per_sec"] = round(float(np.median(plain)), 1)
        serving["serving_plain_samples"] = [round(x, 1) for x in plain]
        serving["serving_plain_spread_pct"] = spread(plain)
        serving["serving_speculative_tok_per_sec"] = round(
            float(np.median(spec_s)), 1)
        serving["serving_speculative_samples"] = [round(x, 1) for x in spec_s]
        serving["serving_speculative_spread_pct"] = spread(spec_s)
        serving["speedup_serving"] = round(
            serving["serving_speculative_tok_per_sec"]
            / serving["serving_plain_tok_per_sec"], 3)

        if args.arrival_rate > 0:
            from scripts._shared import poisson_latency_drain

            def latency(spec: bool) -> dict:
                reqs = [([int(t) for t in hold[i % len(hold)]],
                         args.decode_tokens, args.temperature)
                        for i in range(n_req)]
                # compile + warm
                warm = mk_engine(spec)
                for p, b, tt in reqs[: args.batch_size]:
                    warm.submit(p, b, temperature=tt)
                warm.run()
                ttft, itl, _, _ = poisson_latency_drain(
                    mk_engine(spec), reqs, args.arrival_rate, seed=args.seed)
                pct = lambda xs, q: round(
                    float(np.percentile(xs, q)) * 1e3, 1)
                return {"ttft_p50_ms": pct(ttft, 50),
                        "ttft_p99_ms": pct(ttft, 99),
                        "itl_p50_ms": pct(itl, 50),
                        "itl_p95_ms": pct(itl, 95)}

            serving["latency_plain"] = latency(False)
            serving["latency_speculative"] = latency(True)
            serving["arrival_rate_req_per_sec"] = args.arrival_rate

    report = {
        "metric": "speculative_decode_tokens_per_sec_per_chip",
        "value": serving.get("serving_speculative_tok_per_sec",
                             round(spec_tps, 1)),
        "unit": "tokens/sec",
        **serving,
        "offline_speculative_tok_per_sec": round(spec_tps, 1),
        "offline_plain_tok_per_sec": round(plain_tps, 1),
        "speedup_offline": round(spec_tps / plain_tps, 3),
        "accept_rate": round(stats.get("accept_rate", 0.0), 4),
        "tokens_per_round": round(stats.get("tokens_per_round", 0.0), 3),
        "n_draft": args.n_draft,
        "batch_size": args.batch_size,
        "decode_tokens": args.decode_tokens,
        "temperature": args.temperature,
        "kv_quant": bool(args.kv_quant),
        "model": f"{args.n_layer}L{args.n_head}H d{args.n_embd} (trained "
                 f"{args.epochs} epochs, {round(train_sec, 1)}s, "
                 f"val_loss {round(meta.get('best_val_loss', -1), 3)})",
    }
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
