#!/usr/bin/env python3
"""Serving-side decode throughput: batched KV-cache autoregressive
generation (prefill + jitted per-token steps with greedy/temperature
sampling on device). Complements bench.py's training number."""

from __future__ import annotations

import argparse
import json
import sys as _sys
import time
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_layer", type=int, default=10)
    ap.add_argument("--n_head", type=int, default=8)
    ap.add_argument("--n_embd", type=int, default=384)
    ap.add_argument("--block_size", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--prefill_len", type=int, default=64)
    ap.add_argument("--decode_tokens", type=int, default=128)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--measure_rounds", type=int, default=3)
    ap.add_argument("--mode", choices=["stepwise", "scan"], default="scan",
                    help="scan = whole generation compiled into one program")
    ap.add_argument("--donate_cache", action="store_true",
                    help="stepwise mode: donate the cache buffers so XLA "
                         "updates them in place (no per-step full-cache copy)")
    ap.add_argument("--int8_weights", action="store_true",
                    help="weight-only int8 block linears (ops/quant.py)")
    ap.add_argument("--kv_quant", action="store_true",
                    help="int8 KV cache with per-vector scales")
    ap.add_argument("--attention_impl", choices=["xla", "flash"], default=None,
                    help="decode attention path: fused Pallas kernel "
                         "('flash', TPU default) or einsum ('xla')")
    ap.add_argument("--speculative", type=int, default=0, metavar="K",
                    help="speculative decoding with K bigram-drafted tokens "
                         "per verify round (serving/speculative.py); the "
                         "draft table is fitted to a stream sampled from "
                         "the model itself")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from genomics_lm_tpu.generation.decode import (
        decode_step,
        decode_step_donated,
        prefill,
    )
    from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt

    on_tpu = jax.default_backend() == "tpu"
    cfg = CodonGPTConfig(
        vocab_size=68, block_size=args.block_size, n_layer=args.n_layer,
        n_head=args.n_head, n_embd=args.n_embd, dropout=0.0, sep_id=3,
        compute_dtype="bfloat16" if on_tpu else "float32",
        fused_qkv=on_tpu,
        attention_impl=args.attention_impl or ("flash" if on_tpu else "xla"),
    )
    params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
    if args.int8_weights:
        from genomics_lm_tpu.ops.quant import quantize_params

        params = quantize_params(params)
    rng = np.random.default_rng(0)
    B, P = args.batch_size, args.prefill_len
    prompt = jnp.asarray(rng.integers(4, 68, (B, P)), jnp.int32)

    @jax.jit
    def sample(logits, key):
        if args.temperature <= 0:
            return jnp.argmax(logits, -1).astype(jnp.int32)
        return jax.random.categorical(
            key, logits.astype(jnp.float32) / args.temperature, axis=-1
        ).astype(jnp.int32)

    spec_stats: dict = {}
    if args.speculative and args.mode != "scan":
        raise SystemExit("--speculative implies its own whole-program path; "
                         "it cannot combine with --mode stepwise")
    if args.speculative:
        from genomics_lm_tpu.generation.decode import generate_tokens
        from genomics_lm_tpu.serving.speculative import (
            fit_bigram_table,
            generate_tokens_speculative,
        )

        # draft table fitted to a stream sampled from the model — the
        # deployment analog is fitting on the training corpus' bigram
        # counts (the reference's Markov-baseline statistics); random
        # bench weights have no corpus, so self-sampled tokens stand in
        stream = np.asarray(generate_tokens(
            params, cfg, prompt[: min(8, B)],
            min(256, args.block_size - P), jax.random.PRNGKey(42),
            1.0, args.kv_quant))
        table_dev = jnp.asarray(
            fit_bigram_table([row for row in stream], cfg.vocab_size),
            jnp.float32)

        # time the jitted whole-generation program directly so the timed
        # loop stays as async as the plain scan path; acceptance stats
        # are fetched ONCE from the final round outside the timed loop
        # (speculative_generate's per-call int()/np.asarray fetches would
        # serialize dispatch + D2H per run and understate speculation on
        # relayed runtimes — same discipline as benchmark_speculative.py)
        def run_once(key):
            toks, row_rounds, emitted = generate_tokens_speculative(
                params, cfg, prompt, args.decode_tokens, key, table_dev,
                args.speculative, args.temperature, args.kv_quant)
            spec_stats["_last"] = (row_rounds, emitted)
            return toks
    elif args.mode == "scan":
        from genomics_lm_tpu.generation.decode import generate_tokens

        def run_once(key):
            return generate_tokens(params, cfg, prompt, args.decode_tokens,
                                   key, args.temperature, args.kv_quant)
    else:
        step_fn = decode_step_donated if args.donate_cache else decode_step

        def run_once(key):
            logits, cache, _ = prefill(params, cfg, prompt, None, args.kv_quant)
            for _ in range(args.decode_tokens):
                key, sub = jax.random.split(key)
                token = sample(logits, sub)
                logits, cache, _ = step_fn(params, cfg, cache, token)
            return logits

    # compile + warm
    out = run_once(jax.random.PRNGKey(1))
    float(jnp.sum(out).astype(jnp.float32))  # hard sync

    t0 = time.perf_counter()
    for round_idx in range(args.measure_rounds):
        out = run_once(jax.random.PRNGKey(2 + round_idx))
    float(jnp.sum(out).astype(jnp.float32))
    elapsed = time.perf_counter() - t0

    if args.speculative and "_last" in spec_stats:
        row_rounds, emitted = (int(v) for v in spec_stats.pop("_last"))
        spec_stats["accept_rate"] = (
            (emitted - row_rounds) / max(1, row_rounds * args.speculative))
        spec_stats["tokens_per_round"] = emitted / max(1, row_rounds)

    generated = B * args.decode_tokens * args.measure_rounds
    report = {
        "metric": "decode_codon_tokens_per_sec_per_chip",
        "value": round(generated / elapsed, 1),
        "unit": "tokens/sec",
        "batch_size": B,
        "prefill_len": P,
        "decode_tokens": args.decode_tokens,
        "ms_per_decode_step": round(
            elapsed / (args.decode_tokens * args.measure_rounds) * 1000, 3
        ),
        "mode": "speculative" if args.speculative else args.mode,
        "model": f"{args.n_layer}L{args.n_head}H d{args.n_embd}",
        "int8_weights": bool(args.int8_weights),
        "kv_quant": bool(args.kv_quant),
        "attention_impl": cfg.attention_impl,
    }
    if args.speculative:
        report["speculative_k"] = args.speculative
        report["accept_rate"] = round(spec_stats.get("accept_rate", 0.0), 4)
        report["tokens_per_round"] = round(
            spec_stats.get("tokens_per_round", 0.0), 3)
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
