#!/usr/bin/env python3
"""Isolated decode-attention kernel microbenchmark.

Times ONLY the per-step attention chain (L layers of decode attention
against the packed-lane cache) for each implementation — the XLA einsum
path, the batch-blocked Pallas kernel (``decode_attention``), and the
DMA-streamed online-softmax kernel (``decode_attention_streamed``) — so
kernel work is attributed separately from the rest of the decode step
(QKV projections, MLP, sampling, dispatch). This is the measurement that
drives the kernel choice in ``generation/decode.py``; end-to-end numbers
come from ``benchmark_decode.py``.

Protocol: one jitted program per impl runs the whole L-layer chain and
reduces to a scalar; N async calls are timed with a single hard-sync
scalar fetch at the end (``jax.block_until_ready`` is a no-op on this
relayed runtime — docs/ARCHITECTURE.md).
"""

from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--kv_heads", type=int, default=None)
    ap.add_argument("--head_dim", type=int, default=48)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--cache_slots", type=int, default=256,
                    help="S — the horizon-bucketed cache length")
    ap.add_argument("--kv_quant", action="store_true")
    ap.add_argument("--impls", default="xla,blocked,streamed",
                    help="comma list of xla|blocked|streamed")
    ap.add_argument("--block_b", type=int, default=None,
                    help="override batch block (blocked + streamed)")
    ap.add_argument("--block_s", type=int, default=None,
                    help="override stream chunk (streamed only)")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=3,
                    help="median-of-N timed windows per impl")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from genomics_lm_tpu.ops.decode_attention import (
        decode_attention,
        decode_attention_streamed,
        decode_attention_xla,
    )
    from genomics_lm_tpu.ops.quant import quantize_kv

    on_tpu = jax.default_backend() == "tpu"
    L, B, S = args.n_layer, args.batch_size, args.cache_slots
    Hq, D = args.n_head, args.head_dim
    Hkv = args.kv_heads or Hq
    P = Hkv * D
    cache_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.float32)
    mask = np.zeros((B, S), np.float32)
    # realistic ragged validity: each row attends a random prefix
    lengths = rng.integers(S // 4, S, size=B)
    mask[np.arange(S)[None, :] >= lengths[:, None]] = -1e30
    mask = jnp.asarray(mask)

    if args.kv_quant:
        kh = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32)
        vh = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32)
        kq, ks = quantize_kv(kh)
        vq, vs = quantize_kv(vh)
        pack = lambda a: a.transpose(0, 1, 3, 2, 4).reshape(L, B, S, P)
        k_cache, v_cache = pack(kq), pack(vq)
        k_scale, v_scale = ks, vs
    else:
        k_cache = jnp.asarray(
            rng.normal(size=(L, B, S, P)), jnp.float32).astype(cache_dtype)
        v_cache = jnp.asarray(
            rng.normal(size=(L, B, S, P)), jnp.float32).astype(cache_dtype)
        k_scale = v_scale = None

    def chain(fn, q, k_cache, v_cache, mask, k_scale, v_scale):
        acc = jnp.float32(0.0)
        for layer in range(L):
            y = fn(q, k_cache, v_cache, mask, layer, k_scale, v_scale,
                   kv_heads=Hkv)
            acc = acc + jnp.sum(y)
        return acc

    impl_fns = {
        "xla": decode_attention_xla,
        "blocked": functools.partial(decode_attention, block_b=args.block_b),
        "streamed": functools.partial(
            decode_attention_streamed,
            block_b=args.block_b, block_s=args.block_s),
    }

    results = {}
    for name in args.impls.split(","):
        name = name.strip()
        fn = jax.jit(functools.partial(chain, impl_fns[name]))
        for _ in range(args.warmup):
            out = fn(q, k_cache, v_cache, mask, k_scale, v_scale)
        float(out)  # hard sync
        windows = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(q, k_cache, v_cache, mask, k_scale, v_scale)
            float(out)
            windows.append(time.perf_counter() - t0)
        med = sorted(windows)[len(windows) // 2]
        per_chain_ms = med / args.iters * 1e3
        results[name] = {
            "chain_ms": round(per_chain_ms, 4),
            "per_layer_us": round(per_chain_ms / L * 1e3, 2),
            "windows_ms": [round(w / args.iters * 1e3, 4) for w in windows],
        }
        print(f"[{name}] {per_chain_ms:.3f} ms / {L}-layer chain "
              f"({per_chain_ms / L * 1e3:.1f} us/layer)", flush=True)

    # DMA floor: bytes of one full K+V cache read at ~819 GB/s (v5e HBM)
    esize = jnp.dtype(k_cache.dtype).itemsize
    floor_ms = 2 * L * B * S * P * esize / 819e9 * 1e3
    report = {
        "metric": "decode_attention_chain_ms",
        "value": min(r["chain_ms"] for r in results.values()),
        "unit": "ms",
        "results": results,
        "dma_floor_ms": round(floor_ms, 4),
        "shape": {"L": L, "B": B, "S": S, "Hq": Hq, "Hkv": Hkv, "D": D},
        "kv_quant": bool(args.kv_quant),
        "cache_dtype": str(jnp.dtype(k_cache.dtype)),
        "block_b": args.block_b, "block_s": args.block_s,
        "backend": jax.default_backend(),
    }
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
