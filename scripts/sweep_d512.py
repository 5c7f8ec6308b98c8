#!/usr/bin/env python3
"""Flagship-tier (12L8H d512 block512) tuning sweep — the full treatment.

The d384 tier got a cumulative tuning sweep (docs/BENCHMARKS.md); this
gives the BASELINE.json north-star tier the same: flash tile sizes, fused
QKV, microbatch split, remat policy, scan unroll, GQA matrix, and the
shape-side vocab-lane-padding lever, each measured in an OOM-isolated
subprocess (reference ``optimize_train_batching.py`` protocol) at the
reference's effective batch of 128 windows per optimizer step.

    python scripts/sweep_d512.py --out outputs/benchmarks/sweep_d512.json

One JSON object per candidate; a summary table at the end.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

_sys_path_root = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _sys_path_root)

from scripts._shared import REPO_ROOT  # noqa: F401, E402
from scripts.benchmark_training_speed import run_candidate_subprocess  # noqa: E402

BASE_MODEL = {
    "vocab_size": 68, "block_size": 512, "n_layer": 12, "n_head": 8,
    "n_embd": 512, "dropout": 0.1, "label_smoothing": 0.05, "sep_id": 3,
    "tie_embeddings": True, "attention_impl": "flash",
    "compute_dtype": "bfloat16", "fused_qkv": True,
    "flash_block_q": 512, "flash_block_k": 512, "use_checkpoint": False,
}


def candidates():
    """(name, model-overrides, batch, gacc) — one sweep axis at a time."""
    rows: list[tuple[str, dict, int, int]] = [
        ("tuned-baseline b8x16 flash512x512 fusedqkv", {}, 8, 16),
        ("flash 256x256", {"flash_block_q": 256, "flash_block_k": 256}, 8, 16),
        ("flash 512x256", {"flash_block_q": 512, "flash_block_k": 256}, 8, 16),
        ("flash 256x512", {"flash_block_q": 256, "flash_block_k": 512}, 8, 16),
        ("unfused QKV", {"fused_qkv": False}, 8, 16),
        ("remat on (grad ckpt)", {"use_checkpoint": True}, 8, 16),
        ("scan unroll 2", {"scan_unroll": 2}, 8, 16),
        ("split b4x32", {}, 4, 32),
        ("split b16x8", {}, 16, 8),
        ("split b32x4", {}, 32, 4),
        ("GQA-4 (n_kv_head=4)", {"n_kv_head": 4}, 8, 16),
        ("GQA-2 (n_kv_head=2)", {"n_kv_head": 2}, 8, 16),
        ("vocab pad to 128 lanes", {"pad_vocab_lanes": True}, 8, 16),
        ("remat on + b16x8", {"use_checkpoint": True}, 16, 8),
    ]
    return rows


def flops_per_step(model: dict, tokens: int) -> float:
    """Training FLOPs per optimizer step (fwd+bwd, 3x fwd convention)."""
    d, L, T = model["n_embd"], model["n_layer"], model["block_size"]
    kv = model.get("n_kv_head") or model["n_head"]
    kv_frac = kv / model["n_head"]
    # per token per layer (2 FLOPs/MAC): Q 2d² + K 2·kv·d² + V 2·kv·d²
    # + out-proj 2d² + MLP (GELU 4x) 16d²
    mm = L * (4 + 4 * kv_frac + 16) * d * d
    head = 2 * d * model["vocab_size"]
    attn = L * 4 * d * T / 2  # causal: half the T² window, per token
    return 3.0 * tokens * (mm + head + attn)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="outputs/benchmarks/sweep_d512.json")
    ap.add_argument("--measure_steps", type=int, default=8)
    ap.add_argument("--timeout", type=float, default=1700.0)
    ap.add_argument("--only", default=None,
                    help="comma-separated substring filters on candidate names")
    ap.add_argument("--peak_tflops", type=float, default=197.0,
                    help="chip bf16 peak for MFU (v5e: 197)")
    args = ap.parse_args(argv)

    filters = [f.strip() for f in args.only.split(",")] if args.only else None
    results = []
    for name, overrides, batch, gacc in candidates():
        if filters and not any(f in name for f in filters):
            continue
        model = dict(BASE_MODEL)
        model.update(overrides)
        spec = {
            "model": model, "batch_size": batch, "grad_accum": gacc,
            "measure_steps": args.measure_steps, "warmup_steps": 2,
        }
        print(f"[sweep] {name} (b{batch}x{gacc}) ...", flush=True)
        res = run_candidate_subprocess(spec, timeout=args.timeout)
        row = {"name": name, "batch": batch, "grad_accum": gacc,
               "overrides": overrides, **res}
        if res.get("ok"):
            tps = res["nonpad_tokens_per_sec"]
            step_flops = flops_per_step(model, tokens=batch * gacc * 512)
            sustained = tps / (batch * gacc * 512) * step_flops / 1e12
            row["sustained_tflops"] = round(sustained, 1)
            row["mfu_pct"] = round(100 * sustained / args.peak_tflops, 1)
            print(f"[sweep]   -> {tps:,.0f} tok/s  ({row['mfu_pct']}% MFU)",
                  flush=True)
        else:
            print(f"[sweep]   -> {res.get('error')}", flush=True)
        results.append(row)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2) + "\n")
    ok = [r for r in results if r.get("ok")]
    if ok:
        best = max(ok, key=lambda r: r["nonpad_tokens_per_sec"])
        print(f"[sweep] best: {best['name']} "
              f"{best['nonpad_tokens_per_sec']:,.0f} tok/s "
              f"({best.get('mfu_pct')}% MFU)")
    print(f"[sweep] wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
