#!/usr/bin/env python3
"""Training-throughput benchmark: candidates in isolated subprocesses.

Parity: reference ``scripts/benchmark_training_speed.py`` /
``scripts/optimize_train_batching.py`` — each (batch_size, grad_accum)
candidate runs in its own subprocess so an OOM kills only the probe; the
result schema reports non-pad tokens/sec, seq/sec, wall-per-step, padding
fraction, and device peak memory; matrix mode applies named overrides to a
base config.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: E402

OOM_PATTERNS = ("out of memory", "oom", "allocate", "allocation", "hbm capacity")

_PROBE_SOURCE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import numpy as np
import jax, jax.numpy as jnp
from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt
from genomics_lm_tpu.training.optim import build_optimizer
from genomics_lm_tpu.training.train_step import LossConfig, make_train_step
from genomics_lm_tpu.training.runtime import device_memory_stats

spec = json.loads(sys.argv[1])
cfg = CodonGPTConfig.from_run_config(spec["model"])
G, B, T = spec["grad_accum"], spec["batch_size"], cfg.block_size
params = codon_gpt.init(jax.random.PRNGKey(1337), cfg)
bundle = build_optimizer(spec.get("optim", {"lr": 3e-4, "warmup_steps": 10}), params, 1000)
opt_state = bundle.tx.init(params)
step = make_train_step(cfg, LossConfig(), bundle.tx)
rng = np.random.default_rng(1337)
x = rng.integers(4, cfg.vocab_size, (G, B, T)).astype(np.int32)
y = np.roll(x, -1, axis=-1); y[..., -1] = 2
batch = {"x": jnp.asarray(x), "y": jnp.asarray(y)}
key = jax.random.PRNGKey(0)
warmup, measure = spec.get("warmup_steps", 2), spec.get("measure_steps", 8)
def hard_sync(metrics):
    return float(metrics["total_loss_sum"])
for _ in range(warmup):
    key, k = jax.random.split(key)
    params, opt_state, m = step(params, opt_state, batch, k, jnp.float32(1.0))
hard_sync(m)
t0 = time.perf_counter()
for _ in range(measure):
    key, k = jax.random.split(key)
    params, opt_state, m = step(params, opt_state, batch, k, jnp.float32(1.0))
hard_sync(m)
dt = time.perf_counter() - t0
nonpad = int((y != 0).sum())
print(json.dumps({
    "ok": True,
    "nonpad_tokens_per_sec": nonpad * measure / dt,
    "seq_per_sec": G * B * measure / dt,
    "wall_per_step_sec": dt / measure,
    "padding_fraction": float((y == 0).mean()),
    "device_memory": device_memory_stats(),
}))
"""


def run_candidate_subprocess(spec: dict, timeout: float = 900.0) -> dict:
    """Run one candidate in a fresh process; classify OOM failures."""
    source = _PROBE_SOURCE.replace("{repo!r}", repr(str(REPO_ROOT)))
    try:
        proc = subprocess.run(
            [sys.executable, "-c", source, json.dumps(spec)],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"ok": False, "error": "timeout"}
    if proc.returncode != 0:
        blob = (proc.stderr + proc.stdout).lower()
        return {
            "ok": False,
            "error": "oom" if any(p in blob for p in OOM_PATTERNS) else "failed",
            "detail": proc.stderr.strip()[-2000:],
        }
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return {"ok": False, "error": "no-output"}


DEFAULT_CANDIDATES = [(4, 32), (8, 16), (16, 8), (32, 4), (64, 2), (128, 1)]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="base YAML model config")
    ap.add_argument("--candidates", default=None,
                    help="comma list like 4x32,8x16 (batch x gacc)")
    ap.add_argument("--matrix", default=None,
                    help="YAML with base: + named override maps")
    ap.add_argument("--measure_steps", type=int, default=8)
    ap.add_argument("--out", default="outputs/benchmarks/training_speed.json")
    args = ap.parse_args(argv)

    import yaml

    base_model = {
        "vocab_size": 68, "block_size": 512, "n_layer": 10, "n_head": 8,
        "n_embd": 384, "dropout": 0.1, "label_smoothing": 0.05,
        "attention_impl": "flash", "compute_dtype": "bfloat16",
    }
    if args.config:
        base_model.update(yaml.safe_load(Path(args.config).read_text()) or {})

    jobs = []
    if args.matrix:
        matrix = yaml.safe_load(Path(args.matrix).read_text()) or {}
        base = matrix.get("base", {})
        for name, overrides in (matrix.get("overrides") or {}).items():
            model = dict(base_model)
            spec_base = dict(base)
            spec_base.update(overrides or {})
            model.update({k: v for k, v in spec_base.items()
                          if k not in {"batch_size", "grad_accum_steps"}})
            jobs.append((name, {
                "model": model,
                "batch_size": int(spec_base.get("batch_size", 8)),
                "grad_accum": int(spec_base.get("grad_accum_steps", 16)),
                "measure_steps": args.measure_steps,
            }))
    else:
        if args.candidates:
            candidates = [
                tuple(int(v) for v in c.split("x")) for c in args.candidates.split(",")
            ]
        else:
            candidates = DEFAULT_CANDIDATES
        for batch, gacc in candidates:
            jobs.append((f"b{batch}x{gacc}", {
                "model": base_model,
                "batch_size": batch,
                "grad_accum": gacc,
                "measure_steps": args.measure_steps,
            }))

    results = []
    for name, spec in jobs:
        print(f"[bench] {name} ...", flush=True)
        result = run_candidate_subprocess(spec)
        result["name"] = name
        result["batch_size"] = spec["batch_size"]
        result["grad_accum"] = spec["grad_accum"]
        results.append(result)
        if result.get("ok"):
            print(f"[bench] {name}: {result['nonpad_tokens_per_sec']:.1f} tok/s")
        else:
            print(f"[bench] {name}: {result['error']}")

    ok = [r for r in results if r.get("ok")]
    best = max(ok, key=lambda r: r["nonpad_tokens_per_sec"]) if ok else None
    report = {"results": results, "selected_policy": best}
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    if best:
        print(f"[bench] selected: {best['name']} @ {best['nonpad_tokens_per_sec']:.1f} tok/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
