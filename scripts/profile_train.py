#!/usr/bin/env python3
"""Profile a short training run with the JAX profiler.

Parity: reference ``scripts/profile_train.py`` (torch.profiler Chrome
traces) — TPU-native equivalent: ``jax.profiler.trace`` writes an xplane /
TensorBoard-compatible trace plus a step-timing text summary.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="outputs/profiles")
    ap.add_argument("--n_layer", type=int, default=10)
    ap.add_argument("--n_head", type=int, default=8)
    ap.add_argument("--n_embd", type=int, default=384)
    ap.add_argument("--block_size", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--grad_accum", type=int, default=4)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt
    from genomics_lm_tpu.training.optim import build_optimizer
    from genomics_lm_tpu.training.train_step import LossConfig, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    cfg = CodonGPTConfig(
        vocab_size=68, block_size=args.block_size, n_layer=args.n_layer,
        n_head=args.n_head, n_embd=args.n_embd, dropout=0.1,
        attention_impl="flash" if on_tpu else "xla",
        compute_dtype="bfloat16" if on_tpu else "float32",
    )
    params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
    bundle = build_optimizer({"lr": 3e-4, "warmup_steps": 10}, params, 1000)
    opt_state = bundle.tx.init(params)
    step = make_train_step(cfg, LossConfig(), bundle.tx)
    rng = np.random.default_rng(0)
    x = rng.integers(4, 68, (args.grad_accum, args.batch_size, args.block_size)).astype(np.int32)
    y = np.roll(x, -1, axis=-1)
    y[..., -1] = 2
    batch = {"x": jnp.asarray(x), "y": jnp.asarray(y)}
    key = jax.random.PRNGKey(0)

    from genomics_lm_tpu.utils.sync import hard_sync

    # compile outside the trace
    key, k = jax.random.split(key)
    params, opt_state, m = step(params, opt_state, batch, k, jnp.float32(1.0))
    hard_sync(m)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    timings = []
    with jax.profiler.trace(str(out_dir)):
        for _ in range(args.steps):
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            params, opt_state, m = step(params, opt_state, batch, k, jnp.float32(1.0))
            hard_sync(m)
            timings.append(time.perf_counter() - t0)

    nonpad = int((y != 0).sum())
    summary = out_dir / "summary.txt"
    lines = [
        f"model: {args.n_layer}L{args.n_head}H d{args.n_embd} block{args.block_size}",
        f"batch: {args.batch_size} x gacc {args.grad_accum}",
        f"steps: {args.steps}",
        f"mean step: {sum(timings) / len(timings):.4f}s",
        f"min step: {min(timings):.4f}s",
        f"nonpad tokens/sec: {nonpad / (sum(timings) / len(timings)):.1f}",
        f"trace dir: {out_dir} (TensorBoard-compatible)",
    ]
    summary.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
