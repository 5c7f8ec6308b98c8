#!/usr/bin/env python3
"""Headline benchmark: non-pad codon tokens/sec/chip for training.

Protocol mirrors the reference runtime gate
(``docs/benchmarks/corrected_mps_runtime_gate.json``): the 10L8H d384
block512 model, effective batch 128 windows per optimizer step, seed 1337,
warmup + measured optimizer steps. The reference reaches its effective batch
as b4 × gacc32 on an 8 GB M2; the TPU-native runtime policy runs the same
128-window step as b8 × gacc16 with the Pallas flash attention kernel, bf16
compute, and dropout 0.1 — identical optimizer-step semantics, measured as
non-pad target tokens per wall second.

Two input protocols:

- default: synthetic full windows (all targets non-pad) pre-staged on
  device — isolates device-side training throughput,
- ``--real-pipeline``: an on-disk packed dataset is built through the real
  preparation machinery (chunking + multi-window packing + mmap sidecars),
  then streamed through ``EpochPlan`` host sharding and grouped microbatch
  assembly with per-step host→device transfer — the protocol-for-protocol
  comparison against the reference's 2,891.9 (which used real preloaded
  data with ~24.7% padding).

By default THREE protocols run on one compiled step and ONE JSON line is
printed: the headline "value" is the real-pipeline number with the repo's
first-fit-decreasing ``binpack`` packing (the best honest delivered
number), "reference_packing_protocol" carries the arrival-order ``multi``
packing row (protocol-for-protocol vs the reference's ~24% padding), and
the synthetic device-side ceiling rides under "synthetic_device_only".
``--real-pipeline`` / ``--synthetic-only`` run a single protocol.
Baseline: 2,891.9 non-pad tok/s (reference selected runtime, BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path

import numpy as np

BASELINE_TOKENS_PER_SEC = 2891.9
WARMUP_STEPS = 3
MEASURE_STEPS = 20


def build_model_and_step():
    import jax

    from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt
    from genomics_lm_tpu.training.optim import build_optimizer
    from genomics_lm_tpu.training.train_step import LossConfig, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    cfg = CodonGPTConfig(
        vocab_size=68,
        block_size=512,
        n_layer=10,
        n_head=8,
        n_embd=384,
        dropout=0.1,
        label_smoothing=0.05,
        sep_id=3,
        tie_embeddings=True,
        attention_impl="flash" if on_tpu else "xla",
        compute_dtype="bfloat16" if on_tpu else "float32",
        use_checkpoint=False,
        # tuned on-chip (docs/BENCHMARKS.md sweep): full-sequence flash
        # tiles kill the q/k grid overhead (+32%), fused QKV one gemm (+1%)
        fused_qkv=True,
        flash_block_q=512,
        flash_block_k=512,
    )
    params = codon_gpt.init(jax.random.PRNGKey(1337), cfg)
    run_cfg = {
        "lr": 3e-4, "lr_embedding": 3e-4, "min_lr": 3e-5, "weight_decay": 0.05,
        "warmup_steps": 100, "scheduler": "cosine",
    }
    bundle = build_optimizer(run_cfg, params, total_steps=5000)
    opt_state = bundle.tx.init(params)
    loss_cfg = LossConfig(label_smoothing=0.05)
    step = make_train_step(cfg, loss_cfg, bundle.tx)
    return cfg, params, opt_state, step


def hard_sync(metrics) -> float:
    # block_until_ready can be a no-op on remote/tunneled runtimes; a
    # scalar value fetch forces the full execution queue to drain
    return float(metrics["total_loss_sum"])


def run_synthetic(built=None) -> dict:
    """Device-resident full-window protocol (device-side throughput)."""
    import jax
    import jax.numpy as jnp

    cfg, params, opt_state, step = built or build_model_and_step()
    # Effective batch 128 windows per optimizer step (= reference protocol).
    # Swept splits G x B in {2x64, 4x32, 8x16, 16x8, 32x4}: 16 microbatches
    # of 8 windows is the measured optimum (smaller live activations →
    # better HBM locality; B=128 single-shot needs ~24 GB and OOMs).
    G, B, T = 16, 8, 512

    def make_batch(seed):
        r = np.random.default_rng(seed)
        x = r.integers(4, 68, (G, B, T)).astype(np.int32)
        x[..., ::97] = 3  # sprinkle segment boundaries
        y = np.roll(x, -1, axis=-1)
        y[..., -1] = 2
        return {"x": jnp.asarray(x), "y": jnp.asarray(y)}

    batches = [make_batch(s) for s in range(4)]
    nonpad_per_step = int(np.sum(np.asarray(batches[0]["y"]) != 0))
    key = jax.random.PRNGKey(1337)

    for i in range(WARMUP_STEPS):
        key, k = jax.random.split(key)
        params, opt_state, metrics = step(
            params, opt_state, batches[i % len(batches)], k, jnp.float32(1.0)
        )
    hard_sync(metrics)

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        key, k = jax.random.split(key)
        params, opt_state, metrics = step(
            params, opt_state, batches[i % len(batches)], k, jnp.float32(1.0)
        )
    hard_sync(metrics)
    elapsed = time.perf_counter() - t0

    tokens_per_sec = nonpad_per_step * MEASURE_STEPS / elapsed
    return {
        "metric": "train_nonpad_codon_tokens_per_sec_per_chip",
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(tokens_per_sec / BASELINE_TOKENS_PER_SEC, 3),
    }


def build_packed_dataset(n_windows: int, block_size: int, out_dir: Path,
                         pack_mode: str = "multi"):
    """Realistic packed dataset via the real chunk→pack→arrays machinery."""
    from genomics_lm_tpu.data.packing import chunk_record, pack_chunks, packed_arrays

    rng = np.random.default_rng(1337)
    records = []
    line = 0
    # CDS length distribution: lognormal around ~250 codons, clipped — the
    # mix of short genes and >block_size genes is what produces real padding
    while True:
        n_codons = int(np.clip(rng.lognormal(5.4, 0.6), 30, 1600))
        tokens = [1] + list(rng.integers(4, 68, n_codons)) + [2]
        records.append({
            "tokens": tokens,
            "source_id": f"synth:{line}",
            "source_line_idx": line,
            "fragment_line_idx": line,
            "fragment_index": 0,
            "split": "train",
            "fragment_codon_start": 0,
            "fragment_codon_end": n_codons,
        })
        line += 1
        if line % 64 == 0:
            total = sum(len(r["tokens"]) for r in records)
            if total > n_windows * (block_size + 1) * 1.1:
                break
    chunks = [c for r in records for c in chunk_record(r, block_size)]
    windows = pack_chunks(chunks, block_size=block_size, mode=pack_mode, sep_id=3)
    arrays = packed_arrays(windows, block_size=block_size, mode="fixed")
    out_dir.mkdir(parents=True, exist_ok=True)
    npz = out_dir / "bench_train.npz"
    np.savez(npz, X=arrays["X"], Y=arrays["Y"])
    # mmap sidecars: the production loader's preferred storage
    np.save(out_dir / "bench_train_X.npy", arrays["X"])
    np.save(out_dir / "bench_train_Y.npy", arrays["Y"])
    pad_fraction = float(np.mean(arrays["Y"] == 0))
    return npz, pad_fraction


def run_real_pipeline(pack_mode: str = "multi", built=None) -> dict:
    """EpochPlan host pipeline protocol: real packing, real padding, real
    host→device transfer every step (protocol-for-protocol vs the 2,891.9
    reference gate, which trained on preloaded real data)."""
    import jax
    import jax.numpy as jnp

    from genomics_lm_tpu.data.datasets import (
        DevicePrefetcher,
        EpochPlan,
        PackedDataset,
        grouped_batches,
    )

    cfg, params, opt_state, step = built or build_model_and_step()
    G, B = 16, 8
    n_steps = WARMUP_STEPS + MEASURE_STEPS
    with tempfile.TemporaryDirectory(prefix="bench_realpipe_") as tmp:
        npz, pad_fraction = build_packed_dataset(
            n_windows=(n_steps + 2) * G * B, block_size=cfg.block_size,
            out_dir=Path(tmp), pack_mode=pack_mode,
        )
        ds = PackedDataset(npz, use_mmap=True)
        key = jax.random.PRNGKey(1337)

        def put_group(item):
            gx, gy, _ = item
            # device transfer + host nonpad count in the worker thread, so
            # per-step transfer round trips overlap with the running step
            return jnp.asarray(gx), jnp.asarray(gy), int(np.sum(gy != 0))

        def epoch_groups(epoch: int):
            plan = EpochPlan(ds, batch_size=B, seed=1337, epoch=epoch)
            full = (g for g in grouped_batches(plan, G) if g[0].shape[0] == G)
            return DevicePrefetcher(full, put_group, depth=2)

        groups = epoch_groups(1)
        done = 0
        nonpad_measured = 0
        metrics = None
        t0 = None
        epoch = 1
        while done < n_steps:
            try:
                dx, dy, nonpad = next(groups)
            except StopIteration:
                epoch += 1
                groups = epoch_groups(epoch)
                continue
            key, k = jax.random.split(key)
            batch = {"x": dx, "y": dy}
            params, opt_state, metrics = step(
                params, opt_state, batch, k, jnp.float32(1.0)
            )
            done += 1
            if done == WARMUP_STEPS:
                hard_sync(metrics)
                t0 = time.perf_counter()
            elif done > WARMUP_STEPS:
                nonpad_measured += nonpad
        groups.close()
        hard_sync(metrics)
        elapsed = time.perf_counter() - t0

    tokens_per_sec = nonpad_measured / elapsed
    return {
        "metric": "train_nonpad_codon_tokens_per_sec_per_chip_real_pipeline",
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(tokens_per_sec / BASELINE_TOKENS_PER_SEC, 3),
        "pad_fraction": round(pad_fraction, 4),
        "pack_mode": pack_mode,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--binpack", action="store_true",
                    help="with --real-pipeline: pack the dataset first-fit-"
                         "decreasing (data.packing mode='binpack') instead of "
                         "arrival order — same lossless contract, less padding")
    ap.add_argument("--real-pipeline", action="store_true",
                    help="ONLY the real-pipeline protocol (default runs both)")
    ap.add_argument("--synthetic-only", action="store_true",
                    help="ONLY the synthetic device-resident protocol")
    args = ap.parse_args()
    pack = "binpack" if args.binpack else "multi"
    if args.real_pipeline:
        print(json.dumps(run_real_pipeline(pack)))
        return
    if args.synthetic_only:
        print(json.dumps(run_synthetic()))
        return
    # default: ALL THREE protocols, one compiled step, ONE JSON line. The
    # headline value is the delivered real-pipeline number under binpack
    # packing (the framework's shipped packing mode, ~11% padding); the
    # reference-packing row (arrival-order multi, ~24% padding — the
    # protocol-for-protocol comparison vs the reference's 2,891.9 on real
    # preloaded data) and the synthetic device-side ceiling ride along.
    built = build_model_and_step()
    synthetic = run_synthetic(built)
    multi = run_real_pipeline("multi", built)
    binpack = run_real_pipeline("binpack", built)
    result = {
        "metric": "train_nonpad_codon_tokens_per_sec_per_chip",
        "value": binpack["value"],
        "unit": "tokens/sec",
        "vs_baseline": binpack["vs_baseline"],
        "protocol": f"real_pipeline(binpack, pad={binpack['pad_fraction']})",
        "reference_packing_protocol": {
            "value": multi["value"],
            "vs_baseline": multi["vs_baseline"],
            "protocol": f"real_pipeline(multi, pad={multi['pad_fraction']})",
        },
        "synthetic_device_only": {
            "value": synthetic["value"],
            "vs_baseline": synthetic["vs_baseline"],
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
