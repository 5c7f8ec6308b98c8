#!/usr/bin/env python3
"""LoRA transfer benchmark: adaptation quality vs trainable parameters.

Gives the LoRA feature (``training/lora.py``) the same evidence standard
as every other addition: a measured quality artifact. Protocol — genuine
domain shift from the demo-corpus generator (each seed draws new
genus-specific codon-usage dialects, ``make_demo_corpus.py``):

1. pretrain a base model on corpus A (seed ``--seed``),
2. adapt to corpus B (seed ``--shift_seed``) under an identical budget
   three ways: full fine-tune (every parameter), LoRA rank 8, LoRA
   rank 2 — all via the production trainer's ``transfer_from`` path,
3. judge every checkpoint with the shared exact evaluator on B's val
   split; report trainable parameters and the fraction of the
   full-fine-tune gain each adapter recovers from the zero-shot NLL.

    python scripts/benchmark_lora.py --out docs/benchmarks/lora_transfer.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_sys_path_root = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _sys_path_root)

from scripts._shared import REPO_ROOT  # noqa: F401, E402
from scripts.benchmark_moe import build_dataset  # noqa: E402


def run_d512_efficiency(args) -> dict:
    """Where LoRA actually wins at the flagship tier: bytes and step time.

    Measures, at 12L8H d512 block512 (the BASELINE north-star tier):

    - **checkpoint bytes** — the dense model checkpoint vs the
      adapter-only state (``training/lora.py::adapter_state``), both as
      real npz files on disk;
    - **optimizer-state bytes** — AdamW moments for full fine-tuning vs
      ``lora_only`` (optax ``multi_transform`` masks frozen leaves out of
      the moment trees entirely). This is exactly the quantity ZeRO-1
      shards over the data axis, so the ratio is also the per-device
      ZeRO-1 moment saving;
    - **step wall time** — full-FT vs LoRA group step on the current
      backend; the LoRA step computes NO gradients for frozen leaves
      (``train_step.make_train_step(param_labels=...)`` puts them under
      ``stop_gradient``, dead-code-eliminating their dW matmuls).
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    from genomics_lm_tpu.models import codon_gpt
    from genomics_lm_tpu.models.config import CodonGPTConfig
    from genomics_lm_tpu.training import checkpoints as ckpt_lib
    from genomics_lm_tpu.training import lora as lora_lib
    from genomics_lm_tpu.training import optim as optim_lib
    from genomics_lm_tpu.training.train_step import LossConfig, make_train_step

    model = {
        "vocab_size": 68, "block_size": 512, "n_layer": 12, "n_head": 8,
        "n_embd": 512, "dropout": 0.1, "label_smoothing": 0.05, "sep_id": 3,
        "tie_embeddings": True, "attention_impl": "flash",
        "compute_dtype": "bfloat16", "fused_qkv": True,
        "flash_block_q": 512, "flash_block_k": 512,
    }
    cfg = CodonGPTConfig.from_run_config(dict(model))
    base = codon_gpt.init(jax.random.PRNGKey(0), cfg)
    adapted = lora_lib.add_lora_adapters(
        base, jax.random.PRNGKey(1), rank=args.d512_rank)

    workdir = Path(args.workdir) / "d512_efficiency"
    workdir.mkdir(parents=True, exist_ok=True)
    dense_path = workdir / "dense_model.npz"
    adapters_path = workdir / "adapters_only.npz"
    ckpt_lib.save_checkpoint({"model": base}, dense_path)
    ckpt_lib.save_checkpoint(
        {"adapters": lora_lib.adapter_state(adapted)}, adapters_path)
    dense_bytes = dense_path.stat().st_size
    adapter_bytes = adapters_path.stat().st_size

    # round-trip sanity: re-attached adapters forward like the original
    # (xla attention: the flash kernel's 512-wide blocks reject this short
    # probe sequence, and the check is about parameter plumbing, not kernels)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(4, 68, (2, 64)), jnp.int32)
    probe_cfg = cfg.replace(attention_impl="xla", dropout=0.0)
    reattached = lora_lib.apply_adapter_state(
        ckpt_lib.load_checkpoint(dense_path)["model"],
        ckpt_lib.load_checkpoint(adapters_path)["adapters"])
    np.testing.assert_allclose(
        np.asarray(codon_gpt.forward(reattached, probe_cfg, x)[0]),
        np.asarray(codon_gpt.forward(adapted, probe_cfg, x)[0]), atol=1e-5)

    def tree_bytes(tree) -> int:
        return int(sum(
            getattr(leaf, "nbytes", 0) for leaf in jax.tree.leaves(tree)))

    def measure(tag, params, run_cfg):
        bundle = optim_lib.build_optimizer(run_cfg, params, total_steps=100)
        opt_state = bundle.tx.init(params)
        step = make_train_step(cfg, LossConfig(label_smoothing=0.05),
                               bundle.tx, param_labels=bundle.labels)
        batch = {
            "x": jnp.asarray(rng.integers(4, 68, (1, args.d512_batch, 512)),
                             jnp.int32),
            "y": jnp.asarray(rng.integers(4, 68, (1, args.d512_batch, 512)),
                             jnp.int32),
        }
        key = jax.random.PRNGKey(2)
        one = jnp.asarray(1.0)
        p, o = params, opt_state
        for _ in range(args.d512_warmup):       # compile + settle
            p, o, m = step(p, o, batch, key, one)
        jax.block_until_ready(m["total_loss_sum"])
        t0 = time.perf_counter()
        for _ in range(args.d512_steps):
            p, o, m = step(p, o, batch, key, one)
        jax.block_until_ready(m["total_loss_sum"])
        dt = (time.perf_counter() - t0) / args.d512_steps
        trainable = sum(
            int(leaf.size)
            for leaf, lbl in zip(jax.tree.leaves(params),
                                 jax.tree.leaves(bundle.labels))
            if lbl != "frozen")
        row = {
            "mode": tag,
            "trainable_params": trainable,
            "opt_state_bytes": tree_bytes(opt_state),
            "step_wall_sec": round(dt, 4),
            "tokens_per_sec": round(args.d512_batch * 512 / dt, 1),
        }
        print(f"[lora-d512] {tag}: {trainable:,} trainable, "
              f"moments {row['opt_state_bytes'] / 2**20:.1f} MiB, "
              f"{dt * 1e3:.1f} ms/step", flush=True)
        return row

    full = measure("full_finetune", base,
                   {"lr": 3e-4, "warmup_steps": 0})
    lora = measure(f"lora_r{args.d512_rank}", adapted,
                   {"lr": 3e-4, "warmup_steps": 0,
                    "lora_rank": args.d512_rank})

    backend = jax.devices()[0].platform
    return {
        "protocol": (
            f"12L8H d512 block512 b{args.d512_batch}, "
            f"{args.d512_warmup} warmup + {args.d512_steps} timed steps on "
            f"'{backend}'; LoRA rank {args.d512_rank} attn targets, "
            "lora_only (frozen backbone, stop-gradient dW elimination)"
        ),
        "checkpoint_bytes": {
            "dense_model": dense_bytes,
            "adapter_only": adapter_bytes,
            "ratio": round(adapter_bytes / dense_bytes, 5),
        },
        "full_finetune": full,
        "lora": lora,
        "opt_state_ratio": round(
            lora["opt_state_bytes"] / full["opt_state_bytes"], 5),
        "step_time_ratio": round(
            lora["step_wall_sec"] / full["step_wall_sec"], 3),
        "note": (
            "opt_state_bytes is the ZeRO-1-sharded quantity: per-device "
            "moment memory under data parallelism scales by the same ratio"
        ),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/benchmarks/lora_transfer.json")
    ap.add_argument("--workdir", default="outputs/lora_transfer")
    ap.add_argument("--genes", type=int, default=800)
    ap.add_argument("--block_size", type=int, default=256)
    ap.add_argument("--n_layer", type=int, default=6)
    ap.add_argument("--n_head", type=int, default=4)
    ap.add_argument("--n_embd", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--pretrain_epochs", type=int, default=12)
    ap.add_argument("--adapt_epochs", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lora_lr", type=float, default=3e-3)
    ap.add_argument("--warmup_steps", type=int, default=40)
    ap.add_argument("--seed", type=int, default=1337)
    ap.add_argument("--shift_seed", type=int, default=4242)
    ap.add_argument("--d512_efficiency", action="store_true",
                    help="only run the flagship-tier efficiency section "
                         "(checkpoint/moment bytes + step time) and merge "
                         "it into the existing artifact")
    ap.add_argument("--d512_rank", type=int, default=8)
    ap.add_argument("--d512_batch", type=int, default=8)
    ap.add_argument("--d512_warmup", type=int, default=3)
    ap.add_argument("--d512_steps", type=int, default=10)
    args = ap.parse_args(argv)

    if args.d512_efficiency:
        out = Path(args.out)
        report = json.loads(out.read_text()) if out.exists() else {}
        report["efficiency_d512"] = run_d512_efficiency(args)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(report, indent=2) + "\n")
        print(f"[lora-transfer] wrote {out} (efficiency_d512)")
        return 0

    from genomics_lm_tpu.evals.perplexity import evaluate_perplexity
    from genomics_lm_tpu.models.codon_gpt import param_count
    from genomics_lm_tpu.models.config import CodonGPTConfig
    from genomics_lm_tpu.training import checkpoints as ckpt_lib
    from genomics_lm_tpu.training.loop import run_training
    from genomics_lm_tpu.training.lora import lora_param_count

    workdir = Path(args.workdir)
    ds_a = build_dataset(workdir / "corpus_a", genes=args.genes,
                         block_size=args.block_size, seed=args.seed)
    ds_b = build_dataset(workdir / "corpus_b", genes=args.genes,
                         block_size=args.block_size, seed=args.shift_seed)
    block = args.block_size

    def shared_cfg(dataset_dir: Path) -> dict:
        return {
            "train_npz": str(dataset_dir / f"train_bs{block}.npz"),
            "val_npz": str(dataset_dir / f"val_bs{block}.npz"),
            "block_size": block, "vocab_size": 68,
            "n_layer": args.n_layer, "n_head": args.n_head,
            "n_embd": args.n_embd,
            "dropout": 0.0, "label_smoothing": 0.0, "tie_embeddings": True,
            "batch_size": args.batch_size, "grad_accum_steps": 1,
            "min_lr": args.lr / 10.0, "weight_decay": 0.05,
            "warmup_steps": args.warmup_steps, "optimizer": "adamw",
            "scheduler": "cosine", "seed": args.seed,
            "dataloader_seed": args.seed, "early_stop_patience": 0,
            "itos_path": str(dataset_dir / "itos.txt"),
            "use_mmap_dataset": False,
        }

    model_cfg = CodonGPTConfig.from_run_config(shared_cfg(ds_a))

    print("[lora-transfer] pretraining base on corpus A ...", flush=True)
    base_cfg = dict(shared_cfg(ds_a), lr=args.lr,
                    epochs=args.pretrain_epochs, run_id="base-a")
    run_training(base_cfg, run_root=workdir / "runs")
    base_ckpt = workdir / "runs" / "base-a" / "checkpoints" / "last.npz"
    base_params = ckpt_lib.load_checkpoint(base_ckpt)["model"]

    b_val = ds_b / f"val_bs{block}.npz"
    zero_shot = evaluate_perplexity(base_params, model_cfg, b_val)
    a_val_eval = evaluate_perplexity(base_params, model_cfg,
                                     ds_a / f"val_bs{block}.npz")
    print(f"[lora-transfer] base on A-val ppl {a_val_eval['perplexity']:.3f}; "
          f"zero-shot on B-val ppl {zero_shot['perplexity']:.3f}", flush=True)

    variants = [
        ("full_ft", {"lr": args.lr}),
        ("lora_r8", {"lr": args.lora_lr, "lora_rank": 8,
                     "lora_targets": "attn+mlp"}),
        ("lora_r2", {"lr": args.lora_lr, "lora_rank": 2,
                     "lora_targets": "attn+mlp"}),
    ]
    rows = []
    for name, extra in variants:
        cfg = dict(shared_cfg(ds_b), epochs=args.adapt_epochs,
                   run_id=f"adapt-{name}", **extra)
        print(f"[lora-transfer] adapting {name} on corpus B ...", flush=True)
        t0 = time.perf_counter()
        meta = run_training(cfg, run_root=workdir / "runs",
                            transfer_from=str(base_ckpt))
        wall = time.perf_counter() - t0
        params = ckpt_lib.load_checkpoint(
            workdir / "runs" / cfg["run_id"] / "checkpoints" / "last.npz"
        )["model"]
        ev = evaluate_perplexity(params, model_cfg, b_val)
        trainable = (lora_param_count(params) if extra.get("lora_rank")
                     else param_count(params))
        row = {
            "name": name,
            "trainable_params": int(trainable),
            "total_params": int(param_count(params)),
            "val_nll_b": ev["nll"],
            "val_ppl_b": ev["perplexity"],
            "train_wall_sec": meta["train_wall_sec"],
            "wall_sec_total": round(wall, 2),
        }
        print(f"[lora-transfer]   -> B-val ppl {row['val_ppl_b']:.3f} "
              f"({trainable:,} trainable)", flush=True)
        rows.append(row)

    full = next(r for r in rows if r["name"] == "full_ft")
    gain_full = zero_shot["nll"] - full["val_nll_b"]
    for r in rows:
        r["recovered_fraction_of_full_ft_gain"] = (
            round((zero_shot["nll"] - r["val_nll_b"]) / gain_full, 4)
            if gain_full > 0 else None
        )

    report = {
        "protocol": {
            "model": f"{args.n_layer}L{args.n_head}H d{args.n_embd} block{block}",
            "corpora": f"demo corpus genes={args.genes}; A seed={args.seed}, "
                       f"B seed={args.shift_seed} (fresh genus dialects)",
            "budget": f"pretrain {args.pretrain_epochs} epochs on A; every "
                      f"adaptation {args.adapt_epochs} epochs on B via "
                      f"transfer_from (full lr={args.lr}, lora lr={args.lora_lr})",
            "evaluator": "evals/perplexity.py exact corpus NLL on B val",
        },
        "base_on_a_val": {"nll": a_val_eval["nll"],
                          "ppl": a_val_eval["perplexity"]},
        "zero_shot_on_b_val": {"nll": zero_shot["nll"],
                               "ppl": zero_shot["perplexity"]},
        "adaptations": rows,
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(f"[lora-transfer] wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
