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
    args = ap.parse_args(argv)

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
