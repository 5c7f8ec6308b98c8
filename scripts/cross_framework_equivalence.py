#!/usr/bin/env python3
"""Full cross-framework training-equivalence run vs the mounted reference.

Closes the last provable "matching" gate (BASELINE.md target block): the
step-level parity harness (``tests/test_torch_parity.py``) shows the model
and one optimizer step agree; this script shows the WHOLE chain agrees —
packing → loader → schedule → CE → eval — by training the *actual*
reference trainer (``src/codonlm/training/loop.py:173``, torch CPU, run as
the subprocess its own tests use) and this framework's trainer on one
shared frozen synthetic dataset from identical transplanted initial
weights, then judging both final checkpoints under a single evaluator:

1. corpus: ``make_demo_corpus`` records (frozen by seed), packed ONCE by
   this repo's pipeline (bit-identical to the reference packer —
   ``tests/test_dataset_interop.py``); the reference trainer consumes the
   repo-produced NPZ + manifest directly.
2. shared init: one torch-seeded reference TinyGPT state dict, exported to
   both trainers (``--transfer_from`` on each side).
3. train both (same hyperparameters, dropout 0, cosine schedule — the
   repo's schedule IS the reference lambda, ``training/optim.py:52``).
4. gates:
   - chain check: the reference's own logged final val loss matches the
     repo evaluator run on the TRANSPLANTED reference checkpoint;
   - equivalence: final val NLL of the two trained models agrees within
     the BASELINE tolerance (<0.5%);
   - Markov margins: both models sit on the same side of every
     uniform/unigram/bigram/trigram baseline (``<SEP>``-reset protocol,
     reference ``docs/PERPLEXITY_BASELINES.md``), and both beat unigram;
   - probe embeddings: pooled ``forward_hidden`` embeddings of the
     transplanted reference checkpoint are identical between the torch
     forward and this repo's extractor (scale-relative ≤5e-4 + cosine
     ≥1-1e-6: fp32 reduction order differs across backends and XLA
     device configs, so the bound must scale with activation magnitude).

Writes a JSON report and exits nonzero on any gate failure.

    JAX_PLATFORMS=cpu python scripts/cross_framework_equivalence.py \
        --workdir outputs/equivalence --epochs 8
"""

from __future__ import annotations

import argparse
import csv
import json
import math
import os
import shutil
import subprocess
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from scripts._shared import REPO_ROOT  # noqa: F401, E402

import numpy as np  # noqa: E402


def _load_records_tsv(path: Path) -> list[dict]:
    rows = []
    with path.open() as f:
        reader = csv.DictReader(f, delimiter="\t")
        for row in reader:
            rows.append(dict(row))
    return rows


def build_frozen_dataset(workdir: Path, *, genes: int, block_size: int,
                         seed: int) -> Path:
    """Demo corpus → one packed dataset both frameworks consume."""
    from scripts.make_demo_corpus import main as make_corpus
    from genomics_lm_tpu.data.pipeline import prepare_dataset

    records_tsv = workdir / "records.tsv"
    make_corpus([
        "--out", str(records_tsv), "--genes", str(genes), "--seed", str(seed),
    ])
    dataset_dir = workdir / "dataset"
    prepare_dataset(
        _load_records_tsv(records_tsv),
        dataset_dir,
        block_size=block_size,
        pack_mode="multi",
        group_by="genome",
        split_seed=seed,
        skip_homology=True,
        audit_engine="native",
    )
    return dataset_dir


def make_shared_init(workdir: Path, model_cfg, seed: int, itos_path: Path):
    """One torch-seeded init, exported for both trainers' --transfer_from."""
    import torch

    from genomics_lm_tpu.training import checkpoints as ckpt_lib
    from genomics_lm_tpu.utils import torch_bridge

    torch.manual_seed(seed)
    ref_model = torch_bridge.build_reference_model(model_cfg)
    state = {k: v.detach().clone() for k, v in ref_model.state_dict().items()}

    torch_init = workdir / "shared_init.pt"
    torch.save({"model": state, "cfg": {"itos_path": str(itos_path)}}, torch_init)

    params = torch_bridge.torch_state_to_jax(state, model_cfg)
    itos = [ln.strip() for ln in itos_path.read_text().splitlines() if ln.strip()]
    jax_init_dir = workdir / "shared_init_jax" / "checkpoints"
    jax_init_dir.mkdir(parents=True, exist_ok=True)
    jax_init = jax_init_dir / "init.npz"
    ckpt_lib.save_checkpoint({"model": params, "cfg": {"itos": itos}}, jax_init)
    return torch_init, jax_init, state


def _matched_config(dataset_dir: Path, block_size: int, args) -> dict:
    """The hyperparameters both trainers share (framework keys added later)."""
    return {
        "block_size": block_size,
        "vocab_size": 68,
        "n_layer": args.n_layer,
        "n_head": args.n_head,
        "n_embd": args.n_embd,
        "dropout": 0.0,          # no per-step noise: the gate is 0.5%
        "label_smoothing": 0.0,  # val NLL comparable to Markov baselines
        "tie_embeddings": True,
        "batch_size": args.batch_size,
        "grad_accum_steps": args.grad_accum,
        "lr": args.lr,
        "lr_embedding": args.lr,  # one param group on both sides
        "min_lr": args.lr / 10.0,
        "weight_decay": 0.05,
        "warmup_steps": args.warmup_steps,
        "optimizer": "adamw",
        "scheduler": "cosine",
        "epochs": args.epochs,
        "seed": args.seed,
        "dataloader_seed": args.seed,
        "early_stop_patience": 0,
        "eos_loss_weight": 1.0,
        "itos_path": str(dataset_dir / "itos.txt"),
    }


def train_reference(workdir: Path, dataset_dir: Path, shared: dict,
                    torch_init: Path, *, ref_root: Path,
                    timeout_s: int = 14400) -> dict:
    """Run the actual reference trainer as a subprocess (torch CPU).

    Resumable: when the reference workspace already holds a ``last.pt``
    (e.g. a prior invocation hit ``timeout_s`` mid-run at a large model
    size), the subprocess resumes through the reference's own resume
    protocol instead of restarting from the transplanted init — the
    prep stages are seed-deterministic, so the rerun's dataset/config
    fingerprints match what the checkpoint recorded.
    """
    import yaml

    ws = workdir / "ref_ws"
    ws.mkdir(parents=True, exist_ok=True)
    cfg = dict(shared)
    cfg.update({
        "device": "cpu",
        "force_gpu": False,
        "amp": False,
        "use_sdpa": False,
        "compile": False,
        "use_checkpoint": False,
        "use_mmap": False,
        "bucket_batching": False,
        "num_workers": 0,
        "pin_memory": False,
    })
    cfg_path = ws / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))
    block = shared["block_size"]
    cmd = [
        sys.executable, "-m", "src.codonlm.train_codon_lm",
        "--config", str(cfg_path),
        "--train_npz", str(dataset_dir / f"train_bs{block}.npz"),
        "--val_npz", str(dataset_dir / f"val_bs{block}.npz"),
        "--test_npz", str(dataset_dir / f"test_bs{block}.npz"),
        "--run_id", "equivalence-ref",
    ]
    run_dir = ws / "runs" / "equivalence-ref"
    prior_last = run_dir / "checkpoints" / "last.pt"
    prior_cfg_path = run_dir / "checkpoints" / "config.yaml"
    resume = False
    if prior_last.exists() and prior_cfg_path.exists():
        # resume is only valid when the prior run trained THIS config —
        # a rerun with changed model/training args must retrain, not
        # silently continue the old config's checkpoint
        prior_cfg = yaml.safe_load(prior_cfg_path.read_text()) or {}
        resume = all(prior_cfg.get(k) == v for k, v in cfg.items())
    if prior_last.exists() and not resume:
        print("      prior reference run has a different config; retraining")
        shutil.rmtree(run_dir)
    if resume:
        print(f"      resuming reference trainer from {prior_last}")
        cmd += ["--resume", str(prior_last)]
    else:
        cmd += ["--transfer_from", str(torch_init)]
    env = dict(os.environ)
    env["PYTHONPATH"] = str(ref_root)
    env.pop("JAX_PLATFORMS", None)
    result = subprocess.run(
        cmd, cwd=ws, env=env, capture_output=True, text=True, timeout=timeout_s
    )
    if result.returncode != 0:
        raise RuntimeError(
            "reference trainer failed:\n"
            f"STDOUT tail: {result.stdout[-3000:]}\nSTDERR tail: {result.stderr[-3000:]}"
        )
    run_dir = ws / "runs" / "equivalence-ref"
    curves = list(csv.DictReader((run_dir / "scores" / "curves.csv").open()))
    final = curves[-1]
    val_key = next(k for k in ("val_loss", "val") if k in final)
    return {
        "run_dir": run_dir,
        "last_pt": run_dir / "checkpoints" / "last.pt",
        "logged_final_val": float(final[val_key]),
        "epochs_logged": len(curves),
    }


def train_repo(workdir: Path, dataset_dir: Path, shared: dict,
               jax_init: Path) -> dict:
    """Run this framework's production trainer in-process."""
    from genomics_lm_tpu.training.loop import run_training

    block = shared["block_size"]
    cfg = dict(shared)
    cfg.update({
        "train_npz": str(dataset_dir / f"train_bs{block}.npz"),
        "val_npz": str(dataset_dir / f"val_bs{block}.npz"),
        "run_id": "equivalence-repo",
        "compute_dtype": "float32",  # the reference trains fp32 on CPU
        "attention_impl": "xla",
        "use_checkpoint": False,
        "use_mmap_dataset": False,
    })
    run_root = workdir / "repo_runs"
    meta = run_training(cfg, run_root=run_root, transfer_from=str(jax_init))
    run_dir = run_root / "equivalence-repo"
    return {"run_dir": run_dir, "meta": meta,
            "last_npz": run_dir / "checkpoints" / "last.npz"}


def unified_eval(ref_out: dict, repo_out: dict, dataset_dir: Path,
                 model_cfg, block_size: int) -> dict:
    """Judge both final checkpoints under ONE evaluator (this repo's)."""
    import torch

    from genomics_lm_tpu.evals.embeddings import extract_embeddings
    from genomics_lm_tpu.evals.markov import evaluate_baselines, fit_baselines
    from genomics_lm_tpu.evals.perplexity import evaluate_perplexity
    from genomics_lm_tpu.tokenizers.codon import SEP_ID
    from genomics_lm_tpu.training import checkpoints as ckpt_lib
    from genomics_lm_tpu.utils import torch_bridge

    val_npz = dataset_dir / f"val_bs{block_size}.npz"

    ref_payload = torch.load(ref_out["last_pt"], map_location="cpu",
                             weights_only=False)
    ref_state = ref_payload["model"]
    ref_params = torch_bridge.torch_state_to_jax(ref_state, model_cfg)
    repo_params = ckpt_lib.load_checkpoint(repo_out["last_npz"])["model"]

    ref_eval = evaluate_perplexity(ref_params, model_cfg, val_npz)
    repo_eval = evaluate_perplexity(repo_params, model_cfg, val_npz)

    with np.load(dataset_dir / f"train_bs{block_size}.npz") as z:
        train_x, train_y = z["X"], z["Y"]
    with np.load(val_npz) as z:
        val_x, val_y = z["X"], z["Y"]
    counts = fit_baselines(train_x, train_y, 68,
                           reset_token_ids=frozenset({SEP_ID}))
    baselines, _, best_name = evaluate_baselines(
        val_x, val_y, counts, 68, reset_token_ids=frozenset({SEP_ID})
    )

    # probe embeddings from the TRANSPLANTED reference checkpoint:
    # torch forward_hidden + mean-nonpad pooling vs this repo's extractor
    rows = val_x[:64]
    torch_model = torch_bridge.build_reference_model(model_cfg)
    torch_model.load_state_dict(ref_state)
    torch_model.eval()
    with torch.no_grad():
        hid = torch_model.forward_hidden(torch.from_numpy(rows.astype(np.int64)))
        mask = torch.from_numpy((rows != 0).astype(np.float32))[:, :, None]
        torch_pool = ((hid * mask).sum(1) / mask.sum(1).clamp(min=1.0)).numpy()
    jax_pool = extract_embeddings(ref_params, model_cfg, rows,
                                  mode="mean_nonpad")

    emb_max_abs = float(np.max(np.abs(torch_pool - jax_pool)))
    # scale-relative: reduction order differs between backends/XLA configs,
    # so fp32 round-off grows with the activations' magnitude
    emb_scale = float(max(np.max(np.abs(torch_pool)), 1.0))
    emb_rel = emb_max_abs / emb_scale
    denom = np.linalg.norm(torch_pool, axis=1) * np.linalg.norm(jax_pool, axis=1)
    emb_min_cos = float(np.min(
        (torch_pool * jax_pool).sum(axis=1) / np.maximum(denom, 1e-12)
    ))

    margins = {}
    for name, metrics in baselines.items():
        b = metrics["cross_entropy_nats"]
        margins[name] = {
            "baseline_nll": b,
            "ref_margin": b - ref_eval["nll"],
            "repo_margin": b - repo_eval["nll"],
            "same_side": (ref_eval["nll"] < b) == (repo_eval["nll"] < b),
        }

    rel_diff = abs(repo_eval["nll"] - ref_eval["nll"]) / ref_eval["nll"]
    # the reference logs the unweighted mean of per-microbatch mean losses;
    # the unified evaluator is token-weighted — compare relatively
    chain_rel = (abs(ref_out["logged_final_val"] - ref_eval["nll"])
                 / ref_eval["nll"])
    gates = {
        "chain_ref_logged_vs_transplant_eval": chain_rel <= 5e-3,
        "val_nll_within_half_percent": rel_diff < 0.005,
        "markov_margins_same_side": all(m["same_side"] for m in margins.values()),
        "both_beat_unigram": (
            ref_eval["nll"] < baselines["Unigram"]["cross_entropy_nats"]
            and repo_eval["nll"] < baselines["Unigram"]["cross_entropy_nats"]
        ),
        "probe_embeddings_identical": emb_rel <= 5e-4 and emb_min_cos >= 1 - 1e-6,
    }
    return {
        "reference": {"val_nll": ref_eval["nll"], "val_ppl": ref_eval["perplexity"],
                      "logged_final_val": ref_out["logged_final_val"],
                      "transplant_chain_rel_diff": chain_rel},
        "repo": {"val_nll": repo_eval["nll"], "val_ppl": repo_eval["perplexity"]},
        "val_nll_rel_diff": rel_diff,
        "tolerance": 0.005,
        "markov_baselines": margins,
        "best_simple_baseline": best_name,
        "probe_embeddings": {"max_abs_diff": emb_max_abs, "rel_diff": emb_rel,
                             "min_cosine": emb_min_cos,
                             "rows": int(rows.shape[0])},
        "gates": gates,
        "all_gates_pass": all(gates.values()),
        "eval_tokens": ref_eval["tokens"],
    }


def run_equivalence(args) -> dict:
    import jax

    from genomics_lm_tpu.models.config import CodonGPTConfig
    from genomics_lm_tpu.utils.torch_bridge import reference_root

    # the repo side may run on any backend (TPU included — the gate then
    # additionally proves cross-HARDWARE equivalence vs the torch-CPU
    # reference); pin full-f32 matmuls so TPU fp32 doesn't silently drop
    # to bf16 passes and eat the 0.5% budget
    jax.config.update("jax_default_matmul_precision", "highest")

    # absolute: the reference subprocess runs with cwd inside the workdir,
    # so relative --workdir values would otherwise break its --config path
    workdir = Path(args.workdir).resolve()
    if workdir.exists() and args.fresh:
        shutil.rmtree(workdir)
    workdir.mkdir(parents=True, exist_ok=True)

    print(f"[1/5] frozen dataset ({args.genes} genes, block {args.block_size})")
    dataset_dir = build_frozen_dataset(
        workdir, genes=args.genes, block_size=args.block_size, seed=args.seed
    )
    shared = _matched_config(dataset_dir, args.block_size, args)
    model_cfg = CodonGPTConfig.from_run_config(dict(shared))

    print("[2/5] shared transplanted init")
    torch_init, jax_init, _ = make_shared_init(
        workdir, model_cfg, args.seed, dataset_dir / "itos.txt"
    )

    print("[3/5] reference trainer (torch CPU subprocess)")
    ref_out = train_reference(workdir, dataset_dir, shared, torch_init,
                              ref_root=reference_root(),
                              timeout_s=int(getattr(args, "ref_timeout", 14400)))
    print(f"      logged final val: {ref_out['logged_final_val']:.6f} "
          f"({ref_out['epochs_logged']} epochs)")

    print("[4/5] this framework's trainer")
    repo_out = train_repo(workdir, dataset_dir, shared, jax_init)

    print("[5/5] unified evaluation")
    report = unified_eval(ref_out, repo_out, dataset_dir, model_cfg,
                          args.block_size)
    report["config"] = {k: v for k, v in shared.items() if k != "itos_path"}
    report["corpus"] = {"genes": args.genes, "seed": args.seed}

    out_path = workdir / "equivalence_report.json"
    out_path.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps({k: report[k] for k in
                      ("reference", "repo", "val_nll_rel_diff",
                       "probe_embeddings", "gates", "all_gates_pass")},
                     indent=2))
    print(f"report: {out_path}")
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="outputs/equivalence")
    ap.add_argument("--genes", type=int, default=660)
    ap.add_argument("--block_size", type=int, default=256)
    ap.add_argument("--n_layer", type=int, default=4)
    ap.add_argument("--n_head", type=int, default=4)
    ap.add_argument("--n_embd", type=int, default=128)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--grad_accum", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--warmup_steps", type=int, default=20)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--seed", type=int, default=1337)
    ap.add_argument("--fresh", action="store_true",
                    help="delete the workdir before running")
    ap.add_argument("--ref_timeout", type=int, default=14400,
                    help="seconds allowed for the reference torch-CPU "
                         "subprocess (resumes from its last.pt on rerun)")
    args = ap.parse_args(argv)
    report = run_equivalence(args)
    return 0 if report["all_gates_pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
