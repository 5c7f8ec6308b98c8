#!/usr/bin/env python3
"""MoE-vs-dense benchmark: quality at matched step budget + d512 throughput.

The MoE layer (``models/codon_gpt.py::_moe_mlp``, beyond reference scope)
ships with routing/EP parity tests but no quality or flagship-tier cost
evidence. This gives it both, under the repo's standard protocols:

* **quality** — dense and top-k-routed variants train on one frozen demo
  corpus (same packed arrays, same seed/schedule/steps — only the MLP
  differs), then both final checkpoints are judged by the shared exact
  evaluator (``evals/perplexity.py``) on the val and test splits, with
  the Markov count baselines (``evals/markov.py``) as the quality floor —
  the same floor the reference holds its LMs to
  (``/root/reference/docs/PERPLEXITY_BASELINES.md`` protocol).
* **throughput** — the flagship 12L8H d512 tier, dense vs MoE variants,
  each in an OOM-isolated subprocess (reference
  ``optimize_train_batching.py`` protocol via
  ``benchmark_training_speed.run_candidate_subprocess``). Single-chip
  numbers have experts REPLICATED: the per-chip cost shown here is what
  expert parallelism (``parallel/sharding.py::moe_param_sharding``)
  reclaims by sharding the E axis over the model mesh axis.

    python scripts/benchmark_moe.py --out docs/benchmarks/moe_benchmark.json

Writes one JSON artifact with both sections; either can be skipped.
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
from scripts.benchmark_training_speed import run_candidate_subprocess  # noqa: E402

D512_MODEL = {
    "vocab_size": 68, "block_size": 512, "n_layer": 12, "n_head": 8,
    "n_embd": 512, "dropout": 0.1, "label_smoothing": 0.05, "sep_id": 3,
    "tie_embeddings": True, "attention_impl": "flash",
    "compute_dtype": "bfloat16", "fused_qkv": True,
    "flash_block_q": 512, "flash_block_k": 512, "use_checkpoint": False,
}


def quality_variants(experts: int):
    """(name, extra model cfg) — identical training budget, only MLP differs."""
    return [
        ("dense", {}),
        (f"moe_{experts}e_top1", {"moe_experts": experts, "moe_top_k": 1}),
        (f"moe_{experts}e_top2", {"moe_experts": experts, "moe_top_k": 2}),
    ]


def build_dataset(workdir: Path, *, genes: int, block_size: int, seed: int) -> Path:
    from scripts.make_demo_corpus import main as make_corpus
    from genomics_lm_tpu.data.pipeline import prepare_dataset

    records_tsv = workdir / "records.tsv"
    records_tsv.parent.mkdir(parents=True, exist_ok=True)
    make_corpus(["--out", str(records_tsv), "--genes", str(genes),
                 "--seed", str(seed)])
    import csv

    with records_tsv.open() as f:
        records = [dict(r) for r in csv.DictReader(f, delimiter="\t")]
    dataset_dir = workdir / "dataset"
    prepare_dataset(records, dataset_dir, block_size=block_size,
                    pack_mode="multi", group_by="genome", split_seed=seed,
                    skip_homology=True, audit_engine="native")
    return dataset_dir


def run_quality(args, *, epochs: int | None = None,
                run_prefix: str = "moe-quality") -> dict:
    """One full dense-vs-MoE quality pass at a given epoch budget.

    Called twice by ``main``: at the mid-budget (``--epochs``, where the
    per-step convergence advantage shows) and at the converged budget
    (``--converged_epochs``, where the demo corpus saturates to parity) —
    both sections of the committed artifact regenerate from the defaults.
    """
    import numpy as np

    from genomics_lm_tpu.evals.markov import evaluate_baselines, fit_baselines
    from genomics_lm_tpu.evals.perplexity import evaluate_perplexity
    from genomics_lm_tpu.models.config import CodonGPTConfig
    from genomics_lm_tpu.tokenizers.codon import SEP_ID
    from genomics_lm_tpu.training import checkpoints as ckpt_lib
    from genomics_lm_tpu.training.loop import run_training

    epochs = args.epochs if epochs is None else epochs
    workdir = Path(args.workdir)
    dataset_dir = build_dataset(workdir, genes=args.genes,
                                block_size=args.block_size, seed=args.seed)
    block = args.block_size
    shared_cfg = {
        "train_npz": str(dataset_dir / f"train_bs{block}.npz"),
        "val_npz": str(dataset_dir / f"val_bs{block}.npz"),
        "block_size": block,
        "vocab_size": 68,
        "n_layer": args.n_layer,
        "n_head": args.n_head,
        "n_embd": args.n_embd,
        # no per-step noise: the deltas under judgment are a few percent
        "dropout": 0.0,
        "label_smoothing": 0.0,  # val NLL comparable to Markov baselines
        "tie_embeddings": True,
        "batch_size": args.batch_size,
        "grad_accum_steps": args.grad_accum,
        "lr": args.lr,
        "min_lr": args.lr / 10.0,
        "weight_decay": 0.05,
        "warmup_steps": args.warmup_steps,
        "optimizer": "adamw",
        "scheduler": "cosine",
        "epochs": epochs,
        "seed": args.seed,
        "dataloader_seed": args.seed,
        "early_stop_patience": 0,
        "itos_path": str(dataset_dir / "itos.txt"),
        "use_mmap_dataset": False,
    }

    # quality floor: the count baselines both model families must beat
    with np.load(dataset_dir / f"train_bs{block}.npz") as z:
        train_x, train_y = z["X"], z["Y"]
    with np.load(dataset_dir / f"val_bs{block}.npz") as z:
        val_x, val_y = z["X"], z["Y"]
    counts = fit_baselines(train_x, train_y, 68,
                           reset_token_ids=frozenset({SEP_ID}))
    baselines, _, _ = evaluate_baselines(val_x, val_y, counts, 68,
                                         reset_token_ids=frozenset({SEP_ID}))

    rows = []
    for name, extra in quality_variants(args.experts):
        cfg = dict(shared_cfg)
        cfg.update(extra)
        cfg["run_id"] = f"{run_prefix}-{name}"
        print(f"[{run_prefix}] training {name} (epochs={epochs}) ...", flush=True)
        t0 = time.perf_counter()
        meta = run_training(cfg, run_root=workdir / "runs")
        wall = time.perf_counter() - t0
        last = workdir / "runs" / cfg["run_id"] / "checkpoints" / "last.npz"
        params = ckpt_lib.load_checkpoint(last)["model"]
        model_cfg = CodonGPTConfig.from_run_config(cfg)
        evals = {
            split: evaluate_perplexity(
                params, model_cfg, dataset_dir / f"{split}_bs{block}.npz")
            for split in ("val", "test")
        }
        row = {
            "name": name,
            "moe": extra or None,
            "n_params": meta["n_params"],
            "best_val_loss": meta["best_val_loss"],
            "train_wall_sec": meta["train_wall_sec"],
            "wall_sec_total": round(wall, 2),
            "val_nll": evals["val"]["nll"],
            "val_ppl": evals["val"]["perplexity"],
            "test_nll": evals["test"]["nll"],
            "test_ppl": evals["test"]["perplexity"],
            "beats_all_markov_baselines": bool(
                evals["val"]["nll"]
                < min(b["cross_entropy_nats"] for b in baselines.values())
            ),
        }
        print(f"[moe-quality]   -> val ppl {row['val_ppl']:.3f} "
              f"test ppl {row['test_ppl']:.3f} "
              f"({row['n_params']:,} params, {row['train_wall_sec']:.0f}s)",
              flush=True)
        rows.append(row)

    dense = next(r for r in rows if r["name"] == "dense")
    for r in rows:
        r["val_nll_delta_vs_dense"] = r["val_nll"] - dense["val_nll"]
    return {
        "protocol": {
            "corpus": f"make_demo_corpus genes={args.genes} seed={args.seed}",
            "budget": f"epochs={epochs} b{args.batch_size}x{args.grad_accum} "
                      f"lr={args.lr} (identical for every variant)",
            "model": f"{args.n_layer}L{args.n_head}H d{args.n_embd} "
                     f"block{block}, dropout 0, label smoothing 0",
            "evaluator": "evals/perplexity.py exact corpus NLL, shared across variants",
        },
        "markov_baselines": {
            k: v["cross_entropy_nats"] for k, v in baselines.items()
        },
        "variants": rows,
    }


def run_throughput(args) -> dict:
    rows = []
    cands = [("dense", {})]
    for top_k in (1, 2):
        cands.append((f"moe_{args.experts}e_top{top_k}",
                      {"moe_experts": args.experts, "moe_top_k": top_k,
                       "moe_capacity_factor": 1.25}))
    for name, extra in cands:
        model = dict(D512_MODEL)
        model.update(extra)
        spec = {"model": model, "batch_size": 8, "grad_accum": 16,
                "measure_steps": args.measure_steps, "warmup_steps": 2}
        print(f"[moe-throughput] {name} (b8x16 d512) ...", flush=True)
        res = run_candidate_subprocess(spec, timeout=args.timeout)
        row = {"name": name, "moe": extra or None, **res}
        if res.get("ok"):
            row["tok_per_sec"] = res["nonpad_tokens_per_sec"]
            print(f"[moe-throughput]   -> {row['tok_per_sec']:,.0f} tok/s",
                  flush=True)
        else:
            print(f"[moe-throughput]   -> {res.get('error')}", flush=True)
        rows.append(row)
    dense = next((r for r in rows if r["name"] == "dense" and r.get("ok")), None)
    if dense:
        for r in rows:
            if r.get("ok"):
                r["rel_to_dense"] = round(
                    r["tok_per_sec"] / dense["tok_per_sec"], 3)
    return {
        "protocol": "12L8H d512 block512 b8x16, OOM-isolated subprocess per "
                    "candidate; single chip, experts REPLICATED — see the "
                    "ep_analysis section for the measured memory and "
                    "collective structure EP reclaims",
        "candidates": rows,
    }


_HLO_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "all-to-all",
    "collective-permute",
)
_HLO_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}


def collective_bytes_from_hlo(hlo_text: str) -> dict:
    """Sum the output bytes of every collective op in a compiled HLO module.

    Wall-clock on a virtual CPU mesh is not tok/s truth, but the PARTITIONED
    PROGRAM STRUCTURE is exact: GSPMD emits the same collectives it would on
    a pod, so output-bytes-per-op is a hardware-independent measure of the
    communication each sharding choice buys.
    """
    import re

    shape_re = re.compile(r"(\w+)\[([0-9,]*)\]")
    totals = {name: 0 for name in _HLO_COLLECTIVES}
    counts = {name: 0 for name in _HLO_COLLECTIVES}
    for line in hlo_text.splitlines():
        stripped = line.strip()
        for name in _HLO_COLLECTIVES:
            # match the op as the instruction on this line (lhs = ... op(...)
            if f" {name}(" not in stripped and not stripped.startswith(f"{name}("):
                continue
            lhs = stripped.split(f" {name}(")[0]
            for dtype, dims in shape_re.findall(lhs):
                nbytes = _HLO_DTYPE_BYTES.get(dtype)
                if nbytes is None:
                    continue
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                totals[name] += n * nbytes
            counts[name] += 1
            break
    return {
        "bytes_by_op": {k: v for k, v in totals.items() if counts[k]},
        "count_by_op": {k: v for k, v in counts.items() if counts[k]},
        "total_bytes": int(sum(totals.values())),
    }


def run_ep_analysis(args) -> dict:
    """EP-sharded vs experts-replicated: exact memory + communication structure.

    Backs the throughput section's claim that expert parallelism reclaims
    the replicated-expert cost: on the virtual 8-device mesh, measure
    per-device bytes actually resident for expert weights and their AdamW
    moments (from each array's addressable shards — exact), and the
    collective bytes-moved per compiled train step (from the partitioned
    HLO — structurally exact; CPU wall-clock is deliberately NOT reported).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from genomics_lm_tpu.models import codon_gpt
    from genomics_lm_tpu.models.config import CodonGPTConfig
    from genomics_lm_tpu.parallel.mesh import make_mesh
    from genomics_lm_tpu.parallel.sharding import (
        moe_param_sharding,
        opt_state_sharding,
        zero1_opt_state_sharding,
    )
    from genomics_lm_tpu.training.train_step import LossConfig, make_train_step

    if jax.device_count() < 8:
        raise SystemExit(
            "--ep_analysis needs >= 8 devices; run with JAX_PLATFORMS=cpu "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8")

    seq = int(args.ep_seq_len)
    model = dict(D512_MODEL, block_size=seq, attention_impl="xla",
                 compute_dtype="bfloat16", dropout=0.0,
                 moe_experts=args.experts, moe_top_k=2,
                 moe_capacity_factor=1.25)
    model.pop("flash_block_q", None)
    model.pop("flash_block_k", None)
    cfg = CodonGPTConfig.from_run_config(dict(model, use_sdpa=False))
    params = codon_gpt.init(jax.random.PRNGKey(0), cfg)
    tx = optax.adamw(3e-4)
    opt_state = tx.init(params)
    step = make_train_step(cfg, LossConfig(), tx)

    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.integers(4, 68, (1, 8, seq)), jnp.int32),
        "y": jnp.asarray(rng.integers(4, 68, (1, 8, seq)), jnp.int32),
    }

    def expert_leaves(tree):
        out = []
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            names = [str(getattr(p, "key", "")) for p in path]
            shape = getattr(leaf, "shape", ())
            if "mlp" in names and len(shape) >= 2 and shape[1] == args.experts:
                out.append(leaf)
        return out

    def bytes_on_device0(leaves):
        dev0 = jax.devices()[0]
        total = 0
        for leaf in leaves:
            total += sum(s.data.nbytes for s in leaf.addressable_shards
                         if s.device == dev0)
        return int(total)

    def analyze(tag, mesh, p_shard, o_shard):
        params_s = jax.device_put(params, p_shard)
        opt_s = jax.device_put(opt_state, o_shard)
        batch_s = {
            k: jax.device_put(v, NamedSharding(mesh, P(None, "data")))
            for k, v in batch.items()
        }
        key = jax.random.key(1)
        one = jnp.asarray(1.0)
        # make_train_step returns a jitted callable — lower it directly
        hlo = step.lower(params_s, opt_s, batch_s, key, one).compile().as_text()
        return {
            "mesh": tag,
            "expert_weight_bytes_per_device": bytes_on_device0(
                expert_leaves(params_s)),
            "expert_moment_bytes_per_device": bytes_on_device0(
                expert_leaves(opt_s)),
            "total_param_bytes_per_device": bytes_on_device0(
                jax.tree.leaves(params_s)),
            "total_moment_bytes_per_device": bytes_on_device0(
                jax.tree.leaves(opt_s)),
            "collectives_per_step": collective_bytes_from_hlo(hlo),
        }

    mesh_rep = make_mesh(8, axes={"data": 8})
    rep = analyze(
        "data=8 (experts replicated, ZeRO-1)",
        mesh_rep,
        jax.tree.map(lambda _: NamedSharding(mesh_rep, P()), params),
        zero1_opt_state_sharding(opt_state, mesh_rep),
    )
    mesh_ep = make_mesh(8, axes={"data": 4, "model": 2})
    ep = analyze(
        "data=4 x model=2 (EP over model, attention TP, ZeRO-1)",
        mesh_ep,
        moe_param_sharding(params, mesh_ep, n_experts=args.experts,
                           axis="model", tp_axis="model"),
        opt_state_sharding(opt_state, mesh_ep, tp_axis="model",
                           ep_axis="model", n_experts=args.experts,
                           zero1=True),
    )

    for row in (rep, ep):
        print(f"[ep-analysis] {row['mesh']}: expert weights "
              f"{row['expert_weight_bytes_per_device']/2**20:.1f} MiB/dev, "
              f"moments {row['expert_moment_bytes_per_device']/2**20:.1f} "
              f"MiB/dev, collectives "
              f"{row['collectives_per_step']['total_bytes']/2**20:.1f} "
              f"MiB/step", flush=True)
    return {
        "protocol": (
            f"virtual 8-device mesh, {args.experts}-expert top-2 d512 MoE, "
            f"b8 seq{seq}, one compiled train step; memory from addressable "
            "shards (exact), communication from partitioned-HLO collective "
            "output bytes (structure exact; CPU wall-clock intentionally "
            "not reported)"
        ),
        "replicated": rep,
        "ep_sharded": ep,
        "expert_memory_ratio": round(
            ep["expert_weight_bytes_per_device"]
            / max(1, rep["expert_weight_bytes_per_device"]), 3),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/benchmarks/moe_benchmark.json")
    ap.add_argument("--workdir", default="outputs/moe_quality")
    ap.add_argument("--genes", type=int, default=800)
    ap.add_argument("--block_size", type=int, default=256)
    ap.add_argument("--n_layer", type=int, default=6)
    ap.add_argument("--n_head", type=int, default=4)
    ap.add_argument("--n_embd", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--grad_accum", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--converged_epochs", type=int, default=30,
                    help="second quality pass at this saturated budget "
                         "(emits quality_converged; 0 disables)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--warmup_steps", type=int, default=20)
    ap.add_argument("--seed", type=int, default=1337)
    ap.add_argument("--experts", type=int, default=4)
    ap.add_argument("--measure_steps", type=int, default=8)
    ap.add_argument("--timeout", type=float, default=1700.0)
    ap.add_argument("--skip_quality", action="store_true")
    ap.add_argument("--skip_throughput", action="store_true")
    ap.add_argument("--ep_analysis", action="store_true",
                    help="EP-vs-replicated memory + collective structure on "
                         "a virtual 8-device mesh (needs JAX_PLATFORMS=cpu "
                         "XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    ap.add_argument("--ep_seq_len", type=int, default=512)
    ap.add_argument("--merge_into", default=None,
                    help="read this existing artifact and merge new sections "
                         "into it instead of writing only the sections run")
    args = ap.parse_args(argv)

    report: dict = {}
    if args.merge_into:
        report = json.loads(Path(args.merge_into).read_text())
    if not args.skip_quality:
        report["quality"] = run_quality(args)
        if args.converged_epochs:
            report["quality_converged"] = run_quality(
                args, epochs=args.converged_epochs,
                run_prefix="moe-quality-conv")
    if not args.skip_throughput:
        report["throughput_d512"] = run_throughput(args)
    if args.ep_analysis:
        report["ep_analysis"] = run_ep_analysis(args)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(f"[moe-benchmark] wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
