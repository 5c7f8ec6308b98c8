#!/usr/bin/env python3
"""Manifest-bound intrinsic evaluation: val/test NLL/PPL + Markov baselines.

Parity: reference ``scripts/evaluate_test.py`` + ``scripts/eval_ppl_baselines.py``
— exact token-weighted corpus NLL/PPL on frozen splits, uniform/unigram/
bigram/trigram comparison with <SEP> history reset, optional context-window
ablation, JSON report.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--test_npz", required=True)
    ap.add_argument("--train_npz", default=None,
                    help="fit Markov baselines on this split")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--alpha", type=float, default=0.01)
    ap.add_argument("--context_ablation", action="store_true")
    ap.add_argument("--bootstrap", type=int, default=0, metavar="N",
                    help="paired bootstrap resamples for CIs on every "
                         "model-vs-baseline margin (needs --train_npz; "
                         "0 disables)")
    ap.add_argument("--bootstrap_seed", type=int, default=0)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--run_root", default="runs")
    ap.add_argument("--out", default=None)
    ap.add_argument("--dataset_manifest", default=None,
                    help="frozen dataset manifest to bind this evaluation to")
    ap.add_argument("--require_scientific_valid", action="store_true",
                    help="fail unless the manifest is marked scientific_valid "
                         "and matches the checkpoint's dataset id")
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.data.datasets import PackedDataset
    from genomics_lm_tpu.evals import markov
    from genomics_lm_tpu.evals.perplexity import context_ablation, evaluate_perplexity
    from genomics_lm_tpu.evals.playground import load_codon_model

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    params, cfg, itos, stoi = load_codon_model(run_dir, args.checkpoint)
    cfg = cfg.replace(dropout=0.0)

    provenance_block = None
    if args.dataset_manifest or args.require_scientific_valid:
        from genomics_lm_tpu.evals.playground import resolve_checkpoint
        from genomics_lm_tpu.training.checkpoints import load_checkpoint_meta
        from genomics_lm_tpu.evals.provenance import (
            EvaluationProvenanceError,
            bind_checkpoint_dataset,
            bind_dataset_manifest,
        )

        if not args.dataset_manifest:
            raise EvaluationProvenanceError(
                "--require_scientific_valid needs --dataset_manifest"
            )
        _, manifest_prov = bind_dataset_manifest(
            args.dataset_manifest,
            expected_artifacts={"test_tokens": args.test_npz},
            require_scientific=args.require_scientific_valid,
        )
        # metadata-only read — the weights were already loaded above
        ckpt_cfg = dict(
            load_checkpoint_meta(
                resolve_checkpoint(run_dir, args.checkpoint)
            ).get("cfg", {})
        )
        provenance_block = {
            "dataset_manifest": manifest_prov,
            "checkpoint_dataset": bind_checkpoint_dataset(ckpt_cfg, manifest_prov),
        }

    report = {
        "run_id": run_dir.name,
        "test_npz": str(args.test_npz),
        "model": evaluate_perplexity(
            params, cfg, args.test_npz, batch_size=args.batch_size
        ),
    }
    if args.train_npz:
        train_ds = PackedDataset(args.train_npz)
        test_ds = PackedDataset(args.test_npz)

        def xy(ds):
            xs, ys = [], []
            for i in range(0, len(ds), 512):
                x, y = ds.fetch_batch(list(range(i, min(i + 512, len(ds)))))
                xs.append(x)
                ys.append(y)
            return np.concatenate(xs), np.concatenate(ys)

        reset_ids = frozenset(
            i for i, tok in enumerate(itos) if tok == "<SEP>"
        )
        counts = markov.fit_baselines(
            *xy(train_ds), len(itos), args.alpha, reset_token_ids=reset_ids
        )
        results, tokens, best = markov.evaluate_baselines(
            *xy(test_ds), counts, len(itos), args.alpha, reset_token_ids=reset_ids
        )
        report["baselines"] = results
        report["baseline_tokens"] = tokens
        report["best_simple_model"] = best
        report["beats_best_simple"] = (
            report["model"]["nll"] < results[best]["cross_entropy_nats"]
        )
        if args.bootstrap:
            from genomics_lm_tpu.evals.markov import per_row_baseline_nll
            from genomics_lm_tpu.evals.perplexity import per_row_model_nll
            from genomics_lm_tpu.evals.significance import (
                paired_bootstrap_margins,
            )

            model_rows, tokens_rows = per_row_model_nll(
                params, cfg, test_ds, batch_size=args.batch_size
            )
            base_rows, base_tokens_rows = per_row_baseline_nll(
                *xy(test_ds), counts, len(itos), args.alpha,
                reset_token_ids=reset_ids,
            )
            if not np.array_equal(tokens_rows, base_tokens_rows):
                raise RuntimeError(
                    "model/baseline per-row token counts disagree — the "
                    "paired bootstrap would be misaligned"
                )
            report["margins"] = paired_bootstrap_margins(
                model_rows, tokens_rows, base_rows,
                n_boot=args.bootstrap, seed=args.bootstrap_seed,
            )
            report["margins_protocol"] = (
                f"paired bootstrap over {int((tokens_rows > 0).sum())} packed "
                f"rows ({int(tokens_rows.sum())} non-PAD tokens), "
                f"{args.bootstrap} resamples, seed {args.bootstrap_seed}; "
                "margin = baseline - model corpus NLL (nats/token, "
                "positive = model better)"
            )
    if args.context_ablation:
        report["context_ablation"] = context_ablation(
            params, cfg, args.test_npz, batch_size=args.batch_size
        )
    if provenance_block is not None:
        report["provenance"] = provenance_block

    out_path = Path(args.out) if args.out else run_dir / "scores" / "test_evaluation.json"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report["model"], indent=2))
    if "baselines" in report:
        print("best simple model:", report["best_simple_model"],
              "| model beats it:", report["beats_best_simple"])
    for name, m in report.get("margins", {}).items():
        print(f"margin vs {name}: {m['margin_nats']:+.4f} nats "
              f"[{m['ci_low']:+.4f}, {m['ci_high']:+.4f}] "
              f"{'EXCLUDES 0' if m['excludes_zero'] else 'includes 0'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
