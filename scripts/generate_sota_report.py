#!/usr/bin/env python3
"""Consolidate local benchmark metrics against published prokaryotic SOTA
models (reference generate_sota_report.py — Evo 1 / GenSLM / ProGen2
comparison with parameter- and compute-efficiency ratios)."""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402

# Published reference numbers for prokaryotic sequence models (Evo 1 and
# GenSLM papers; same comparison targets as the reference report).
SOTA_REFERENCES = {
    "Evo 1 (1.8B)": {
        "parameters_m": 1800.0,
        "pretrain_accelerator_hours": 3360.0,
        "protein_dms_spearman": 0.430,
        "lambda_essentiality_f1": 0.810,
    },
    "GenSLM (2.5B)": {
        "parameters_m": 2500.0,
        "pretrain_accelerator_hours": 20480.0,
        "protein_dms_spearman": 0.150,
        "lambda_essentiality_f1": 0.680,
    },
}


def _maybe(path, *keys):
    if not path.exists():
        return None
    payload = json.loads(path.read_text())
    for key in keys:
        if not isinstance(payload, dict):
            return None
        payload = payload.get(key)
    return payload


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--pretrain_hours", type=float, default=None,
                    help="local pre-training accelerator-hours, if known")
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    scores = run_dir / "scores"
    meta = {}
    meta_path = run_dir / "checkpoints" / "meta.json"
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())

    local = {
        "parameters_m": (meta.get("n_params") or 0) / 1e6 or None,
        "pretrain_accelerator_hours": args.pretrain_hours,
        "protein_dms_spearman": _maybe(scores / "zero_shot_mutations.json",
                                       "spearman"),
        "lambda_essentiality_f1": _maybe(scores / "gene_essentiality.json", "f1"),
        "test_perplexity": meta.get("last_perplexity")
        or _maybe(scores / "test_eval.json", "perplexity"),
    }

    comparisons = {}
    for name, ref in SOTA_REFERENCES.items():
        entry = {}
        if local["parameters_m"] and ref["parameters_m"]:
            entry["parameter_ratio"] = ref["parameters_m"] / local["parameters_m"]
        if local["pretrain_accelerator_hours"] and ref["pretrain_accelerator_hours"]:
            entry["compute_ratio"] = (
                ref["pretrain_accelerator_hours"] / local["pretrain_accelerator_hours"]
            )
        for metric in ("protein_dms_spearman", "lambda_essentiality_f1"):
            if local.get(metric) is not None:
                entry[f"{metric}_gap"] = local[metric] - ref[metric]
                if entry.get("parameter_ratio"):
                    entry[f"{metric}_per_param_advantage"] = (
                        (local[metric] / ref[metric]) * entry["parameter_ratio"]
                        if ref[metric] else None
                    )
        comparisons[name] = entry

    report = {"run_id": run_dir.name, "local": local,
              "sota_references": SOTA_REFERENCES, "comparisons": comparisons}
    scores.mkdir(parents=True, exist_ok=True)
    (scores / "sota_report.json").write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
