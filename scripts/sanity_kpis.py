#!/usr/bin/env python3
"""Sanity KPI bundle for a trained run (reference sanity_kpis.py).

Quick invariants: PPL beats uniform, curves monotone-ish, checkpoint loads,
generation produces codons, embeddings finite — one JSON verdict.
"""

from __future__ import annotations

import argparse
import json
import math
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--val_npz", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.evals.embeddings import extract_embeddings, ids_from_dna
    from genomics_lm_tpu.evals.perplexity import evaluate_perplexity
    from genomics_lm_tpu.evals.playground import (
        dna_to_context_ids,
        load_codon_model,
        make_decoder,
    )
    from genomics_lm_tpu.generation import constrained as gen

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    checks = {}

    params, cfg, itos, stoi = load_codon_model(run_dir)
    cfg = cfg.replace(dropout=0.0)
    checks["checkpoint_loads"] = True

    ppl = evaluate_perplexity(params, cfg, args.val_npz, batch_size=32)
    uniform_ppl = float(len(itos) - 1)
    checks["val_perplexity"] = ppl["perplexity"]
    checks["beats_uniform"] = ppl["perplexity"] < uniform_ppl

    curves_path = run_dir / "scores" / "curves.csv"
    if curves_path.exists():
        rows = curves_path.read_text().strip().splitlines()[1:]
        vals = [float(r.split(",")[2]) for r in rows if r]
        checks["curve_epochs"] = len(vals)
        checks["final_val_not_worst"] = (not vals) or vals[-1] <= max(vals)

    decoder, _, _ = make_decoder(run_dir)
    ids, info = gen.generate_cds_constrained(
        decoder, dna_to_context_ids("ATG", stoi), stoi, itos,
        target_codons=4, hard_cap=8, rng=np.random.default_rng(0),
    )
    checks["generation_emits_codons"] = info["generated_codons"] > 0

    emb = extract_embeddings(
        params, cfg, np.stack([ids_from_dna("ATGAAATAA", cfg.block_size)])
    )
    checks["embeddings_finite"] = bool(np.isfinite(emb).all())

    verdict = all(v for k, v in checks.items() if isinstance(v, bool))
    report = {"checks": checks, "passed": verdict}
    out = Path(args.out) if args.out else run_dir / "scores" / "sanity_kpis.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0 if verdict else 1


if __name__ == "__main__":
    raise SystemExit(main())
