#!/usr/bin/env python3
"""Probe next-token predictions for fixed genomic prefixes
(reference probe_next_token.py:1-60 — PREFIXES ATG / ATG-AAA / ATG-GAA / TAA).

With ``--npz`` the script additionally reports held-out top-1/top-5 accuracy
(the analysis-pipeline step 4 metric).
"""

from __future__ import annotations

import argparse
import csv
import json
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402

PREFIXES = ["ATG", "ATG-AAA", "ATG-GAA", "TAA"]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--prefixes", default=",".join(PREFIXES))
    ap.add_argument("--topk", type=int, default=5)
    ap.add_argument("--npz", default=None, help="held-out split for accuracy probe")
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.evals.playground import (
        dna_to_context_ids,
        make_decoder,
        query_next_codon,
    )

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    decoder, itos, stoi = make_decoder(run_dir)

    rows = []
    for prefix in args.prefixes.split(","):
        ids = dna_to_context_ids(prefix.replace("-", ""), stoi)
        top = query_next_codon(decoder, ids, itos, top_k=args.topk)
        for rank, entry in enumerate(top, start=1):
            rows.append({"prefix": prefix, "rank": rank,
                         "token": entry["token"],
                         "prob": round(float(entry["prob"]), 6)})
    tables = run_dir / "tables"
    tables.mkdir(parents=True, exist_ok=True)
    with (tables / "next_token_probes.csv").open("w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["prefix", "rank", "token", "prob"])
        writer.writeheader()
        writer.writerows(rows)
    report = {"prefixes": rows}

    if args.npz:
        from genomics_lm_tpu.data.datasets import PackedDataset
        from genomics_lm_tpu.evals.analysis import probe_next_token
        from genomics_lm_tpu.evals.playground import load_codon_model

        params, cfg, _, _ = load_codon_model(run_dir)
        report["accuracy"] = probe_next_token(
            params, cfg.replace(dropout=0.0), PackedDataset(args.npz), tables
        )
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
