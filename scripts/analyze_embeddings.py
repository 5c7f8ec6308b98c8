#!/usr/bin/env python3
"""Token-embedding PCA chart for a run (reference analyze_embeddings.py)."""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.evals.analysis import analyze_embeddings
    from genomics_lm_tpu.evals.playground import load_codon_model

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    params, _, itos, _ = load_codon_model(run_dir)
    report = analyze_embeddings(params, run_dir / "charts", itos)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
