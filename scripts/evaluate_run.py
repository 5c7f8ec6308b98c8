#!/usr/bin/env python3
"""Orchestrate standard evaluation tracks for a run
(reference evaluate_run.py — quick/medium/full modes).

quick  : test perplexity + sanity KPIs
medium : quick + structural-regression probe + termination-head eval
full   : medium + zero-shot mutation benchmark + gene-essentiality benchmark
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT, resolve_run_dir  # noqa: E402


def run_cmd(script: str, *argv: str) -> bool:
    cmd = [sys.executable, str(REPO_ROOT / "scripts" / script), *argv]
    print(f"[evaluate_run] {' '.join(cmd)}", flush=True)
    return subprocess.run(cmd).returncode == 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--mode", choices=["quick", "medium", "full"], default="quick")
    ap.add_argument("--npz", required=True, help="held-out packed split")
    ap.add_argument("--dms_csv", default=None, help="DMS file for full mode")
    ap.add_argument("--dms_dna", default=None, help="wild-type DNA for the DMS benchmark")
    ap.add_argument("--essentiality_csv", default=None)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    tracks: list[tuple[str, list[str]]] = [
        ("evaluate_test.py", [str(run_dir), "--test_npz", args.npz]),
        ("sanity_kpis.py", [str(run_dir), "--val_npz", args.npz]),
    ]
    if args.mode in ("medium", "full"):
        tracks.append(("probe_structural_regression.py", [str(run_dir)]))
        tracks.append(("evaluate_termination_head.py",
                       [str(run_dir), "--npz", args.npz]))
    if args.mode == "full":
        if args.dms_csv and args.dms_dna:
            tracks.append(("benchmark_zero_shot_mutations.py",
                           [str(run_dir), "--dms_csv", args.dms_csv,
                            "--dna", args.dms_dna]))
        if args.essentiality_csv:
            tracks.append(("benchmark_gene_essentiality.py",
                           [str(run_dir), "--genes_csv", args.essentiality_csv]))

    results = {script: run_cmd(script, *track_args) for script, track_args in tracks}
    report = {
        "run_id": run_dir.name,
        "mode": args.mode,
        "tracks": results,
        "all_passed": all(results.values()),
    }
    scores = run_dir / "scores"
    scores.mkdir(parents=True, exist_ok=True)
    (scores / "evaluate_run.json").write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0 if report["all_passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
