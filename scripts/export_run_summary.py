#!/usr/bin/env python3
"""Bundle a run's analysis outputs into one summary (reference export_run_summary)."""

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

    from genomics_lm_tpu.evals.analysis import export_run_summary

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    # Collect any analysis artifacts already present in tables/
    steps = {}
    tables = run_dir / "tables"
    for name in ("frequencies", "next_token_probe", "saliency"):
        path = tables / f"{name}.json"
        if path.exists():
            payload = json.loads(path.read_text())
            steps[name] = payload if isinstance(payload, dict) else {"rows": len(payload)}
    for path in sorted((run_dir / "scores").glob("*.json")) if (run_dir / "scores").is_dir() else []:
        try:
            steps[f"scores/{path.stem}"] = json.loads(path.read_text())
        except json.JSONDecodeError:
            continue
    out = export_run_summary(run_dir, steps, tables)
    print(json.dumps({"summary": str(out), "sections": sorted(steps)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
