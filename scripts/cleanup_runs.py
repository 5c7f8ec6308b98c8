#!/usr/bin/env python3
"""Prune stale/failed run directories (reference cleanup_runs.py)."""

from __future__ import annotations

import argparse
import json
import shutil
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="runs")
    ap.add_argument("--status", default="failed",
                    help="comma list of meta statuses to remove")
    ap.add_argument("--empty", action="store_true",
                    help="also remove runs with no checkpoints")
    ap.add_argument("--apply", action="store_true", help="actually delete")
    args = ap.parse_args(argv)

    targets = []
    statuses = set(args.status.split(","))
    root = Path(args.root)
    for run_dir in sorted(root.iterdir()) if root.exists() else []:
        if not run_dir.is_dir() or run_dir.name.startswith("_"):
            continue
        meta_path = run_dir / "checkpoints" / "meta.json"
        status = None
        if meta_path.exists():
            try:
                status = json.loads(meta_path.read_text()).get("status")
            except json.JSONDecodeError:
                status = "corrupt"
        has_ckpt = any((run_dir / "checkpoints").glob("*.npz")) if (
            run_dir / "checkpoints"
        ).exists() else False
        if status in statuses or (args.empty and not has_ckpt):
            targets.append((run_dir, status, has_ckpt))

    for run_dir, status, has_ckpt in targets:
        tag = f"status={status} checkpoints={has_ckpt}"
        if args.apply:
            shutil.rmtree(run_dir)
            print(f"[cleanup] removed {run_dir} ({tag})")
        else:
            print(f"[cleanup] would remove {run_dir} ({tag}) — pass --apply")
    if not targets:
        print("[cleanup] nothing to remove")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
