#!/usr/bin/env python3
"""Fold the top candidate per ablation configuration via ESMFold and report
pLDDT (reference fold_top_designs.py). NETWORK-GATED like
submit_esmfold_from_csv; selection logic runs offline."""

from __future__ import annotations

import argparse
import csv
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: E402
from scripts.submit_esmfold_from_csv import fold, mean_plddt  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--candidates_csv", required=True,
                    help="CSV with prefix/config, protein, critic_score columns")
    ap.add_argument("--group_column", default="prefix")
    ap.add_argument("--score_column", default="critic_score")
    ap.add_argument("--out_dir", default="outputs/folds/top_designs")
    ap.add_argument("--timeout", type=float, default=45.0)
    ap.add_argument("--dry_run", action="store_true",
                    help="select the top designs but skip the network fold")
    args = ap.parse_args(argv)

    groups: dict[str, dict] = {}
    with open(args.candidates_csv) as f:
        for row in csv.DictReader(f):
            protein = row.get("protein")
            if not protein:
                continue
            key = row.get(args.group_column) or "default"
            try:
                score = float(row.get(args.score_column) or "nan")
            except ValueError:
                score = float("-inf")
            best = groups.get(key)
            if best is None or score > best["score"]:
                groups[key] = {"row": row, "score": score, "protein": protein}

    selections = [{"group": k, "protein": v["protein"], "score": v["score"]}
                  for k, v in sorted(groups.items())]
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if args.dry_run:
        (out_dir / "top_designs.json").write_text(
            json.dumps(selections, indent=2) + "\n"
        )
        print(json.dumps({"selected": len(selections), "folded": 0,
                          "note": "dry run, no network calls"}, indent=2))
        return 0

    results, failures = [], 0
    for sel in selections:
        try:
            pdb = fold(sel["protein"], args.timeout)
        except Exception as exc:
            failures += 1
            if failures == 1:
                print(f"[fold] ESMFold API unreachable ({exc}) — rerun with "
                      "--dry_run to select without folding", file=_sys.stderr)
            if failures >= 2:
                return 2
            continue
        pdb_path = out_dir / f"{sel['group']}.pdb"
        pdb_path.write_text(pdb)
        results.append({**sel, "pdb": str(pdb_path), "mean_plddt": mean_plddt(pdb)})

    (out_dir / "top_designs.json").write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps({"selected": len(selections), "folded": len(results)},
                     indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
