#!/usr/bin/env python3
"""Submit protein sequences from a CSV to the public ESMFold API
(reference submit_esmfold_from_csv.py). NETWORK-GATED: exits 2 with a clear
message when the fold API is unreachable."""

from __future__ import annotations

import argparse
import csv
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402

ESMFOLD_URL = "https://api.esmatlas.com/foldSequence/v1/pdb/"


def fold(sequence: str, timeout: float) -> str:
    import urllib.request

    req = urllib.request.Request(ESMFOLD_URL, data=sequence.encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.read().decode()


def mean_plddt(pdb_text: str) -> float | None:
    values = []
    for line in pdb_text.splitlines():
        if line.startswith(("ATOM", "HETATM")) and len(line) >= 66:
            try:
                values.append(float(line[60:66]))
            except ValueError:
                continue
    return sum(values) / len(values) if values else None


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True, help="CSV with id,protein columns")
    ap.add_argument("--out_dir", default="outputs/folds")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--timeout", type=float, default=45.0)
    args = ap.parse_args(argv)

    rows = []
    with open(args.csv) as f:
        for i, record in enumerate(csv.DictReader(f)):
            protein = record.get("protein") or record.get("sequence")
            if protein:
                rows.append({"id": record.get("id") or f"seq{i}",
                             "protein": protein})
    if args.limit:
        rows = rows[: args.limit]

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    results, failures = [], 0
    for row in rows:
        try:
            pdb = fold(row["protein"], args.timeout)
        except Exception as exc:
            failures += 1
            if failures == 1:
                print(f"[fold] ESMFold API unreachable ({exc}) — this script "
                      "requires network access", file=_sys.stderr)
            if failures >= 3:
                print("[fold] aborting after repeated network failures",
                      file=_sys.stderr)
                return 2
            continue
        pdb_path = out_dir / f"{row['id']}.pdb"
        pdb_path.write_text(pdb)
        results.append({"id": row["id"], "pdb": str(pdb_path),
                        "mean_plddt": mean_plddt(pdb)})

    (out_dir / "fold_results.json").write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps({"folded": len(results), "out_dir": str(out_dir)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
