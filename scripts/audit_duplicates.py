#!/usr/bin/env python3
"""Standalone exact-duplicate audit CLI (reference audit_duplicates.py)."""

from __future__ import annotations

import argparse
import csv
import json
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records_tsv", required=True,
                    help="TSV with sequence/source_id/split columns")
    ap.add_argument("--out", default="outputs/audits/duplicates.json")
    ap.add_argument("--quarantine", action="store_true",
                    help="emit a retained-records TSV after quarantine")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.data.leakage import (
        exact_cross_split_duplicates,
        quarantine_cross_split_exact_duplicates,
    )

    with open(args.records_tsv) as f:
        records = list(csv.DictReader(f, delimiter="\t"))
    violations = exact_cross_split_duplicates(records)
    report = {"record_count": len(records), "violations": violations}
    if args.quarantine:
        retained, policy = quarantine_cross_split_exact_duplicates(records)
        report["quarantine"] = {k: v for k, v in policy.items() if k != "families"}
        out_tsv = Path(args.out).with_suffix(".retained.tsv")
        with out_tsv.open("w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(records[0].keys()), delimiter="\t")
            writer.writeheader()
            writer.writerows(retained)
        report["retained_tsv"] = str(out_tsv)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(f"[audit] {len(violations)} cross-split duplicate families → {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
