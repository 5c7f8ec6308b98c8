#!/usr/bin/env python3
"""Check whether terminal regions carry structural termination cues
(reference check_termination_motifs.py — GC-hairpin and poly-T scores near
the stop codon vs interior windows, on real and optionally generated CDS)."""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def read_sequences(path: Path) -> list[str]:
    import csv

    text = path.read_text()
    first = text.splitlines()[0] if text.splitlines() else ""
    if "," in first and not set(first.strip()) <= set("ACGTN,"):
        seqs = []
        with path.open() as f:
            for row in csv.DictReader(f):
                seq = row.get("dna") or row.get("sequence")
                if seq:
                    seqs.append(seq)
        return seqs
    return [l.strip() for l in text.splitlines() if l.strip()]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dna", required=True, help="CDS lines or CSV")
    ap.add_argument("--generated", default=None,
                    help="optional generated set for comparison")
    ap.add_argument("--window", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="outputs/termination/termination_motifs.json")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.evals.termination_motifs import terminal_window_contrast

    report = {
        "window": args.window,
        "real": terminal_window_contrast(
            read_sequences(Path(args.dna)), window=args.window, seed=args.seed
        ),
    }
    if args.generated:
        report["generated"] = terminal_window_contrast(
            read_sequences(Path(args.generated)), window=args.window,
            seed=args.seed,
        )
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
