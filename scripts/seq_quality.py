#!/usr/bin/env python3
"""Sequence-quality verifier and realism KPIs for CDS sets
(reference seq_quality.py — ORF integrity, GC%, length stats, codon-usage
KL/JS divergence vs a reference table, CAI)."""

from __future__ import annotations

import argparse
import csv
import json
import math
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402

START_CODONS = {"ATG", "GTG", "TTG"}
STOP_CODONS = {"TAA", "TAG", "TGA"}


def read_usage_table(path: Path) -> dict[str, float]:
    table = {}
    with path.open() as f:
        for row in csv.DictReader(f, delimiter="\t"):
            key = row.get("codon")
            value = row.get("freq") or row.get("w")
            if key and value:
                table[key] = float(value)
    return table


def orf_checks(dna: str) -> dict:
    codons = [dna[i : i + 3] for i in range(0, (len(dna) // 3) * 3, 3)]
    internal_stops = sum(c in STOP_CODONS for c in codons[:-1]) if codons else 0
    return {
        "has_start": bool(codons) and codons[0] in START_CODONS,
        "has_terminal_stop": bool(codons) and codons[-1] in STOP_CODONS,
        "internal_stops": internal_stops,
        "frame_complete": len(dna) % 3 == 0,
    }


def divergences(p: dict[str, float], q: dict[str, float]) -> tuple[float, float]:
    keys = sorted(set(p) | set(q))
    eps = 1e-9
    pv = [p.get(k, 0.0) + eps for k in keys]
    qv = [q.get(k, 0.0) + eps for k in keys]
    ps, qs = sum(pv), sum(qv)
    pv = [v / ps for v in pv]
    qv = [v / qs for v in qv]
    kl = sum(a * math.log(a / b) for a, b in zip(pv, qv))
    m = [(a + b) / 2 for a, b in zip(pv, qv)]
    js = 0.5 * sum(a * math.log(a / c) for a, c in zip(pv, m)) + \
        0.5 * sum(b * math.log(b / c) for b, c in zip(qv, m))
    return kl, js


def cai(dna: str, weights: dict[str, float]) -> float | None:
    logs = []
    for i in range(0, (len(dna) // 3) * 3, 3):
        w = weights.get(dna[i : i + 3])
        if w and w > 0:
            logs.append(math.log(w))
    return math.exp(sum(logs) / len(logs)) if logs else None


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dna", required=True, help="one DNA CDS per line / CSV")
    ap.add_argument("--reference_usage", default=None,
                    help="codon_usage.tsv from build_reference_tables")
    ap.add_argument("--cai_weights", default=None, help="cai_weights.tsv")
    ap.add_argument("--out", default="outputs/seq_quality/seq_quality.json")
    args = ap.parse_args(argv)

    import numpy as np

    path = Path(args.dna)
    text = path.read_text()
    first = text.splitlines()[0] if text.splitlines() else ""
    if "," in first and not set(first.strip()) <= set("ACGTN,"):
        seqs = []
        with path.open() as f:
            for row in csv.DictReader(f):
                seq = row.get("dna") or row.get("sequence")
                if seq:
                    seqs.append(seq)
    else:
        seqs = [l.strip() for l in text.splitlines() if l.strip()]
    seqs = [s.upper().replace("U", "T") for s in seqs]

    usage_ref = read_usage_table(Path(args.reference_usage)) if args.reference_usage else None
    weights = read_usage_table(Path(args.cai_weights)) if args.cai_weights else None

    rows = []
    usage_counts: dict[str, int] = {}
    for i, dna in enumerate(seqs):
        checks = orf_checks(dna)
        gc = sum(c in "GC" for c in dna) / max(len(dna), 1)
        row = {"index": i, "length_nt": len(dna), "gc": round(gc, 4), **checks}
        if weights:
            value = cai(dna, weights)
            row["cai"] = round(value, 4) if value is not None else None
        rows.append(row)
        for j in range(0, (len(dna) // 3) * 3, 3):
            codon = dna[j : j + 3]
            if set(codon) <= set("ACGT"):
                usage_counts[codon] = usage_counts.get(codon, 0) + 1

    total = sum(usage_counts.values())
    usage = {k: v / total for k, v in usage_counts.items()} if total else {}
    lengths = np.asarray([r["length_nt"] for r in rows]) if rows else np.zeros(0)
    report = {
        "sequences": len(rows),
        "orf_intact_rate": (
            float(np.mean([r["has_start"] and r["has_terminal_stop"]
                           and r["internal_stops"] == 0 for r in rows]))
            if rows else None
        ),
        "start_codon_rate": float(np.mean([r["has_start"] for r in rows])) if rows else None,
        "terminal_stop_rate": float(np.mean([r["has_terminal_stop"] for r in rows])) if rows else None,
        "mean_internal_stops": float(np.mean([r["internal_stops"] for r in rows])) if rows else None,
        "mean_gc": float(np.mean([r["gc"] for r in rows])) if rows else None,
        "length_nt": {
            "min": int(lengths.min()) if len(lengths) else None,
            "median": float(np.median(lengths)) if len(lengths) else None,
            "max": int(lengths.max()) if len(lengths) else None,
        },
    }
    if usage_ref and usage:
        kl, js = divergences(usage, usage_ref)
        report["codon_usage_kl_vs_reference"] = kl
        report["codon_usage_js_vs_reference"] = js
    if weights:
        cais = [r["cai"] for r in rows if r.get("cai") is not None]
        report["mean_cai"] = float(np.mean(cais)) if cais else None

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({**report, "per_sequence": rows}, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
