#!/usr/bin/env python3
"""Audit mined motif clusters for structural termination signals
(reference audit_structural_motifs.py — hairpin/poly-T/GC audit of each
cluster consensus from mine_motifs)."""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--motifs_json", default=None)
    ap.add_argument("--hairpin_threshold", type=float, default=12.0)
    ap.add_argument("--run_root", default="runs")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.evals.termination_motifs import (
        gc_fraction,
        hairpin_score,
        max_poly_t_run,
    )

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    path = Path(args.motifs_json) if args.motifs_json else (
        run_dir / "scores" / "motifs.json"
    )
    if not path.exists():
        raise SystemExit(f"{path} not found — run scripts/mine_motifs.py first")
    clusters = json.loads(path.read_text()).get("clusters", {})
    if isinstance(clusters, dict):
        clusters = [{"cluster": label, **info} for label, info in clusters.items()]

    rows = []
    for cluster in clusters:
        consensus = (cluster.get("consensus") or "").replace(" ", "").upper()
        dna = "".join(c for c in consensus if c in "ACGT")
        if not dna:
            continue
        rows.append({
            "cluster": cluster.get("cluster"),
            "size": cluster.get("size"),
            "consensus": dna,
            "hairpin_score": hairpin_score(dna),
            "max_poly_t": max_poly_t_run(dna),
            "gc": round(gc_fraction(dna), 4),
        })
    rows.sort(key=lambda r: -r["hairpin_score"])

    structural = [r for r in rows if r["hairpin_score"] >= args.hairpin_threshold
                  or r["max_poly_t"] >= 5]
    report = {
        "clusters_audited": len(rows),
        "structural_clusters": len(structural),
        "hairpin_threshold": args.hairpin_threshold,
        "top_structural": rows[:10],
    }
    out = run_dir / "scores" / "structural_motif_audit.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
