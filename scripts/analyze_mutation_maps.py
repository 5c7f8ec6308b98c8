#!/usr/bin/env python3
"""Analyze mutation maps (ΔlogP TSVs) for sensitive sites and codon
preferences (reference analyze_mutation_maps.py — interpretability step 2)."""

from __future__ import annotations

import argparse
import csv
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--maps", nargs="+", required=True,
                    help="mutation-map TSVs from scripts/score_mutations.py")
    ap.add_argument("--top_sites", type=int, default=20)
    ap.add_argument("--out_dir", default="outputs/mutation_maps")
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.generation.genetic_code import CODON_TABLE

    site_rows, pref_counts = [], {}
    for path in args.maps:
        with open(path) as f:
            for row in csv.DictReader(f, delimiter="\t"):
                deltas = {
                    k[len("delta_"):]: float(v)
                    for k, v in row.items()
                    if k.startswith("delta_")
                }
                if not deltas:
                    continue
                wt = row.get("wt_codon", "")
                best_codon, best_delta = max(deltas.items(), key=lambda kv: kv[1])
                # sensitivity: how much the worst mutation hurts
                worst_delta = min(deltas.values())
                syn = [
                    d for c, d in deltas.items()
                    if c != wt and CODON_TABLE.get(c) == CODON_TABLE.get(wt)
                ]
                nonsyn = [
                    d for c, d in deltas.items()
                    if CODON_TABLE.get(c) != CODON_TABLE.get(wt)
                ]
                site_rows.append({
                    "map": Path(path).stem,
                    "position": int(row["position"]),
                    "wt_codon": wt,
                    "sensitivity": -worst_delta,
                    "best_alternative": best_codon,
                    "best_delta": best_delta,
                    "mean_synonymous_delta": float(np.mean(syn)) if syn else None,
                    "mean_nonsynonymous_delta": float(np.mean(nonsyn)) if nonsyn else None,
                })
                pref_counts[best_codon] = pref_counts.get(best_codon, 0) + 1

    site_rows.sort(key=lambda r: -r["sensitivity"])
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with (out_dir / "sensitive_sites.csv").open("w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(site_rows[0].keys()) if site_rows
                                else ["position"])
        writer.writeheader()
        writer.writerows(site_rows)

    syn_means = [r["mean_synonymous_delta"] for r in site_rows
                 if r["mean_synonymous_delta"] is not None]
    nonsyn_means = [r["mean_nonsynonymous_delta"] for r in site_rows
                    if r["mean_nonsynonymous_delta"] is not None]
    import numpy as np  # noqa: F811

    summary = {
        "positions": len(site_rows),
        "top_sensitive_sites": site_rows[: args.top_sites],
        "preferred_codons": dict(sorted(pref_counts.items(), key=lambda kv: -kv[1])[:10]),
        "mean_synonymous_delta": float(np.mean(syn_means)) if syn_means else None,
        "mean_nonsynonymous_delta": float(np.mean(nonsyn_means)) if nonsyn_means else None,
    }
    (out_dir / "mutation_map_summary.json").write_text(
        json.dumps(summary, indent=2) + "\n"
    )
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "top_sensitive_sites"}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
