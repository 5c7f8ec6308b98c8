#!/usr/bin/env python3
"""Codon-dialect analysis across genome groups
(reference analyze_dialects.py — per-group synonymous codon-usage profiles,
pairwise Jensen–Shannon divergence, and a comparison heatmap)."""

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


def js_divergence(p, q) -> float:
    eps = 1e-12
    m = [(a + b) / 2 for a, b in zip(p, q)]
    kl = lambda x, y: sum(a * math.log((a + eps) / (b + eps)) for a, b in zip(x, y))
    return 0.5 * kl(p, m) + 0.5 * kl(q, m)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_dir", required=True,
                    help="prepared dataset dir (source_metadata.tsv + source_dna.txt)")
    ap.add_argument("--group_by", choices=["genus", "genome", "organism"],
                    default="genus")
    ap.add_argument("--out_dir", default="outputs/dialects")
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.generation.genetic_code import AA_TO_CODONS

    dataset_dir = Path(args.dataset_dir)
    sequences = (dataset_dir / "source_dna.txt").read_text().splitlines()
    groups: dict[str, dict[str, int]] = {}
    with (dataset_dir / "source_metadata.tsv").open(newline="") as f:
        for idx, row in enumerate(csv.DictReader(f, delimiter="\t")):
            if idx >= len(sequences):
                break
            group = row.get(args.group_by) or "unknown"
            usage = groups.setdefault(group, {})
            dna = sequences[idx].upper()
            for i in range(0, (len(dna) // 3) * 3, 3):
                codon = dna[i : i + 3]
                if set(codon) <= set("ACGT"):
                    usage[codon] = usage.get(codon, 0) + 1

    # normalize within synonymous families (dialect = codon choice per AA)
    codon_order = [c for codons in AA_TO_CODONS.values() for c in codons]
    profiles = {}
    for group, usage in groups.items():
        profile = []
        for codons in AA_TO_CODONS.values():
            family_total = sum(usage.get(c, 0) for c in codons)
            for c in codons:
                profile.append(usage.get(c, 0) / family_total if family_total else 0.0)
        profiles[group] = profile

    names = sorted(profiles)
    n = len(names)
    matrix = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            matrix[i, j] = js_divergence(profiles[names[i]], profiles[names[j]])

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    report = {
        "group_by": args.group_by,
        "groups": names,
        "js_divergence": {
            f"{names[i]}|{names[j]}": round(float(matrix[i, j]), 6)
            for i in range(n) for j in range(i + 1, n)
        },
        "max_divergent_pair": None,
    }
    if n > 1:
        i, j = np.unravel_index(np.argmax(matrix), matrix.shape)
        report["max_divergent_pair"] = [names[i], names[j], float(matrix[i, j])]

    with (out_dir / "dialect_profiles.csv").open("w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["group", *codon_order])
        for name in names:
            writer.writerow([name, *[round(v, 6) for v in profiles[name]]])
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(1 + n * 0.6, 1 + n * 0.55))
        im = ax.imshow(matrix, cmap="viridis")
        ax.set_xticks(range(n), names, rotation=45, ha="right", fontsize=7)
        ax.set_yticks(range(n), names, fontsize=7)
        fig.colorbar(im, label="JS divergence")
        ax.set_title(f"Codon dialects by {args.group_by}", fontsize=9)
        fig.tight_layout()
        fig.savefig(out_dir / "dialect_comparison.png", dpi=120)
        plt.close(fig)
    except Exception as exc:
        print(f"[dialects] plot skipped: {exc}")
    (out_dir / "dialects.json").write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
