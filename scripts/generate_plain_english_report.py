#!/usr/bin/env python3
"""Plain-English summary of a run's analysis results
(reference generate_plain_english_report.py — non-expert narrative over the
mutation-map, motif, and generation artifacts)."""

from __future__ import annotations

import argparse
import csv
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

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    tables = run_dir / "tables"
    lines = [f"# What the model learned — {run_dir.name}", ""]

    meta_path = run_dir / "checkpoints" / "meta.json"
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
        ppl = meta.get("last_perplexity")
        if ppl:
            lines += [
                "## How well does it predict DNA?",
                f"On held-out genes the model's perplexity is **{ppl:.2f}** — "
                "lower means it is less 'surprised' by real genomic sequence. "
                "A random guesser over 64 codons would score 64.",
                "",
            ]

    probe = tables / "next_token_probe.json"
    if probe.exists():
        acc = json.loads(probe.read_text())
        lines += [
            "## Can it guess the next codon?",
            f"Given the start of a real gene, the model's top guess is exactly "
            f"right **{100 * acc['top1_accuracy']:.1f}%** of the time, and the "
            f"right answer is in its top-5 guesses "
            f"**{100 * acc['top5_accuracy']:.1f}%** of the time.",
            "",
        ]

    saliency = tables / "top_saliency_segments.csv"
    if saliency.exists():
        with saliency.open() as f:
            top = list(csv.DictReader(f))[:3]
        if top:
            lines += [
                "## Which parts of a gene does it pay attention to?",
                "The model's attention is not uniform — these sequence windows "
                "influenced its predictions the most:",
            ]
            lines += [
                f"- positions {r['start']}–{r['end']}: `{r['tokens']}`"
                for r in top
            ]
            lines.append("")

    mut = tables / "mutation_map_summary.json"
    if not mut.exists():
        mut = run_dir.parent.parent / "outputs" / "mutation_maps" / "mutation_map_summary.json"
    if mut.exists():
        summary = json.loads(mut.read_text())
        syn = summary.get("mean_synonymous_delta")
        nonsyn = summary.get("mean_nonsynonymous_delta")
        if syn is not None and nonsyn is not None:
            lines += [
                "## Does it understand the genetic code?",
                f"Swapping a codon for a synonymous one (same amino acid) costs the "
                f"model {abs(syn):.2f} log-probability on average, while changing "
                f"the amino acid costs {abs(nonsyn):.2f} — "
                + ("so the model has learned that protein identity matters more "
                   "than the exact DNA spelling."
                   if abs(nonsyn) > abs(syn) else
                   "an unexpected pattern worth investigating."),
                "",
            ]

    gen = run_dir / "scores" / "generation_prefix.json"
    if gen.exists():
        s = json.loads(gen.read_text())["summary"]
        lines += [
            "## Can it write new genes?",
            f"Asked to continue {s['n']} real gene openings, it finished with a "
            f"proper stop codon {100 * s['terminal_stop_rate']:.0f}% of the time, "
            f"writing {s['mean_generated_codons']:.0f} codons on average.",
            "",
        ]

    if len(lines) <= 2:
        lines.append("No analysis artifacts found — run scripts/run_analysis.py first.")
    out = tables if tables.is_dir() else run_dir
    out.mkdir(parents=True, exist_ok=True)
    report_path = out / "plain_english_report.md"
    report_path.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\n[report] wrote {report_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
