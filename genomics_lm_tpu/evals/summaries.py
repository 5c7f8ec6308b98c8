"""Cross-run summary generation (``summary.md`` + ``_summary/summary.csv``).

Parity: reference ``scripts/generate_run_summaries.py`` /
``scripts/compare_runs.py`` — regenerate a markdown overview and CSV table
of all runs under a root; called best-effort from ``write_meta``.
"""

from __future__ import annotations

import csv
from pathlib import Path

from genomics_lm_tpu.evals.aggregator import load_all_runs, summary_rows


def generate_summary(runs_root: str | Path) -> Path:
    runs_root = Path(runs_root)
    rows = summary_rows(load_all_runs(runs_root))
    summary_dir = runs_root / "_summary"
    summary_dir.mkdir(parents=True, exist_ok=True)

    csv_path = summary_dir / "summary.csv"
    if rows:
        with csv_path.open("w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)

    md_lines = ["# Run summary", ""]
    if rows:
        headers = list(rows[0].keys())
        md_lines.append("| " + " | ".join(headers) + " |")
        md_lines.append("|" + "|".join("---" for _ in headers) + "|")
        for row in rows:
            md_lines.append("| " + " | ".join(str(row[h]) for h in headers) + " |")
    else:
        md_lines.append("_no runs found_")
    md_path = runs_root / "summary.md"
    md_path.write_text("\n".join(md_lines) + "\n")
    return md_path


__all__ = ["generate_summary"]
