#!/usr/bin/env python3
"""Build an EC-class probe dataset aligned to a frozen CodonLM genome split
(reference prepare_controlled_ec_dataset.py — downstream labels inherit the
pretraining train/val/test assignment so probes never cross the split)."""

from __future__ import annotations

import argparse
import csv
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def load_ec_labels(path: Path) -> dict[str, int]:
    """id → top-level EC class (1..7)."""
    labels: dict[str, int] = {}
    with path.open(newline="") as f:
        reader = csv.DictReader(f, delimiter="\t" if path.suffix == ".tsv" else ",")
        for row in reader:
            pid = (row.get("ncbi_id") or row.get("id") or "").strip()
            ec = (row.get("ec") or row.get("ec_number") or "").strip()
            if pid and ec and ec[0].isdigit() and 1 <= int(ec[0]) <= 7:
                labels[pid] = int(ec[0])
    return labels


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_dir", required=True,
                    help="prepared dataset dir with source_metadata.tsv")
    ap.add_argument("--ec_labels", required=True, help="CSV/TSV id,ec")
    ap.add_argument("--out_dir", default="data/processed/controlled_ec")
    ap.add_argument("--min_class_count", type=int, default=2)
    args = ap.parse_args(argv)

    from genomics_lm_tpu.data.manifest import file_sha256

    dataset_dir = Path(args.dataset_dir)
    labels = load_ec_labels(Path(args.ec_labels))
    sequences = (dataset_dir / "source_dna.txt").read_text().splitlines()

    rows = []
    with (dataset_dir / "source_metadata.tsv").open(newline="") as f:
        for idx, row in enumerate(csv.DictReader(f, delimiter="\t")):
            ec = labels.get(str(row["source_id"]))
            if ec is None or idx >= len(sequences):
                continue
            rows.append({
                "id": row["source_id"],
                "split": row["split"],      # inherited from the frozen split
                "ec_class": ec,
                "sequence": sequences[idx],
            })
    if not rows:
        raise SystemExit("no labeled records matched the frozen dataset")

    # drop classes too small to stratify
    counts: dict[int, int] = {}
    for r in rows:
        counts[r["ec_class"]] = counts.get(r["ec_class"], 0) + 1
    kept = [r for r in rows if counts[r["ec_class"]] >= args.min_class_count]

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for split in ("train", "val", "test"):
        split_rows = [r for r in kept if r["split"] == split]
        with (out_dir / f"ec_{split}.csv").open("w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["id", "split", "ec_class",
                                                   "sequence"])
            writer.writeheader()
            writer.writerows(split_rows)

    provenance = {
        "schema": "controlled_ec_dataset",
        "schema_version": 1,
        "dataset_dir": str(dataset_dir),
        "source_metadata_sha256": file_sha256(dataset_dir / "source_metadata.tsv"),
        "source_dna_sha256": file_sha256(dataset_dir / "source_dna.txt"),
        "ec_labels_sha256": file_sha256(Path(args.ec_labels)),
        "records": len(kept),
        "dropped_small_classes": len(rows) - len(kept),
        "class_counts": {str(k): v for k, v in sorted(counts.items())},
        "split_counts": {
            split: sum(r["split"] == split for r in kept)
            for split in ("train", "val", "test")
        },
    }
    (out_dir / "provenance.json").write_text(json.dumps(provenance, indent=2) + "\n")
    print(json.dumps(provenance, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
