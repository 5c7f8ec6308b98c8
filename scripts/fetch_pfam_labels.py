#!/usr/bin/env python3
"""Fetch Pfam family labels for GBFF protein ids via UniProt
(reference fetch_pfam_labels.py). NETWORK-GATED: degrades to a clear error
(exit 2) when the UniProt API is unreachable."""

from __future__ import annotations

import argparse
import csv
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402

UNIPROT_URL = "https://rest.uniprot.org/uniprotkb/search"


def extract_protein_ids(gbff_paths) -> list[dict]:
    """locus_tag → protein_id/translation from GBFF CDS features."""
    from genomics_lm_tpu.data.genbank import extract_cds_records

    rows = []
    for path in gbff_paths:
        for record in extract_cds_records(path):
            pid = record.get("protein_id")
            if pid:
                rows.append({"protein_id": pid,
                             "locus_tag": record.get("locus_tag", ""),
                             "source_id": record["source_id"]})
    return rows


def fetch_pfam(protein_id: str, timeout: float) -> list[str]:
    import urllib.parse
    import urllib.request

    query = urllib.parse.urlencode({
        "query": f"xref:refseq-{protein_id}",
        "fields": "xref_pfam",
        "format": "json",
        "size": "1",
    })
    with urllib.request.urlopen(f"{UNIPROT_URL}?{query}", timeout=timeout) as resp:
        payload = json.load(resp)
    pfams = []
    for result in payload.get("results", []):
        for xref in result.get("uniProtKBCrossReferences", []):
            if xref.get("database") == "Pfam":
                pfams.append(xref.get("id"))
    return pfams


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbff", nargs="+", required=True)
    ap.add_argument("--out", default="data/labels/pfam_labels.csv")
    ap.add_argument("--timeout", type=float, default=10.0)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args(argv)

    records = extract_protein_ids(args.gbff)
    if args.limit:
        records = records[: args.limit]
    if not records:
        raise SystemExit("no protein_id entries found in the GBFF inputs")

    rows, failures = [], 0
    for record in records:
        try:
            pfams = fetch_pfam(record["protein_id"], args.timeout)
        except Exception as exc:
            failures += 1
            if failures == 1:
                print(f"[fetch] UniProt unreachable ({exc}) — this script "
                      "requires network access", file=_sys.stderr)
            if failures >= 3:
                print("[fetch] aborting after repeated network failures; "
                      "no partial file written", file=_sys.stderr)
                return 2
            continue
        rows.append({**record, "pfam": ";".join(pfams)})

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["protein_id", "locus_tag",
                                               "source_id", "pfam"])
        writer.writeheader()
        writer.writerows(rows)
    print(json.dumps({"labeled": len(rows), "out": str(out)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
