#!/usr/bin/env python3
"""Download bacterial genome GBFF files from NCBI (network opt-in).

Parity: reference ``scripts/download_genomes.py``. This environment is
zero-egress; the CLI validates its accession list and prints the fetch plan
unless ``--fetch`` is passed and the network is reachable.
"""

from __future__ import annotations

import argparse
import urllib.error
import urllib.request
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402

EUTILS = (
    "https://eutils.ncbi.nlm.nih.gov/entrez/eutils/efetch.fcgi"
    "?db=nuccore&id={accession}&rettype=gbwithparts&retmode=text"
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--accessions", nargs="+", required=True)
    ap.add_argument("--out_dir", default="data/genomes")
    ap.add_argument("--fetch", action="store_true", help="actually download")
    args = ap.parse_args(argv)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for accession in args.accessions:
        target = out_dir / f"{accession}.gbff"
        if target.exists():
            print(f"[download] {accession}: already present")
            continue
        url = EUTILS.format(accession=accession)
        if not args.fetch:
            print(f"[download] plan: {accession} ← {url}")
            continue
        try:
            with urllib.request.urlopen(url, timeout=60) as response:
                target.write_bytes(response.read())
            print(f"[download] {accession} → {target}")
        except (urllib.error.URLError, OSError) as exc:
            print(f"[download] FAILED {accession}: {exc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
