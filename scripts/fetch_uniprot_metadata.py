#!/usr/bin/env python3
"""Download a UniProt TSV slice (sequences + EC/keywords/location metadata)
(reference fetch_uniprot_metadata.py). NETWORK-GATED: exits 2 with a clear
message when the UniProt API is unreachable."""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402

UNIPROT_STREAM = "https://rest.uniprot.org/uniprotkb/stream"
DEFAULT_FIELDS = (
    "accession,sequence,ec,keyword,cc_subcellular_location,xref_pfam,organism_name"
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query",
                    default="taxonomy_id:2 AND reviewed:true AND length:[50 TO 512]",
                    help="UniProt search query (default: reviewed bacteria 50-512aa)")
    ap.add_argument("--fields", default=DEFAULT_FIELDS)
    ap.add_argument("--out", default="data/raw/uniprot_bacteria_50_512.tsv")
    ap.add_argument("--timeout", type=float, default=60.0)
    args = ap.parse_args(argv)

    import urllib.parse
    import urllib.request

    query = urllib.parse.urlencode({
        "query": args.query, "fields": args.fields, "format": "tsv",
    })
    url = f"{UNIPROT_STREAM}?{query}"
    try:
        with urllib.request.urlopen(url, timeout=args.timeout) as resp:
            text = resp.read().decode()
    except Exception as exc:
        print(f"[fetch] UniProt unreachable ({exc}) — this script requires "
              "network access; provide the TSV manually and point "
              "protein_lm_data_preparer.py at it", file=_sys.stderr)
        return 2

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(text)
    print(json.dumps({"rows": max(0, text.count("\n") - 1),
                      "out": str(out)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
