#!/usr/bin/env python3
"""Hybrid multi-scale tokenization CLI (reference hybrid_tokenize.py /
pipeline_prepare_hybrid.py): GBFF → hybrid token id lines + vocab files."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbff", nargs="+", required=True)
    ap.add_argument("--out_ids", required=True)
    ap.add_argument("--out_itos", default=None)
    ap.add_argument("--max_len", type=int, default=0, help="0 = unlimited")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.data.genbank import extract_hybrid_records
    from genomics_lm_tpu.tokenizers.hybrid import HybridTokenizer

    tokenizer = HybridTokenizer()
    out_ids = Path(args.out_ids)
    out_ids.parent.mkdir(parents=True, exist_ok=True)
    stats = {"records": 0, "tokens": 0, "dropped_overlapping_cds": 0}
    with out_ids.open("w") as fout:
        for path in args.gbff:
            for record in extract_hybrid_records(path):
                ids = tokenizer.encode(record["sequence"], record["cds_intervals"])
                if args.max_len:
                    ids = ids[: args.max_len]
                fout.write(" ".join(map(str, ids)) + "\n")
                stats["records"] += 1
                stats["tokens"] += len(ids)
                stats["dropped_overlapping_cds"] += record["dropped_overlapping"]
    itos_path = Path(args.out_itos or out_ids.with_name("itos_hybrid.txt"))
    itos_path.write_text("\n".join(tokenizer.vocab) + "\n")
    print(json.dumps({**stats, "vocab_size": tokenizer.vocab_size,
                      "itos": str(itos_path)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
