#!/usr/bin/env python3
"""Legacy dataset builder: tokenized id lines → split + packed NPZ.

Parity: reference ``src/codonlm/build_dataset.py`` — group-aware
(genome-column) train/val/test split + packing, sequence-split fallback
under 3 groups.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ids", required=True, help="space-separated id lines")
    ap.add_argument("--groups", default=None,
                    help="optional one-group-per-line file aligned with --ids")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--block_size", type=int, default=512)
    ap.add_argument("--pack_mode", choices=["single", "multi", "dynamic", "binpack"], default="multi")
    ap.add_argument("--val_fraction", type=float, default=0.1)
    ap.add_argument("--test_fraction", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.data.packing import chunk_record, pack_chunks, packed_arrays
    from genomics_lm_tpu.data.pipeline import SPLITS, assign_group_splits
    from genomics_lm_tpu.tokenizers.codon import SEP_ID, write_itos

    token_lines = [
        [int(t) for t in line.split()]
        for line in Path(args.ids).read_text().splitlines()
        if line.strip()
    ]
    groups = None
    if args.groups:
        groups = [g.strip() for g in Path(args.groups).read_text().splitlines()]
        if len(groups) != len(token_lines):
            raise SystemExit("--groups must align line-for-line with --ids")

    records = [
        {
            "sequence": "",  # split bookkeeping only; tokens are pre-encoded
            "source_id": f"line:{i}",
            "genome": groups[i] if groups else f"line:{i}",
        }
        for i in range(len(token_lines))
    ]
    records, policy = assign_group_splits(
        records,
        group_by="genome" if groups else "sequence",
        fractions={"val": args.val_fraction, "test": args.test_fraction},
        seed=args.seed,
        allow_sequence_split=True,
    )

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    write_itos(out_dir / "itos.txt")
    array_mode = "fixed" if args.pack_mode in {"single", "multi", "binpack"} else "dynamic"
    for split in SPLITS:
        recs = [
            {
                "tokens": token_lines[i],
                "source_id": f"line:{i}",
                "source_line_idx": i,
                "fragment_line_idx": i,
                "fragment_index": 0,
                "split": split,
                "fragment_codon_start": 0,
                "fragment_codon_end": max(0, len(token_lines[i]) - 2),
            }
            for i, r in enumerate(records)
            if r["split"] == split
        ]
        chunks = [c for r in recs for c in chunk_record(r, args.block_size)]
        windows = pack_chunks(
            chunks, block_size=args.block_size, mode=args.pack_mode, sep_id=SEP_ID
        )
        arrays = packed_arrays(windows, block_size=args.block_size, mode=array_mode)
        np.savez(
            out_dir / f"{split}_bs{args.block_size}.npz",
            **{k: v for k, v in arrays.items() if k in {"X", "Y", "lengths"}},
        )
        print(f"[build] {split}: {len(windows)} windows")
    print(f"[build] split policy: {policy['record_counts']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
