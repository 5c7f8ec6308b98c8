#!/usr/bin/env python3
"""Merge per-offset heads from multiple checkpoints into one model.

Parity: reference ``scripts/merge_offset_checkpoints.py`` — take a base
checkpoint and graft ``offset_projs`` heads trained in other runs, producing
one model with the union of offsets.
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
    ap.add_argument("--base", required=True, help="base checkpoint")
    ap.add_argument("--donors", nargs="+", required=True,
                    help="checkpoints donating offset heads (all offsets taken)")
    ap.add_argument("--out_checkpoint", required=True)
    args = ap.parse_args(argv)

    from genomics_lm_tpu.training.checkpoints import load_checkpoint, save_checkpoint

    payload = load_checkpoint(args.base)
    model = payload["model"]
    merged = dict(model.get("offset_projs", {}))
    taken = {}
    for donor_path in args.donors:
        donor = load_checkpoint(donor_path)
        for offset, head in donor["model"].get("offset_projs", {}).items():
            merged[offset] = head
            taken.setdefault(donor_path, []).append(offset)
    if not merged:
        raise SystemExit("no offset_projs heads found in base or donors")
    model["offset_projs"] = merged
    cfg = dict(payload.get("cfg", {}))
    cfg["multi_offset_targets"] = sorted(int(o) for o in merged)
    payload["cfg"] = cfg
    save_checkpoint(payload, Path(args.out_checkpoint))
    print(f"[merge] offsets={cfg['multi_offset_targets']} → {args.out_checkpoint}")
    for donor_path, offsets in taken.items():
        print(f"[merge]   {donor_path}: {offsets}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
