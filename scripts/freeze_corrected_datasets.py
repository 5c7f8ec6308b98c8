#!/usr/bin/env python3
"""Freeze prepared datasets into a corrected release directory.

Parity: reference ``scripts/freeze_corrected_datasets.py`` — copy prepared
protocol datasets into ``corrected-<release>/<protocol>/`` layouts, record a
release-level freeze manifest whose id is the sha256 over the per-protocol
dataset ids, and make the artifacts read-only.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--release", required=True, help="release name, e.g. corrected-codonlm-v1")
    ap.add_argument("--protocol", action="append", nargs=2, required=True,
                    metavar=("NAME", "DATASET_DIR"),
                    help="protocol name + prepared dataset dir (repeatable)")
    ap.add_argument("--out_root", default="data/processed/corrected")
    ap.add_argument("--read_only", action="store_true")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.data.manifest import load_dataset_manifest

    release_dir = Path(args.out_root) / args.release
    release_dir.mkdir(parents=True, exist_ok=True)
    protocols = {}
    for name, src in args.protocol:
        src = Path(src)
        manifest = load_dataset_manifest(src / "manifest.json", verify_artifacts=True)
        dst = release_dir / name
        if dst.exists():
            raise SystemExit(f"refusing to overwrite existing freeze: {dst}")
        shutil.copytree(src, dst)
        protocols[name] = {
            "dataset_id": manifest["dataset"]["id"],
            "root": str(dst),
            "scientific_valid": manifest["dataset"].get("scientific_valid", False),
        }
        if args.read_only:
            for path in dst.rglob("*"):
                if path.is_file():
                    os.chmod(path, 0o444)

    freeze_id = hashlib.sha256(
        json.dumps(
            {k: v["dataset_id"] for k, v in sorted(protocols.items())},
            sort_keys=True,
        ).encode()
    ).hexdigest()
    freeze = {
        "schema": {"name": "codonlm_dataset_freeze", "version": 1},
        "release": args.release,
        "dataset_freeze_id": freeze_id,
        "protocols": protocols,
    }
    (release_dir / "freeze.json").write_text(json.dumps(freeze, indent=2, sort_keys=True) + "\n")
    print(f"[freeze] release={args.release} freeze_id={freeze_id}")
    for name, info in protocols.items():
        print(f"[freeze]   {name}: {info['dataset_id']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
