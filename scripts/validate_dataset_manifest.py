#!/usr/bin/env python3
"""Validate a frozen dataset manifest (reference validate_dataset_manifest.py)."""

from __future__ import annotations

import argparse

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("manifest")
    ap.add_argument("--no-verify-artifacts", dest="verify", action="store_false")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.data.manifest import load_dataset_manifest

    manifest = load_dataset_manifest(args.manifest, verify_artifacts=args.verify)
    print(f"[manifest] OK id={manifest['dataset']['id']}")
    print(f"[manifest] scientific_valid={manifest['dataset'].get('scientific_valid')}")
    print(f"[manifest] counts={manifest['split_policy']['record_counts']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
