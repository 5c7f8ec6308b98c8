#!/usr/bin/env python3
"""Verify a frozen corrected-dataset release (reference verify_dataset_freeze.py)."""

from __future__ import annotations

import argparse
import hashlib
import json
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("release_dir", help="corrected/<release> directory")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.data.manifest import load_dataset_manifest

    release_dir = Path(args.release_dir)
    freeze = json.loads((release_dir / "freeze.json").read_text())
    failures = []
    for name, info in freeze["protocols"].items():
        root = release_dir / name
        try:
            manifest = load_dataset_manifest(root / "manifest.json", verify_artifacts=True)
        except Exception as exc:
            failures.append(f"{name}: manifest validation failed: {exc}")
            continue
        if manifest["dataset"]["id"] != info["dataset_id"]:
            failures.append(
                f"{name}: dataset id drift {manifest['dataset']['id']} != {info['dataset_id']}"
            )
    recomputed = hashlib.sha256(
        json.dumps(
            {k: v["dataset_id"] for k, v in sorted(freeze["protocols"].items())},
            sort_keys=True,
        ).encode()
    ).hexdigest()
    if recomputed != freeze["dataset_freeze_id"]:
        failures.append(
            f"freeze id drift: {recomputed} != {freeze['dataset_freeze_id']}"
        )
    if failures:
        for failure in failures:
            print(f"[verify] FAIL {failure}")
        return 1
    print(f"[verify] OK release={freeze['release']} freeze_id={freeze['dataset_freeze_id']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
