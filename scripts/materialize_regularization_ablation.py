#!/usr/bin/env python3
"""Materialize matched regularization-ablation configs without mutating the
primary contract (reference materialize_regularization_ablation.py —
schema-versioned matrix whose overrides are limited to label_smoothing /
dropout / tie_embeddings)."""

from __future__ import annotations

import argparse
import hashlib
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402

ALLOWED_OVERRIDES = frozenset({"label_smoothing", "dropout", "tie_embeddings"})


def _load(path: Path) -> dict:
    text = path.read_text()
    if path.suffix in (".yaml", ".yml"):
        import yaml

        return yaml.safe_load(text)
    return json.loads(text)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("matrix", help="ablation matrix (json/yaml)")
    ap.add_argument("--out_dir", default="configs/ablations")
    args = ap.parse_args(argv)

    from genomics_lm_tpu.training.contracts import validate_primary_training_config

    matrix_path = Path(args.matrix).resolve()
    matrix = _load(matrix_path)
    if int(matrix.get("schema_version", 0)) != 1:
        raise SystemExit("unsupported regularization-ablation schema_version")
    allowed = frozenset(matrix.get("allowed_overrides", []))
    if allowed != ALLOWED_OVERRIDES:
        raise SystemExit(
            f"allowed_overrides must be exactly {sorted(ALLOWED_OVERRIDES)}"
        )

    base_path = Path(matrix["base_config"])
    if not base_path.is_absolute():
        base_path = matrix_path.parent / base_path
    base = _load(base_path)
    validate_primary_training_config(base)
    epochs = int(matrix["epochs"])

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    for variant in matrix["variants"]:
        name = variant["name"]
        overrides = variant.get("overrides", {})
        illegal = set(overrides) - ALLOWED_OVERRIDES
        if illegal:
            raise SystemExit(f"variant {name}: illegal overrides {sorted(illegal)}")
        cfg = dict(base)
        cfg.update(overrides)
        cfg["epochs"] = epochs
        cfg["run_id"] = f"{base.get('run_id', 'ablation')}_{name}"
        cfg["ablation"] = {
            "matrix": str(matrix_path),
            "matrix_sha256": hashlib.sha256(matrix_path.read_bytes()).hexdigest(),
            "base_config": str(base_path),
            "base_sha256": hashlib.sha256(base_path.read_bytes()).hexdigest(),
            "variant": name,
            "overrides": overrides,
        }
        out = out_dir / f"{name}.json"
        out.write_text(json.dumps(cfg, indent=2) + "\n")
        written.append(str(out))
    print(json.dumps({"variants": len(written), "configs": written}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
