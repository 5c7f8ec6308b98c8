#!/usr/bin/env python3
"""Extract pooled embeddings from sequences for downstream probes.

Parity: reference ``scripts/extract_embeddings.py`` — FASTA/CSV/TXT inputs,
pooling modes mean_nonpad/mean_content/eos, NPZ ``{X, ids}`` output with
sha256 provenance JSON.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import resolve_run_dir  # noqa: E402


def read_sequences(path: Path) -> tuple[list[str], list[str]]:
    text = path.read_text()
    ids, seqs = [], []
    if text.lstrip().startswith(">"):
        current_id, parts = None, []
        for line in text.splitlines():
            if line.startswith(">"):
                if current_id is not None:
                    ids.append(current_id)
                    seqs.append("".join(parts))
                current_id, parts = line[1:].split()[0], []
            else:
                parts.append(line.strip())
        if current_id is not None:
            ids.append(current_id)
            seqs.append("".join(parts))
    elif path.suffix == ".csv":
        import csv as csv_mod

        with path.open() as f:
            for row in csv_mod.DictReader(f):
                ids.append(row.get("id") or row.get("source_id") or str(len(ids)))
                seqs.append(row.get("sequence") or row.get("dna"))
    else:
        for i, line in enumerate(text.splitlines()):
            if line.strip():
                ids.append(str(i))
                seqs.append(line.strip())
    return seqs, ids


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_id")
    ap.add_argument("--input", required=True, help="FASTA/CSV/TXT of CDS DNA")
    ap.add_argument("--out", required=True, help="output NPZ path")
    ap.add_argument("--pooling", default="mean_nonpad",
                    choices=["mean_nonpad", "mean_content", "eos"])
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--run_root", default="runs")
    ap.add_argument("--dataset_manifest", default=None,
                    help="frozen dataset manifest to bind this extraction to")
    ap.add_argument("--require_scientific_valid", action="store_true",
                    help="fail unless the manifest is marked scientific_valid")
    args = ap.parse_args(argv)

    import numpy as np

    from genomics_lm_tpu.evals.embeddings import (
        extract_embeddings,
        extraction_provenance,
        ids_from_dna,
    )
    from genomics_lm_tpu.evals.playground import (
        load_codon_checkpoint,
        load_codon_model,
        resolve_checkpoint,
    )

    run_dir = resolve_run_dir(args.run_id, args.run_root)
    params, cfg, itos, stoi = load_codon_model(run_dir, args.checkpoint)
    cfg = cfg.replace(dropout=0.0)

    seqs, seq_ids = read_sequences(Path(args.input))
    rows = np.stack([ids_from_dna(s, cfg.block_size) for s in seqs])
    X = extract_embeddings(
        params, cfg, rows, mode=args.pooling, batch_size=args.batch_size
    )
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out_path, X=X, ids=np.asarray(seq_ids))
    prov = extraction_provenance(
        checkpoint_path=resolve_checkpoint(run_dir, args.checkpoint),
        itos_path=run_dir / "itos.txt" if (run_dir / "itos.txt").exists() else None,
        pooling=args.pooling,
        n_sequences=len(seqs),
    )
    # forward_hidden is the parity-verified canonical causal API
    # (tests/test_torch_parity.py::TestDecodeParity), so extractions made
    # through it carry the causal_verified status.
    prov["validation_status"] = "causal_verified"
    if args.dataset_manifest or args.require_scientific_valid:
        from genomics_lm_tpu.evals.provenance import (
            EvaluationProvenanceError,
            bind_checkpoint_dataset,
            bind_dataset_manifest,
        )

        if not args.dataset_manifest:
            raise EvaluationProvenanceError(
                "--require_scientific_valid needs --dataset_manifest"
            )
        _, manifest_prov = bind_dataset_manifest(
            args.dataset_manifest,
            require_scientific=args.require_scientific_valid,
        )
        from genomics_lm_tpu.training.checkpoints import load_checkpoint_meta

        # metadata-only read — the weights were already loaded above
        ckpt_cfg = dict(
            load_checkpoint_meta(
                resolve_checkpoint(run_dir, args.checkpoint)
            ).get("cfg", {})
        )
        prov["dataset_manifest"] = manifest_prov
        prov["checkpoint_dataset"] = bind_checkpoint_dataset(ckpt_cfg, manifest_prov)
    out_path.with_suffix(".provenance.json").write_text(json.dumps(prov, indent=2) + "\n")
    print(f"[extract] wrote {X.shape} embeddings → {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
