#!/usr/bin/env python3
"""Extract protein-critic latents for downstream probes
(reference extract_protein_embeddings.py)."""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--critic_ckpt", required=True)
    ap.add_argument("--input", required=True, help="JSONL/FASTA of protein sequences")
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch_size", type=int, default=16)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from genomics_lm_tpu.models.protein import ProteinClassifierConfig, extract_latent
    from genomics_lm_tpu.protein.data import load_records
    from genomics_lm_tpu.tokenizers.protein import ProteinTokenizer
    from genomics_lm_tpu.training.checkpoints import load_checkpoint

    tokenizer = ProteinTokenizer()
    payload = load_checkpoint(args.critic_ckpt)
    ccfg = payload.get("cfg", {})
    cfg = ProteinClassifierConfig(
        vocab_size=len(tokenizer),
        n_layer=int(ccfg.get("n_layer", 4)), n_head=int(ccfg.get("n_head", 4)),
        n_embd=int(ccfg.get("n_embd", 256)), block_size=int(ccfg.get("block_size", 512)),
        dropout=0.0, pooling=str(ccfg.get("pooling", "mean")),
    )
    params = jax.tree.map(jnp.asarray, payload["model"])

    records = load_records(args.input)
    ids = [r.get("id", f"p{i}") for i, r in enumerate(records)]

    @jax.jit
    def latents(input_ids, mask):
        return extract_latent(params, cfg, input_ids, mask)

    X = []
    for start in range(0, len(records), args.batch_size):
        chunk = records[start : start + args.batch_size]
        toks = [
            [tokenizer.bos_token_id]
            + tokenizer.encode_sequence(r["sequence"])[: cfg.block_size - 2]
            + [tokenizer.eos_token_id]
            for r in chunk
        ]
        width = max(len(t) for t in toks)
        input_ids = np.full((len(toks), width), tokenizer.pad_token_id, np.int32)
        mask = np.zeros((len(toks), width), np.int32)
        for row, t in enumerate(toks):
            input_ids[row, : len(t)] = t
            mask[row, : len(t)] = 1
        X.append(np.asarray(latents(jnp.asarray(input_ids), jnp.asarray(mask)),
                            dtype=np.float32))
    X = np.concatenate(X) if X else np.zeros((0, cfg.n_embd), np.float32)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, X=X, ids=np.asarray(ids))
    print(json.dumps({"embeddings": list(X.shape), "out": str(out)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
