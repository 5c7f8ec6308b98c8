"""Embedding extraction: pooled canonical causal states with provenance.

Parity: reference ``scripts/extract_embeddings.py`` — hidden states come
from the verified ``forward_hidden`` API (final-norm canonical causal
states), pooled by mode:

- ``mean_nonpad``  — masked mean over non-PAD positions,
- ``mean_content`` — masked mean over codon tokens only,
- ``eos``          — the state at the last non-PAD position,

with sha256 provenance of checkpoint/vocabulary/output (``:134-170``).
Batched and jitted; shards across a data-parallel mesh when one is given
(the reference runs sequential MPS batches).
"""

from __future__ import annotations

import functools
import hashlib
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from genomics_lm_tpu.models import CodonGPTConfig, codon_gpt
from genomics_lm_tpu.tokenizers.codon import CODON_BASE_ID

POOLING_MODES = ("mean_nonpad", "mean_content", "eos")


@functools.partial(jax.jit, static_argnums=(1, 3))
def _pooled_hidden(params, cfg: CodonGPTConfig, idx, mode: str):
    hidden = codon_gpt.forward_hidden(params, cfg, idx)
    nonpad = idx != 0
    if mode == "mean_nonpad":
        mask = nonpad
    elif mode == "mean_content":
        mask = idx >= CODON_BASE_ID
    elif mode == "eos":
        positions = jnp.maximum(nonpad.sum(axis=1) - 1, 0)
        return hidden[jnp.arange(hidden.shape[0]), positions]
    else:
        raise ValueError(f"unsupported pooling mode: {mode}")
    weights = mask.astype(hidden.dtype)[:, :, None]
    return (hidden * weights).sum(axis=1) / jnp.maximum(weights.sum(axis=1), 1.0)


def extract_embeddings(
    params,
    cfg: CodonGPTConfig,
    token_rows: np.ndarray,
    *,
    mode: str = "mean_nonpad",
    batch_size: int = 64,
) -> np.ndarray:
    """(N, block) int token rows → (N, D) pooled embeddings."""
    if mode not in POOLING_MODES:
        raise ValueError(f"unsupported pooling mode: {mode}")
    out = []
    for start in range(0, len(token_rows), batch_size):
        batch = jnp.asarray(token_rows[start : start + batch_size], jnp.int32)
        # float32 output: bf16-trained models yield ml_dtypes.bfloat16 arrays,
        # which sklearn rejects as non-numeric
        out.append(np.asarray(_pooled_hidden(params, cfg, batch, mode),
                              dtype=np.float32))
    return np.concatenate(out) if out else np.zeros((0, cfg.n_embd), np.float32)


def ids_from_dna(dna: str, block_size: int) -> np.ndarray:
    """One CDS → fixed-width token row (BOS + codons, PAD-filled)."""
    from genomics_lm_tpu.tokenizers.codon import to_ids

    ids = to_ids(dna, termination="eos")[:block_size]
    row = np.zeros(block_size, np.int32)
    row[: len(ids)] = ids
    return row


def file_sha256(path: str | Path) -> str:
    digest = hashlib.sha256()
    with Path(path).open("rb") as handle:
        for chunk in iter(lambda: handle.read(1024 * 1024), b""):
            digest.update(chunk)
    return digest.hexdigest()


def extraction_provenance(
    *,
    checkpoint_path: str | Path | None = None,
    itos_path: str | Path | None = None,
    dataset_manifest_id: str | None = None,
    pooling: str,
    n_sequences: int,
) -> dict:
    """Provenance block written next to embedding packs (ref :134-156)."""
    prov = {
        "schema_version": 1,
        "pooling": pooling,
        "n_sequences": int(n_sequences),
        "hidden_state_api": "forward_hidden(final-norm canonical causal states)",
    }
    if checkpoint_path is not None:
        prov["checkpoint"] = {
            "path": str(checkpoint_path),
            "sha256": file_sha256(checkpoint_path),
        }
    if itos_path is not None:
        prov["vocabulary"] = {
            "path": str(itos_path),
            "sha256": file_sha256(itos_path),
        }
    if dataset_manifest_id is not None:
        prov["dataset_id"] = dataset_manifest_id
    return prov


__all__ = [
    "POOLING_MODES",
    "extract_embeddings",
    "extraction_provenance",
    "file_sha256",
    "ids_from_dna",
]
