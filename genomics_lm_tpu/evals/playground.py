"""Inference playground: load run artifacts for querying and dashboards.

Parity: reference ``src/codonlm/checkpoints.py`` (checkpoint resolution:
``checkpoints/`` or run root, best→last fallback; model reconstruction from
saved cfg; legacy vocab-size inference from embedding rows) and
``src/eval/inference_playground.py`` (run loading for the query CLI and
dashboard, next-codon querying, codon→AA translation).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from genomics_lm_tpu.generation.decode import CachedDecoder
from genomics_lm_tpu.generation.genetic_code import translate_codons_to_aa  # noqa: F401
from genomics_lm_tpu.models import CodonGPTConfig
from genomics_lm_tpu.training.checkpoints import load_checkpoint

CHECKPOINT_PREFERENCE = ("best.npz", "last.npz")


def resolve_checkpoint(run_dir: str | Path, name: str | None = None) -> Path:
    """Find a checkpoint under ``<run>/checkpoints`` or the run root."""
    run_dir = Path(run_dir)
    candidates = []
    if name:
        candidates = [run_dir / "checkpoints" / name, run_dir / name, Path(name)]
    else:
        for preferred in CHECKPOINT_PREFERENCE:
            candidates += [run_dir / "checkpoints" / preferred, run_dir / preferred]
    for candidate in candidates:
        if candidate.is_file():
            return candidate
    raise FileNotFoundError(f"no checkpoint found under {run_dir}")


def load_codon_checkpoint(run_dir: str | Path, name: str | None = None) -> dict:
    return load_checkpoint(resolve_checkpoint(run_dir, name))


def build_codon_model_from_cfg(cfg_map: dict) -> CodonGPTConfig:
    """Full flag-set reconstruction from a saved run config."""
    return CodonGPTConfig.from_run_config(cfg_map)


def load_codon_model(run_dir: str | Path, name: str | None = None):
    """Load (params, cfg, itos, stoi) from a run directory.

    Vocab size falls back to the embedding row count when the saved cfg is
    missing it (legacy compatibility, reference ``checkpoints.py:59-110``);
    itos comes from the run's ``itos.txt`` snapshot or the canonical codon
    vocabulary.
    """
    run_dir = Path(run_dir)
    payload = load_codon_checkpoint(run_dir, name)
    params = jax.tree.map(jnp.asarray, payload["model"])
    cfg_map = dict(payload.get("cfg", {}))
    if "vocab_size" not in cfg_map:
        cfg_map["vocab_size"] = int(np.asarray(payload["model"]["tok_emb"]).shape[0])
    cfg = build_codon_model_from_cfg(cfg_map)

    itos_path = run_dir / "itos.txt"
    if itos_path.exists():
        itos = [line.strip() for line in itos_path.read_text().splitlines() if line.strip()]
    else:
        from genomics_lm_tpu.tokenizers.codon import VOCAB

        itos = list(VOCAB)
    stoi = {tok: i for i, tok in enumerate(itos)}
    return params, cfg, itos, stoi


def make_decoder(run_dir: str | Path, name: str | None = None):
    """(CachedDecoder, itos, stoi) ready for querying/generation."""
    params, cfg, itos, stoi = load_codon_model(run_dir, name)
    return CachedDecoder(params, cfg.replace(dropout=0.0)), itos, stoi


def query_next_codon(decoder: CachedDecoder, ids: list[int], itos, top_k: int = 10):
    """Top-k next-token distribution after a context (playground parity)."""
    logits = decoder.next_logits(list(ids))
    logits = np.asarray(logits, np.float64)
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    order = np.argsort(probs)[::-1][:top_k]
    return [
        {"token": itos[int(i)], "id": int(i), "prob": float(probs[int(i)])}
        for i in order
    ]


def dna_to_context_ids(dna: str, stoi: dict[str, int]) -> list[int]:
    """DNA prompt → [BOS, codons...] context (query_model helpers)."""
    s = dna.strip().upper().replace("U", "T")
    ids = [stoi.get("<BOS_CDS>", 1)]
    for i in range(0, (len(s) // 3) * 3, 3):
        tok = stoi.get(s[i : i + 3])
        if tok is not None:
            ids.append(tok)
    return ids


def score_sequence(decoder: CachedDecoder, ids: list[int]) -> dict:
    """Total/mean log-prob of a token sequence under the model."""
    import math

    total = 0.0
    count = 0
    for t in range(1, len(ids)):
        logits = np.asarray(decoder.next_logits(ids[:t]), np.float64)
        logz = np.log(np.exp(logits - logits.max()).sum()) + logits.max()
        total += float(logits[ids[t]] - logz)
        count += 1
    return {
        "total_logprob": total,
        "mean_logprob": total / max(count, 1),
        "perplexity": math.exp(-total / max(count, 1)),
        "tokens": count,
    }


__all__ = [
    "build_codon_model_from_cfg",
    "dna_to_context_ids",
    "load_codon_checkpoint",
    "load_codon_model",
    "make_decoder",
    "query_next_codon",
    "resolve_checkpoint",
    "score_sequence",
    "translate_codons_to_aa",
]
